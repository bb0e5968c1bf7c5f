package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank against hand-computed recurrences (the DuckDB
  * oracle re-checks the 5-iteration run at sf0.01). */
class GraphSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("pagerank follows the exact fixed-point recurrence") {
    // a→{b,c}, b→a, c→a; two hand-unrolled iterations:
    //   iter1: b=c=(15e5+85·5e5)/100=575000, a=(15e5+85·2e6)/100=1850000
    //   iter2: b=c=(15e5+85·925000)/100=936250, a=(15e5+85·1150000)/100=1127500
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      .toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 1127500L, "b" -> 936250L, "c" -> 936250L))
  }

  test("dangling nodes absorb mass but re-emit nothing") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a never receives: reset mass only; b's inbound decays to a's reset
    assert(out === Map("a" -> 150000L, "b" -> 277500L))
  }

  test("duplicate edges collapse before degree counting") {
    val once = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val dup = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("src", "dst")
    val r1 = Graph.pageRank(once, iters = 3).collect().toSeq.sortBy(_.getString(0))
    val r2 = Graph.pageRank(dup, iters = 3).collect().toSeq.sortBy(_.getString(0))
    assert(r1 === r2)
  }

  test("ranks are invariant under input repartitioning") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"), ("c", "b"))
      .toDF("src", "dst")
    val r1 = Graph.pageRank(edges, iters = 4).collect().toSeq.sortBy(_.getString(0))
    val r2 = Graph.pageRank(edges.repartition(5), iters = 4).collect().toSeq
      .sortBy(_.getString(0))
    assert(r1 === r2)
  }
}
