package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact rank-based grouped quantiles against hand-computed fixtures. */
class StatsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("grouped quantiles pick the element at floor(p*(n-1))+1 per group") {
    val df = Seq(
      ("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("a", 50L),
      ("b", 7L) // single-row group: every p lands on rank 1
    ).toDF("g", "v")
    val out = Stats.groupedQuantiles(df, "g", "v", ps = Seq(0.0, 0.5, 0.95, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(3)).toMap
    // group a (n=5): ranks floor(p*4)+1 = 1, 3, 4, 5
    assert(out(("a", 0.0)) === 10L)
    assert(out(("a", 0.5)) === 30L)
    assert(out(("a", 0.95)) === 40L) // floor(3.8)+1 = 4
    assert(out(("a", 1.0)) === 50L)
    assert(Seq(0.0, 0.5, 0.95, 1.0).forall(p => out(("b", p)) === 7L))
  }

  test("ties resolve to the same value whatever the sort permutation") {
    val df = Seq.fill(4)(("g", 5L)).toDF("g", "v") // all equal
    val out = Stats.groupedQuantiles(df.repartition(3), "g", "v", ps = Seq(0.5))
      .collect()
    assert(out.length === 1 && out.head.getLong(3) === 5L)
  }
}
