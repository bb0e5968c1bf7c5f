package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed range join vs the naive theta join it replaces: exact match
  * on every (point, interval) pair including boundaries, multi-interval
  * overlap, degenerate spans — at any bucket width. */
class RangeJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val points = Seq(
    (1L, 0.0), (2L, 99.9), (3L, 100.0), (4L, 150.0), (5L, 199.99),
    (6L, 200.0), (7L, 250.5), (8L, 999.0), (9L, -50.0), (10L, 1000.0))
    .toDF("pid", "v")

  private val intervals = Seq(
    (100L, 0.0, 100.0),    // [0, 100): includes 0.0, excludes 100.0
    (101L, 100.0, 200.0),
    (102L, 150.0, 300.0),  // overlaps 101 — points in [150, 200) match both
    (103L, 500.0, 500.0),  // degenerate: matches nothing
    (104L, -100.0, 0.5),   // negative lo
    (105L, 990.0, 1000.0)) // excludes 1000.0
    .toDF("bid", "lo", "hi")

  private def naive = points.crossJoin(intervals)
    .filter(col("v") >= col("lo") && col("v") < col("hi"))
    .select("pid", "bid").as[(Long, Long)].collect().toSet

  test("matches the theta join exactly, at several bucket widths") {
    for (w <- Seq(1L, 7L, 100L, 1000L)) {
      val got = RangeJoin.bucketedRangeJoin(points, intervals, "v", "lo", "hi", w)
        .select("pid", "bid").as[(Long, Long)].collect()
      assert(got.toSet === naive, s"width $w")
      assert(got.length === got.toSet.size, s"width $w produced duplicate matches")
    }
  }

  test("boundary semantics: lo inclusive, hi exclusive") {
    val got = RangeJoin.bucketedRangeJoin(points, intervals, "v", "lo", "hi", 100L)
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 100L)))   // 0.0 in [0, 100)
    assert(!got.contains((3L, 100L)))  // 100.0 not in [0, 100)
    assert(got.contains((3L, 101L)))   // 100.0 in [100, 200)
    assert(!got.contains((10L, 105L))) // 1000.0 not in [990, 1000)
    assert(got.contains((9L, 104L)))   // -50.0 in [-100, 0.5)
    assert(!got.exists(_._2 == 103L))  // degenerate interval matches nothing
    // overlap: 150.0 and 199.99 match both 101 and 102
    assert(got.contains((4L, 101L)) && got.contains((4L, 102L)))
    assert(got.contains((5L, 101L)) && got.contains((5L, 102L)))
  }

  test("plans a broadcast hash join, never a nested loop") {
    val df = RangeJoin.bucketedRangeJoin(points, intervals, "v", "lo", "hi", 100L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast hash join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("random intervals/points match the theta join across widths (property)") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val ps = (1L to 200L).map(i => (i, rnd.nextDouble() * 1000.0 - 100.0))
        .toDF("pid", "v")
      val ivs = (1L to 30L).map { i =>
        val lo = rnd.nextDouble() * 900.0 - 100.0
        (i, lo, lo + rnd.nextDouble() * 300.0)
      }.toDF("bid", "lo", "hi")
      val want = ps.crossJoin(ivs)
        .filter(col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "bid").as[(Long, Long)].collect().toSet
      for (w <- Seq(13L, 250L)) {
        val got = RangeJoin.bucketedRangeJoin(ps, ivs, "v", "lo", "hi", w)
          .select("pid", "bid").as[(Long, Long)].collect()
        assert(got.toSet === want, s"seed $seed width $w")
        assert(got.length === got.toSet.size, s"seed $seed width $w dup matches")
      }
    }
  }

  test("shuffle variant (broadcastDim = false) gives the same answer") {
    val got = RangeJoin.bucketedRangeJoin(points, intervals, "v", "lo", "hi",
        50L, broadcastDim = false)
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    assert(got === naive)
  }
}
