package graft.plans

import graft.SparkTestSession
import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The theta-range-join → bucketed equi-join optimizer rewrite: opt-in
  * via conf, answer-preserving across bound shapes / widths / negative
  * values / nulls, inert on non-inner joins and non-integral columns,
  * and the physical plan flips from nested-loop to hash join. */
class RewriteRangeJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  GraftFunctions.register(spark)

  private def withWidth[T](w: Long)(f: => T): T = {
    spark.conf.set(RewriteRangeJoin.ConfKey, w.toString)
    try f finally spark.conf.unset(RewriteRangeJoin.ConfKey)
  }

  private val points = Seq(
    (1L, 0L), (2L, 99L), (3L, 100L), (4L, 150L), (5L, 199L),
    (6L, 200L), (7L, 999L), (8L, -50L), (9L, 1000L))
    .toDF("pid", "v")

  private val intervals = Seq(
    (100L, 0L, 100L), (101L, 100L, 200L), (102L, 150L, 300L),
    (103L, 500L, 500L), (104L, -100L, 1L), (105L, 990L, 1000L))
    .toDF("bid", "lo", "hi")

  private def theta(p: DataFrame = points, i: DataFrame = intervals) =
    p.join(i, col("v") >= col("lo") && col("v") < col("hi"))

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("rewrite fires under the conf: hash join in, nested loop out") {
    withWidth(64L) {
      val p = planOf(theta())
      assert(!p.contains("BroadcastNestedLoopJoin"), s"still nested-loop:\n$p")
      assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin"), s"no hash join:\n$p")
    }
  }

  test("no conf, no rewrite (opt-in like the engines' range-join hints)") {
    val p = planOf(theta())
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected the naive plan:\n$p")
  }

  test("answers match the naive join exactly — widths, bound shapes, negatives") {
    val want = theta().select("pid", "bid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 64L, 1024L)) {
      val got = withWidth(w) {
        val r = theta().select("pid", "bid").as[(Long, Long)].collect()
        assert(r.length === r.toSet.size, s"width $w duplicated matches")
        r.toSet
      }
      assert(got === want, s"width $w")
    }
    // inclusive upper bound keeps the boundary row
    val wantIncl = points.join(intervals, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    val gotIncl = withWidth(50L) {
      points.join(intervals, col("v") >= col("lo") && col("v") <= col("hi"))
        .select("pid", "bid").as[(Long, Long)].collect().toSet
    }
    assert(gotIncl === wantIncl)
    assert(wantIncl.contains((3L, 100L)) && wantIncl.contains((9L, 105L)))
  }

  test("extra conjuncts survive as residual predicates") {
    val want = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi") && col("bid") =!= 101L)
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    val got = withWidth(32L) {
      points.join(intervals,
          col("v") >= col("lo") && col("v") < col("hi") && col("bid") =!= 101L)
        .select("pid", "bid").as[(Long, Long)].collect().toSet
    }
    assert(got === want)
    assert(!got.exists(_._2 == 101L))
  }

  test("null points and null bounds drop rows identically") {
    val p = Seq((1L, Some(50L)), (2L, None)).toDF("pid", "v")
    val i = Seq((10L, Some(0L), Some(100L)), (11L, None, Some(100L)),
        (12L, Some(0L), None)).toDF("bid", "lo", "hi")
    val want = p.join(i, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    val got = withWidth(16L) {
      p.join(i, col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "bid").as[(Long, Long)].collect().toSet
    }
    assert(got === want)
    assert(want === Set((1L, 10L)))
  }

  test("left outer joins and non-integral columns are left untouched") {
    withWidth(64L) {
      val outer = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"), "left")
      assert(planOf(outer).contains("BroadcastNestedLoopJoin"))
      val dp = Seq((1L, 50.0)).toDF("pid", "v")
      val di = Seq((10L, 0.0, 100.0)).toDF("bid", "lo", "hi")
      val doubles = dp.join(di, col("v") >= col("lo") && col("v") < col("hi"))
      assert(planOf(doubles).contains("BroadcastNestedLoopJoin"))
      assert(doubles.count() === 1L)
    }
  }

  test("rewrite composes with the fixed-point batch (no endless re-rewrite)") {
    withWidth(8L) {
      // optimizing twice (fresh plan each time) and once must agree
      val a = theta().select("pid", "bid").as[(Long, Long)].collect().toSet
      val b = theta().select("pid", "bid").as[(Long, Long)].collect().toSet
      assert(a === b)
      // the optimized plan contains exactly ONE marker equi-pair
      val opt = theta().queryExecution.optimizedPlan.toString
      assert("__graft_range_bucket_p".r.findAllIn(opt).size >= 1)
    }
  }
}
