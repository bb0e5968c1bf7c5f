package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof that the bucketed layout actually removes exchanges: the same
  * join run over plain parquet shuffles both sides; over bucketed
  * tables it shuffles neither. Asserted on the finalized adaptive plan,
  * like PlanShapeSpec. */
class BucketedTablesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val full = df.queryExecution.executedPlan.toString()
    val cut = full.indexOf("== Initial Plan ==")
    if (cut >= 0) full.substring(0, cut) else full
  }

  private def exchanges(plan: String): Int =
    plan.split('\n').count(l => l.contains("Exchange") && !l.contains("ReusedExchange"))

  private val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("id", "lv")
  private val right = (0L until 1000L by 2).map(i => (i, s"r$i")).toDF("id", "rv")

  test("join of two same-bucketed tables runs with zero exchanges") {
    val dir = SparkTestSession.tempDir("bucketed")
    BucketedTables.writeBucketed(left, "bt_left", "id", 8, s"$dir/left")
    BucketedTables.writeBucketed(right, "bt_right", "id", 8, s"$dir/right")
    val l = BucketedTables.readBucketed(spark, "bt_left")
    val r = BucketedTables.readBucketed(spark, "bt_right")
    // disable auto-broadcast so the small fixture takes the cluster-scale
    // join path the layout is designed for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = l.join(r, Seq("id"))
      assert(joined.count() === 500)
      val p = finalPlan(l.join(r, Seq("id")))
      assert(exchanges(p) === 0, s"bucketed join still shuffles:\n$p")

      // the identical join over the same files WITHOUT the catalog
      // layout shuffles both sides — the layout, not the data, is
      // what removes the exchanges
      val lp = spark.read.parquet(s"$dir/left")
      val rp = spark.read.parquet(s"$dir/right")
      val pPlain = finalPlan(lp.join(rp, Seq("id")))
      assert(exchanges(pPlain) >= 2, s"control join should shuffle:\n$pPlain")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bt_left")
      spark.sql("DROP TABLE IF EXISTS bt_right")
    }
  }

  test("aggregation on the bucket key needs no exchange before the final sort") {
    val dir = SparkTestSession.tempDir("bucketed-agg")
    BucketedTables.writeBucketed(left, "bt_agg", "id", 8, s"$dir/t")
    try {
      val p = finalPlan(
        BucketedTables.readBucketed(spark, "bt_agg").groupBy("id").agg(count(lit(1))))
      assert(exchanges(p) === 0, s"bucketed aggregate still shuffles:\n$p")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bt_agg")
    }
  }

  test("funnel over a bucketed-by-id layout runs its frontier passes exchange-free") {
    // the doc-comment claim on Behavioral.funnel, pinned: every frontier
    // join/agg keys on the entity id, so a bucketed-by-id events table
    // feeds all k passes with ZERO exchanges — vs the plain-parquet
    // control, which shuffles every pass
    val dir = SparkTestSession.tempDir("bucketed-funnel")
    val events = (0L until 3000L).map { i =>
      (i % 100, Seq("view", "cart", "buy")((i % 3).toInt), i)
    }.toDF("user_id", "event_type", "ts")
    BucketedTables.writeBucketed(events, "bt_funnel", "user_id", 8, s"$dir/t")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val steps = Seq("view", "cart", "buy")
      val bucketed = graft.operators.Behavioral.funnelFrontiers(
        BucketedTables.readBucketed(spark, "bt_funnel"),
        "user_id", "event_type", "ts", steps).last
      val p = finalPlan(bucketed)
      assert(exchanges(p) === 0, s"bucketed funnel frontier still shuffles:\n$p")

      val plain = graft.operators.Behavioral.funnelFrontiers(
        spark.read.parquet(s"$dir/t"),
        "user_id", "event_type", "ts", steps).last
      val pPlain = finalPlan(plain)
      assert(exchanges(pPlain) >= 1, s"control funnel should shuffle:\n$pPlain")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bt_funnel")
    }
  }

  test("bucketed round-trip preserves the rows exactly") {
    val dir = SparkTestSession.tempDir("bucketed-rt")
    BucketedTables.writeBucketed(left, "bt_rt", "id", 4, s"$dir/t")
    try {
      val back = BucketedTables.readBucketed(spark, "bt_rt")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(back === (0L until 1000L).map(i => (i, s"l$i")).toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bt_rt")
    }
  }
}
