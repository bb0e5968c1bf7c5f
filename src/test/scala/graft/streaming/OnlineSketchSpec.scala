package graft.streaming

import graft.SparkTestSession
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketches are streaming-native BY CONSTRUCTION: [[Sketches]]
  * builds both HLL and CMS as plain (projection → keyed aggregate)
  * plans, so the SAME operator code runs as a Structured Streaming
  * aggregation — registers max-merge and counters sum under the hood,
  * which is exactly the sketches' own merge law, so Spark's streaming
  * state IS the sketch. These specs pin the contract: replaying data in
  * micro-batches yields bit-identical sketch state to the one-shot
  * batch build (the `hll_registers`/`cms_counters` gates oracle the
  * batch side, so the streaming side is transitively oracle-anchored). */
class OnlineSketchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming HLL register maintenance equals the batch sketch") {
    val in = MemoryStream[Long](spark)
    val regs = Sketches.hllRegisters(in.toDF().select(col("value").as("v")), col("v"), 6)
    val q = regs.writeStream
      .format("memory").queryName("hll_stream").outputMode("complete").start()
    try {
      in.addData(1L to 400L: _*)
      q.processAllAvailable()
      in.addData(200L to 900L: _*) // overlap on purpose: max-merge must absorb it
      q.processAllAvailable()
      in.addData(901L to 1000L: _*)
      q.processAllAvailable()
      val streamed = spark.table("hll_stream").collect().toSet
      val batch = Sketches.hllRegisters((1L to 1000L).toDF("v"), col("v"), 6)
        .collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming CMS counter maintenance equals the batch sketch") {
    val in = MemoryStream[String](spark)
    val counters =
      Sketches.cmsCounters(in.toDF().select(col("value").as("v")), col("v"), 3, 32)
    val q = counters.writeStream
      .format("memory").queryName("cms_stream").outputMode("complete").start()
    try {
      val all = (1 to 500).map(i => s"k${i % 41}")
      val (a, rest) = all.splitAt(180)
      val (b, c) = rest.splitAt(200)
      Seq(a, b, c).foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
      val streamed = spark.table("cms_stream").collect().toSet
      val batch = Sketches.cmsCounters(all.toDF("v"), col("v"), 3, 32).collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming KMV maintenance (MemoryStream -> foreachBatch fold) equals the batch sketch exactly") {
    // KMV's build is distinct -> top-K (not a pure keyed aggregation),
    // so its streaming face is a foreachBatch merge fold (OnlineKmv) —
    // and the union law makes the pin EXACT frame equality, not an
    // estimate comparison: k smallest of a union = k smallest of the
    // concatenation, whatever the micro-batch boundaries were
    val dir = SparkTestSession.tempDir("graft-online-kmv")
    val online = new OnlineKmv(dir, "v", k = 64)
    val in = MemoryStream[Long](spark)
    val q = in.toDF().select(col("value").as("v")).writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        online.processBatch(b, id))
      .start()
    try {
      in.addData(1L to 300L: _*)
      q.processAllAvailable()
      in.addData(150L to 700L: _*) // overlap: the merge's distinct absorbs it
      q.processAllAvailable()
      in.addData(701L to 900L: _*)
      q.processAllAvailable()
      val streamed = online.current(spark).get
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Sketches.kmvSketch((1L to 900L).toDF("v"), col("v"), 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming GROUPED KMV maintenance equals the per-group batch sketch table") {
    val dir = SparkTestSession.tempDir("graft-online-kmvby")
    val online = new OnlineKmv(dir, "v", k = 16, by = Seq("g"))
    val all = (1 to 600).map(i => (s"g${i % 3}", (i % 170).toLong))
    val mkDf = (rows: Seq[(String, Long)]) => rows.toDF("g", "v")
    // replay THROUGH the idempotence convention: batch 1 processed twice
    // (foreachBatch's at-least-once delivery) must be absorbed
    val (b0, rest) = all.splitAt(200)
    val (b1, b2) = rest.splitAt(250)
    online.processBatch(mkDf(b0), 0L)
    online.processBatch(mkDf(b1), 1L)
    online.processBatch(mkDf(b1), 1L) // replayed batch: same predecessor, same output
    online.processBatch(mkDf(b2), 2L)
    val streamed = online.current(spark).get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Sketches.kmvSketchBy(mkDf(all), Seq("g"), col("v"), 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    // each group carries 170 distinct values (> k): the maintained
    // table must hold a FULL dense-rank 1..k sketch per group
    val ranks = online.current(spark).get.groupBy("g")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranks.forall { case (n, mx) => n == 16L && mx == 16L })
  }

  test("streaming q-digest: leaf-histogram state + on-read compaction equals the batch build") {
    // the sketch's ONE data-sized aggregate (the leaf histogram) runs as
    // a streaming keyed aggregation — counts sum under the hood, which is
    // the digest's own merge law — and qdigestCompact derives the digest
    // from the state on demand
    val in = MemoryStream[Long](spark)
    val leaves = in.toDF().select(col("value").as("v"))
      .filter(col("v") >= 0L && col("v") < 1024L)
      .groupBy(col("v").as("idx")).agg(count(lit(1)).as("cnt"))
      .select(lit(0L).as("lvl"), col("idx"), col("cnt"))
    val q = leaves.writeStream
      .format("memory").queryName("qd_leaves").outputMode("complete").start()
    try {
      val all = (0 until 3000).map(i => ((i.toLong * 48271L) % 1024).abs)
      val (a, rest) = all.splitAt(1000)
      val (b, c) = rest.splitAt(1200)
      Seq(a, b, c).foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
      val streamed = Sketches.qdigestCompact(spark.table("qd_leaves"), 10, 32)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = Sketches.qdigestBuild(all.toDF("v"), col("v"), 10, 32)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
