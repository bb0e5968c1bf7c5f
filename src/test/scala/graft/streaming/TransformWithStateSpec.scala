package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The arbitrary-state API operator
  * ([[TransformWithStateOps.typeCountsWithState]]): batch ≡ grouped
  * count, and streaming Update-mode replay on RocksDB (the provider the
  * API requires) emits per-batch deltas whose LAST emission per pair is
  * the batch twin's total. */
class TransformWithStateSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(u: Long, ts: Long, typ: String): LogEvent =
    LogEvent(u, ts, typ, 0L)

  test("batch mode equals groupBy().count()") {
    val events = Seq(ev(1, 1, "a"), ev(1, 2, "a"), ev(1, 3, "b"), ev(2, 4, "a"))
    val out = TransformWithStateOps.typeCountsWithState(events.toDS())
      .collect().map(r => (r.userId, r.eventType) -> r.n).toMap
    assert(out === Map((1L, "a") -> 2L, (1L, "b") -> 1L, (2L, "a") -> 1L))
  }

  test("streaming replay on RocksDB: running counts accumulate across micro-batches; only touched pairs emit") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws").toString
    try {
      val in = MemoryStream[LogEvent](spark)
      val q = TransformWithStateOps.typeCountsWithState(in.toDS())
        .writeStream.format("memory").queryName("tws_counts").outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0)).start()
      try {
        in.addData(ev(1, 1, "a"), ev(1, 2, "a"), ev(2, 3, "b"))
        q.processAllAvailable()
        val b1 = spark.table("tws_counts").as[UserTypeCount].collect().toSet
        assert(b1 === Set(UserTypeCount(1, "a", 2), UserTypeCount(2, "b", 1)))

        // batch 2 touches (1, a) and (1, b) — (2, b) must NOT re-emit
        in.addData(ev(1, 4, "a"), ev(1, 5, "b"))
        q.processAllAvailable()
        val all = spark.table("tws_counts").as[UserTypeCount].collect().toSeq
        val batch2 = all.diff(b1.toSeq)
        assert(batch2.toSet === Set(UserTypeCount(1, "a", 3), UserTypeCount(1, "b", 1)))

        // final running state (last emission per pair) == the batch twin
        val finalCounts = all.groupBy(r => (r.userId, r.eventType))
          .map { case (k, rs) => k -> rs.map(_.n).max }
        val twin = TransformWithStateOps.typeCountsWithState(
            Seq(ev(1, 1, "a"), ev(1, 2, "a"), ev(2, 3, "b"), ev(1, 4, "a"), ev(1, 5, "b")).toDS())
          .collect().map(r => (r.userId, r.eventType) -> r.n).toMap
        assert(finalCounts === twin)
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("topKWithState batch mode is exact when distinct users fit the table") {
    val events = Seq(ev(1, 1, "a"), ev(1, 2, "a"), ev(2, 3, "a"), ev(7, 4, "b"))
    val out = TransformWithStateOps.topKWithState(events.toDS(), k = 8)
      .collect().map(r => (r.eventType, r.userId) -> r.n).toMap
    assert(out === Map(("a", 1L) -> 2L, ("a", 2L) -> 1L, ("b", 7L) -> 1L))
  }

  test("recent feed recovers from a checkpoint restart: the ListState ring survives on RocksDB") {
    // failure-recovery for the transformWithState path: stop mid-replay,
    // restart from the same checkpoint, and each user's ring must carry
    // the pre-restart events — the post-restart feed merges old + new
    // exactly like the uninterrupted run. File sink (exactly-once commit
    // log); update mode emits the full refreshed feed per touched user,
    // so the LAST emission per (user, slot) is the final feed.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = SparkTestSession.tempDir("feed-restart-ckpt")
    val out = SparkTestSession.tempDir("feed-restart-out")
    try {
      val in = MemoryStream[LogEvent](spark)
      // foreachBatch → parquet: the recovery-capable sink for an
      // update-mode operator (the file sink is append-only, the memory
      // sink refuses recovery). foreachBatch is at-least-once on
      // restart, which the read-side dedup below absorbs.
      def start() = TransformWithStateOps.recentFeedWithState(in.toDS(), n = 3)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[FeedEntry], _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .start()

      val q1 = start()
      try { in.addData(ev(1, 10, "a"), ev(1, 20, "b"), ev(2, 5, "x")); q1.processAllAvailable() }
      finally q1.stop()

      val q2 = start()
      try { in.addData(ev(1, 30, "c"), ev(1, 40, "d")); q2.processAllAvailable() }
      finally q2.stop()

      // A newer feed emission can only move a slot's ts FORWARD (newer
      // events push older ones down the ring), so per (user, slot) the
      // max-ts row IS the final feed — and identical replayed rows
      // collapse. u1's final feed must include pre-restart b(20) under
      // the restored ring: newest-first d(40), c(30), b(20).
      val finalFeed = spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("userId"), r.getAs[Long]("slot"),
          r.getAs[Long]("tsNanos"), r.getAs[String]("eventType")))
        .groupBy { case (u, s, _, _) => (u, s) }
        .map { case (k, vs) => k -> vs.maxBy(_._3) }
      assert(finalFeed((1L, 0L)) === ((1L, 0L, 40L, "d")))
      assert(finalFeed((1L, 1L)) === ((1L, 1L, 30L, "c")))
      assert(finalFeed((1L, 2L)) === ((1L, 2L, 20L, "b")),
        "pre-restart ring entry lost: ListState did not survive the restart")
      assert(finalFeed((2L, 0L)) === ((2L, 0L, 5L, "x")))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("topKWithState rejects k < 1 at construction, not at the first unseen key") {
    // without the guard, k=0 only failed at runtime inside the eviction
    // branch (minBy on an empty table) on the first key it ever saw
    val e = intercept[IllegalArgumentException] {
      new TransformWithStateOps.TopKProcessor(0)
    }
    assert(e.getMessage.contains("k >= 1"))
  }

  test("topKWithState streaming: Space-Saving eviction keeps at most k counters with the min+1 overestimate") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-topk").toString
    try {
      val in = MemoryStream[LogEvent](spark)
      val q = TransformWithStateOps.topKWithState(in.toDS(), k = 2)
        .writeStream.format("memory").queryName("tws_topk").outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0)).start()
      try {
        // batch 1: user 1 twice, user 2 once → table {1:2, 2:1}
        in.addData(ev(1, 1, "a"), ev(1, 2, "a"), ev(2, 3, "a"))
        q.processAllAvailable()
        val b1 = spark.table("tws_topk").as[TypeTopEntry].collect().toSet
        assert(b1 === Set(TypeTopEntry("a", 1, 2), TypeTopEntry("a", 2, 1)))

        // batch 2: user 3 arrives with the table full → evicts the
        // min (user 2, count 1) and takes over at min+1 = 2
        in.addData(ev(3, 4, "a"))
        q.processAllAvailable()
        val all = spark.table("tws_topk").as[TypeTopEntry].collect().toSeq
        val batch2 = all.diff(b1.toSeq)
        assert(batch2.toSet === Set(TypeTopEntry("a", 3, 2)))

        // batch 3: user 1 again — only its entry re-emits, count 3
        in.addData(ev(1, 5, "a"))
        q.processAllAvailable()
        val batch3 = spark.table("tws_topk").as[TypeTopEntry].collect().toSeq
          .diff(all)
        assert(batch3.toSet === Set(TypeTopEntry("a", 1, 3)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("recent feed batch mode = last-n per user, slot 0 newest") {
    val events = Seq(ev(1, 10, "a"), ev(1, 30, "c"), ev(1, 20, "b"),
      ev(1, 40, "d"), ev(2, 5, "x"))
    val out = TransformWithStateOps.recentFeedWithState(events.toDS(), n = 3)
      .collect().map(f => (f.userId, f.slot, f.tsNanos, f.eventType)).toSet
    // u1 keeps the newest 3 of 4 (drops ts 10); slots newest-first
    assert(out === Set(
      (1L, 0L, 40L, "d"), (1L, 1L, 30L, "c"), (1L, 2L, 20L, "b"),
      (2L, 0L, 5L, "x")))
  }

  test("recent feed streaming: the ListState ring evicts across micro-batches; only touched users emit") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-feed").toString
    try {
      val in = MemoryStream[LogEvent](spark)
      val q = TransformWithStateOps.recentFeedWithState(in.toDS(), n = 2)
        .writeStream.format("memory").queryName("tws_feed").outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0)).start()
      try {
        in.addData(ev(1, 10, "a"), ev(1, 20, "b"), ev(2, 5, "x"))
        q.processAllAvailable()
        val b1 = spark.table("tws_feed").as[FeedEntry].collect().toSet
        assert(b1 === Set(FeedEntry(1, 0, 20, "b"), FeedEntry(1, 1, 10, "a"),
          FeedEntry(2, 0, 5, "x")))

        // u1's third event evicts ts 10 from the ring; u2 must not re-emit
        in.addData(ev(1, 30, "c"))
        q.processAllAvailable()
        val batch2 = spark.table("tws_feed").as[FeedEntry].collect().toSeq
          .diff(b1.toSeq)
        assert(batch2.toSet === Set(FeedEntry(1, 0, 30, "c"), FeedEntry(1, 1, 20, "b")))

        // an out-of-order straggler merges by event time, not arrival
        in.addData(ev(1, 25, "late"))
        q.processAllAvailable()
        val batch3 = spark.table("tws_feed").as[FeedEntry].collect().toSeq
          .diff(b1.toSeq).diff(batch2)
        assert(batch3.toSet === Set(FeedEntry(1, 0, 30, "c"), FeedEntry(1, 1, 25, "late")))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
