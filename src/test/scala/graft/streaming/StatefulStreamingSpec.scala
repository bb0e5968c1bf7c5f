package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Stateful Structured Streaming semantics: watermarked windowed
  * aggregation (late-data drop, append-mode finalization), bounded-state
  * streaming dedup, flatMapGroupsWithState sessionization with event-time
  * timeouts, and mapGroupsWithState running totals — each checked across
  * MULTIPLE micro-batches (the incremental behavior batch mode can't
  * show), and where a batch twin exists, against it. */
class StatefulStreamingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val H = 3600L * 1000000000L // one hour in nanos

  /** (userId, hourOffset-as-double, eventType, value) → LogEvent at
    * epoch + offset hours; valueMicros = value * 1e6 exactly (test values
    * are integral). */
  private def ev(u: Long, hours: Double, typ: String = "t", value: Long = 1): LogEvent =
    LogEvent(u, (hours * H).toLong, typ, value * 1000000L)

  private def processAll(q: StreamingQuery): Unit = { q.processAllAvailable() }

  private def memSink(df: DataFrame, name: String, mode: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.ProcessingTime(0)).start()

  // ------------------------------------------------------------------
  // Watermarked tumbling windows
  // ------------------------------------------------------------------

  test("windowed aggregation finalizes windows in append mode and drops late data past the watermark") {
    val in = MemoryStream[LogEvent](spark)
    val df = in.toDF()
      .select(col("userId").as("user_id"), col("tsNanos").as("ts"),
        col("eventType").as("event_type"), (col("valueMicros") / 1000000L).cast("double").as("value"))
    val agg = EventTimeOps.windowedStats(df, "ts", "event_type", "value",
      windowDuration = "1 hour", watermarkDelay = "30 minutes")
    val q = memSink(agg, "win_agg", "append")
    try {
      // batch 1: two events in hour-0, one in hour-1
      in.addData(ev(1, 0.10), ev(2, 0.50), ev(1, 1.10))
      processAll(q)
      // nothing final yet: watermark = 1.1h - 30m = 0.6h < hour-0 end
      assert(spark.table("win_agg").count() === 0)

      // batch 2: event at 2.0h → watermark 1.5h → hour-0 window finalizes
      in.addData(ev(3, 2.0))
      processAll(q)
      val afterB2 = spark.table("win_agg").select("window_start_s", "n_events").as[(Long, Long)].collect().toSet
      assert(afterB2 === Set((0L, 2L)))

      // batch 3: a LATE event for hour-0 (watermark already at 1.5h) is
      // dropped — the finalized window is never revised; then advance far
      // enough to flush the rest
      in.addData(ev(9, 0.2))
      in.addData(ev(3, 5.0))
      processAll(q)
      val all = spark.table("win_agg").select("window_start_s", "n_events").as[(Long, Long)].collect().toSet
      assert(all === Set((0L, 2L), (3600L, 1L), (7200L, 1L)))
    } finally q.stop()
  }

  test("interval join: streaming across micro-batches matches the batch twin") {
    // events: user 1 at +0.00h/+0.05h/+0.30h, user 2 at +0.02h — 10-minute
    // window ⇒ only the (+0.00, +0.05) pair; +0.30 is outside 10m of both.
    // Times sit a day past the epoch: the initial stream watermark is 0,
    // and the join's late-row filter drops input at/below the watermark,
    // so an event at exactly t=0 would be dropped as late on arrival.
    val base = 24.0 // hours
    val events = Seq(
      (1L, ((base + 0.00) * H).toLong, 100L), (1L, ((base + 0.05) * H).toLong, 101L),
      (1L, ((base + 0.30) * H).toLong, 102L), (2L, ((base + 0.02) * H).toLong, 200L))
    val within = 600L * 1000000000L // 10 minutes in nanos

    val batch = {
      val df = events.toDF("user_id", "ts", "event_id")
      EventTimeOps.intervalJoin(df, df, "user_id", "ts", "event_id", within)
        .select("id_a", "id_b", "gap_ns").as[(Long, Long, Long)].collect().toSet
    }
    assert(batch === Set((100L, 101L, (0.05 * H).toLong)))

    // streaming: the same rows on two independent streams (the real
    // deployment shape — two sources), split across micro-batches,
    // joined stream-to-stream with watermarked state
    val inL = MemoryStream[(Long, Long, Long)](spark)
    val inR = MemoryStream[(Long, Long, Long)](spark)
    val dfL = inL.toDF().toDF("user_id", "ts", "event_id")
    val dfR = inR.toDF().toDF("user_id", "ts", "event_id")
    // delay must exceed the test data's event-time span: the two sides'
    // addData calls can land in separate micro-batches, and a watermark
    // that advances past an earlier row between them drops it as late
    // (that IS the streaming contract — watermark bounds out-of-order
    // tolerance across sides too)
    val joined = EventTimeOps.intervalJoin(dfL, dfR, "user_id", "ts", "event_id",
      within, watermarkDelay = "2 hours")
    val q = memSink(joined.select("id_a", "id_b", "gap_ns"), "ij_stream", "append")
    try {
      inL.addData(events.take(2)); inR.addData(events.take(2))
      processAll(q)
      inL.addData(events.drop(2)); inR.addData(events.drop(2))
      processAll(q)
      val streamed = spark.table("ij_stream").as[(Long, Long, Long)].collect().toSet
      assert(streamed === batch, "stream-stream interval join must equal the batch twin")
    } finally q.stop()
  }

  test("left-outer interval join: orphans emit once the watermark closes their window") {
    val base = 24.0 // hours past epoch, same reasoning as the inner test
    val events = Seq(
      (1L, ((base + 0.00) * H).toLong, 100L), (1L, ((base + 0.05) * H).toLong, 101L),
      (1L, ((base + 0.30) * H).toLong, 102L), (2L, ((base + 0.02) * H).toLong, 200L))
    val within = 600L * 1000000000L // 10 minutes

    val batch = {
      val df = events.toDF("user_id", "ts", "event_id")
      EventTimeOps.leftOuterIntervalJoin(df, df, "user_id", "ts", "event_id", within)
        .select("id_a", "id_b", "gap_ns").as[(Long, Long, Long)].collect().toSet
    }
    // one real pair; every event without a follow-up inside 10m orphans
    assert(batch === Set(
      (100L, 101L, (0.05 * H).toLong),
      (101L, -1L, -1L), (102L, -1L, -1L), (200L, -1L, -1L)))

    val inL = MemoryStream[(Long, Long, Long)](spark)
    val inR = MemoryStream[(Long, Long, Long)](spark)
    val dfL = inL.toDF().toDF("user_id", "ts", "event_id")
    val dfR = inR.toDF().toDF("user_id", "ts", "event_id")
    val joined = EventTimeOps.leftOuterIntervalJoin(dfL, dfR, "user_id", "ts",
      "event_id", within, watermarkDelay = "2 hours")
    val q = memSink(joined.select("id_a", "id_b", "gap_ns"), "loij_stream", "append")
    try {
      inL.addData(events.take(2)); inR.addData(events.take(2))
      processAll(q)
      inL.addData(events.drop(2)); inR.addData(events.drop(2))
      processAll(q)
      // orphan rows only emit when the watermark passes their window:
      // push it with a far-future row on both sides (whose own orphan
      // stays open — the streaming contract, so it's not in the batch set)
      val pusher = Seq((9L, ((base + 10.0) * H).toLong, 900L))
      inL.addData(pusher); inR.addData(pusher)
      processAll(q); processAll(q)
      val streamed = spark.table("loij_stream").as[(Long, Long, Long)].collect().toSet
      assert(streamed === batch,
        "outer stream-stream join must equal the batch twin once windows close")
    } finally q.stop()
  }

  test("windowedStats batch twin computes the same finalized windows") {
    val batch = Seq(ev(1, 0.10), ev(2, 0.50), ev(1, 1.10), ev(3, 2.0), ev(3, 5.0))
      .toDF().select(col("userId").as("user_id"), col("tsNanos").as("ts"),
        col("eventType").as("event_type"), (col("valueMicros") / 1000000L).cast("double").as("value"))
    val rows = EventTimeOps.windowedStats(batch, "ts", "event_type", "value", "1 hour")
      .select("window_start_s", "n_events").as[(Long, Long)].collect().toSet
    assert(rows === Set((0L, 2L), (3600L, 1L), (7200L, 1L), (18000L, 1L)))
  }

  // ------------------------------------------------------------------
  // Bounded-state streaming dedup
  // ------------------------------------------------------------------

  test("dedupWithinWatermark drops duplicate ids across micro-batches within the watermark") {
    val in = MemoryStream[(Long, Long, String)](spark)
    val df = in.toDF().toDF("event_id", "ts", "event_type")
    val deduped = EventTimeOps.dedupWithinWatermark(df, "ts", Seq("event_id"), "2 hours")
    val q = memSink(deduped, "dedup_out", "append")
    try {
      in.addData((10L, (0.1 * H).toLong, "a"), (11L, (0.2 * H).toLong, "b"))
      processAll(q)
      // same ids again in a later batch, still inside the watermark window
      in.addData((10L, (0.3 * H).toLong, "a-dup"), (12L, (0.4 * H).toLong, "c"))
      processAll(q)
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      assert(ids === Array(10L, 11L, 12L))
    } finally q.stop()
  }

  // ------------------------------------------------------------------
  // flatMapGroupsWithState sessionization
  // ------------------------------------------------------------------

  test("sessionizeWithState closes sessions by gap and by event-time timeout, exactly once") {
    // minute-granular events, offset well past epoch: an event AT the
    // initial watermark (epoch 0) is dropped as late by the stateful
    // operator, which is correct semantics but not what we're testing.
    def evm(u: Long, minutes: Long): LogEvent =
      LogEvent(u, minutes * 60000000000L, "t", 1000000L)
    val us = 60000000L // one minute in micros

    val in = MemoryStream[LogEvent](spark)
    val sessions = StatefulOps.sessionizeWithState(
      in.toDS(), gapMicros = 3600L * 1000000L, watermarkDelay = "10 minutes")
    val q = memSink(sessions.toDF(), "sess_out", "append")
    try {
      // user 1: two events 30min apart (one session); user 2: one event
      in.addData(evm(1, 1440), evm(1, 1470), evm(2, 1452))
      processAll(q)
      assert(spark.table("sess_out").count() === 0) // all sessions still open

      // user 1 again at minute 1620 (gap 2.5h > 1h) → first session closes
      // inline; the same batch's no-data follow-up advances the watermark
      // to 1620m - 10m, past user 2's last+gap (1512m), so user 2's
      // session ALSO closes, via event-time timeout.
      in.addData(evm(1, 1620))
      processAll(q)
      val closed1 = spark.table("sess_out").as[UserSession].collect()
      assert(closed1.map(s => (s.userId, s.startUs, s.endUs, s.nEvents)).toSet ===
        Set((1L, 1440 * us, 1470 * us, 2L), (2L, 1452 * us, 1452 * us, 1L)))

      // advance the watermark far past everyone's last+gap → the
      // remaining open sessions close via EventTimeTimeout
      in.addData(evm(7, 1980))
      processAll(q)
      in.addData(evm(7, 2160)) // push watermark again so the timeout batch runs
      processAll(q)
      val all = spark.table("sess_out").as[UserSession].collect()
      val expected = Set(
        (1L, 1440 * us, 1470 * us, 2L), // gap-closed
        (2L, 1452 * us, 1452 * us, 1L), // timeout-closed
        (1L, 1620 * us, 1620 * us, 1L), // second session, timeout-closed
        (7L, 1980 * us, 1980 * us, 1L)) // gap-closed by the 2160 event
      assert(all.map(s => (s.userId, s.startUs, s.endUs, s.nEvents)).toSet === expected)
      // exactly once: no session emitted twice
      assert(all.length === all.distinct.length)
    } finally q.stop()
  }

  test("sessionizeWithState results are provider-independent (RocksDB == default HDFS store)") {
    // the bench's streaming_session_replay_rocksdb scenario runs the
    // production state store; pin that the provider changes WHERE state
    // lives, never WHAT is emitted
    def evm(u: Long, minutes: Long): LogEvent =
      LogEvent(u, minutes * 60000000000L, "t", 1000000L)
    def run(sinkName: String): Set[(Long, Long, Long, Long)] = {
      val in = MemoryStream[LogEvent](spark)
      val sessions = StatefulOps.sessionizeWithState(
        in.toDS(), gapMicros = 3600L * 1000000L, watermarkDelay = "10 minutes")
      val q = memSink(sessions.toDF(), sinkName, "append")
      try {
        in.addData(evm(1, 1440), evm(1, 1470), evm(2, 1452))
        processAll(q)
        in.addData(evm(1, 1620))
        processAll(q)
        in.addData(evm(7, 1980))
        processAll(q)
        spark.table(sinkName).as[UserSession].collect()
          .map(s => (s.userId, s.startUs, s.endUs, s.nEvents)).toSet
      } finally q.stop()
    }
    val hdfs = run("prov_hdfs")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rocks =
      try run("prov_rocks")
      finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert(rocks === hdfs, "state-store provider must not change emitted sessions")
    assert(hdfs.nonEmpty)
  }

  test("sessionizeWithState merges an in-gap late event arriving out of order across batches, extending the session start backwards") {
    def evm(u: Long, minutes: Long): LogEvent =
      LogEvent(u, minutes * 60000000000L, "t", 1000000L)
    val us = 60000000L

    val in = MemoryStream[LogEvent](spark)
    val sessions = StatefulOps.sessionizeWithState(
      in.toDS(), gapMicros = 3600L * 1000000L, watermarkDelay = "10 hours")
    val q = memSink(sessions.toDF(), "sess_late", "append")
    try {
      // batch 1 opens a session [1500, 1530] for user 1
      in.addData(evm(1, 1500), evm(1, 1530))
      processAll(q)
      // batch 2: a LATE in-gap event BEFORE the open session's start
      // (1450: 50min gap to 1500 < 1h) must merge and extend the start;
      // a late event a full gap before the span (1320: 130min before
      // 1450) is unmergeable — emitted as its own single-event session
      in.addData(evm(1, 1450), evm(1, 1320))
      processAll(q)
      // close everything via gap
      in.addData(evm(1, 4000))
      processAll(q)
      val got = spark.table("sess_late").as[UserSession].collect()
        .map(s => (s.userId, s.startUs, s.endUs, s.nEvents)).toSet
      assert(got.contains((1L, 1450 * us, 1530 * us, 3L))) // start extended back
      assert(got.contains((1L, 1320 * us, 1320 * us, 1L))) // unmergeable singleton
    } finally q.stop()
  }

  test("sessionizeWithState merges mutually in-gap late events from one batch into one session") {
    def evm(u: Long, minutes: Long): LogEvent =
      LogEvent(u, minutes * 60000000000L, "t", 1000000L)
    val us = 60000000L

    val in = MemoryStream[LogEvent](spark)
    val sessions = StatefulOps.sessionizeWithState(
      in.toDS(), gapMicros = 3600L * 1000000L, watermarkDelay = "10 hours")
    val q = memSink(sessions.toDF(), "sess_latepair", "append")
    try {
      // batch 1 opens [1500, 1530] for user 1
      in.addData(evm(1, 1500), evm(1, 1530))
      processAll(q)
      // batch 2: TWO late events, both more than a gap before the open
      // session (1320 and 1330, 10min apart) — mutually in-gap, so the
      // batch twin makes them ONE session; the sweep must too, closing
      // it inline when the open session follows
      in.addData(evm(1, 1320), evm(1, 1330))
      processAll(q)
      val afterB2 = spark.table("sess_latepair").as[UserSession].collect()
        .map(s => (s.userId, s.startUs, s.endUs, s.nEvents)).toSet
      assert(afterB2 === Set((1L, 1320 * us, 1330 * us, 2L)),
        "late pair must merge into one closed session, not two fragments")
    } finally q.stop()
  }

  test("sessionizeWithState gap compare is exact nanos, agreeing with the batch twin at sub-microsecond boundaries") {
    // two events whose true gap exceeds 1h by exactly 1 NANOsecond: the
    // micros-truncated compare used to merge them; the batch twin splits.
    val gapNs = 3600L * 1000000000L
    val base = 1000L * gapNs
    val events = Seq(
      LogEvent(1L, base, "t", 1000000L),
      LogEvent(1L, base + gapNs + 1L, "t", 1000000L))
    val typed = StatefulOps.sessionizeWithState(events.toDS(), gapMicros = 3600L * 1000000L)
      .collect()
    assert(typed.length === 2) // split, as sessionizeBatch's > gapNanos does
  }

  test("runningUserTotals with an idle TTL still accumulates while active") {
    // ProcessingTimeTimeout makes shouldRunAnotherBatch always true, so
    // the query never quiesces (processAllAvailable would hang and
    // AvailableNow never terminates) — poll the sink instead.
    val in = MemoryStream[LogEvent](spark)
    in.addData(ev(1, 0.0, value = 10), ev(1, 0.1, value = 5), ev(2, 0.2, value = 7))
    val totals = StatefulOps.runningUserTotals(in.toDS(), idleTimeout = Some("1 hour"))
    val q = totals.toDF().writeStream.format("memory").queryName("totals_ttl")
      .outputMode("update").trigger(Trigger.ProcessingTime(100)).start()
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      def rows() = spark.table("totals_ttl").as[UserTotal].collect()
      while (rows().length < 2 && System.nanoTime() < deadline) Thread.sleep(200)
      val got = rows().groupBy(_.userId).map { case (u, rs) => (u, rs.maxBy(_.nEvents)) }
      assert(got(1L) === UserTotal(1L, 2L, 15000000L))
      assert(got(2L) === UserTotal(2L, 1L, 7000000L))
    } finally q.stop()
  }

  test("sessionizeWithState batch mode matches the sessionizeBatch window-function twin") {
    val events = Seq(
      ev(1, 0.0, value = 2), ev(1, 0.5, value = 3), ev(1, 3.0),
      ev(2, 1.0), ev(2, 1.2), ev(2, 1.4),
      ev(3, 6.0))
    val df = events.toDF().select(col("userId").as("user_id"), col("tsNanos").as("ts"),
      lit("t").as("event_type"), (col("valueMicros") / 1000000L).cast("double").as("value"))

    val typed = StatefulOps.sessionizeWithState(
      events.toDS(), gapMicros = 3600L * 1000000L)
      .collect().map(s => (s.userId, s.startUs * 1000L, s.endUs * 1000L, s.nEvents, s.sumValueMicros)).toSet

    val batch = EventTimeOps.sessionizeBatch(df, "ts", "user_id", "value", gapNanos = H)
      .select(col("user_id"), col("session_start_ns"), col("session_end_ns"),
        col("n_events"), col("sum_value_micros"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    assert(typed === batch)
    assert(batch.size === 4) // u1: 2 sessions, u2: 1, u3: 1
  }

  test("session_window sessionStats agrees with sessionizeBatch boundaries plus gap padding") {
    val events = Seq(ev(1, 0.0), ev(1, 0.5), ev(1, 3.0), ev(2, 1.0))
    val df = events.toDF().select(col("userId").as("user_id"), col("tsNanos").as("ts"),
      lit("t").as("event_type"), (col("valueMicros") / 1000000L).cast("double").as("value"))

    val viaSessionWindow = EventTimeOps.sessionStats(df, "ts", "user_id", "value", gap = "1 hour")
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaBatch = EventTimeOps.sessionizeBatch(df, "ts", "user_id", "value", gapNanos = H)
      .select(col("user_id"), (col("session_start_ns") / 1000L).cast("long"),
        // session_window.end = last event + gap
        (col("session_end_ns") / 1000L).cast("long") + 3600L * 1000000L,
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaSessionWindow === viaBatch)
  }

  // ------------------------------------------------------------------
  // mapGroupsWithState running totals
  // ------------------------------------------------------------------

  test("runningUserTotals accumulates across micro-batches in update mode") {
    val in = MemoryStream[LogEvent](spark)
    val totals = StatefulOps.runningUserTotals(in.toDS())
    val q = totals.toDF().writeStream.format("memory").queryName("totals_out")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(ev(1, 0.0, value = 10), ev(1, 0.1, value = 5), ev(2, 0.2, value = 7))
      processAll(q)
      in.addData(ev(1, 0.3, value = 1))
      processAll(q)
      // memory sink in update mode appends updated rows; the LAST row per
      // user is the current total
      val last = spark.table("totals_out").as[UserTotal].collect()
        .groupBy(_.userId).map { case (u, rows) => (u, rows.maxBy(_.nEvents)) }
      assert(last(1L).nEvents === 3L && last(1L).sumValueMicros === 16000000L)
      assert(last(2L).nEvents === 1L && last(2L).sumValueMicros === 7000000L)
    } finally q.stop()
  }

  test("runningUserTotals batch mode equals a plain groupBy aggregate") {
    val events = Seq(ev(1, 0.0, value = 10), ev(1, 0.1, value = 5), ev(2, 0.2, value = 7))
    val typed = StatefulOps.runningUserTotals(events.toDS())
      .collect().map(t => (t.userId, t.nEvents, t.sumValueMicros)).toSet
    assert(typed === Set((1L, 2L, 15000000L), (2L, 1L, 7000000L)))
  }

  // ------------------------------------------------------------------
  // scd2WithState: incremental SCD2 maintenance
  // ------------------------------------------------------------------

  test("scd2WithState emits an interval exactly once when a new value closes it") {
    val in = MemoryStream[LogEvent](spark)
    val out = StatefulOps.scd2WithState(in.toDS())
    val q = memSink(out.toDF(), "scd2_out", "append")
    try {
      in.addData(ev(1, 1.0, "A"), ev(1, 2.0, "A"), ev(2, 1.0, "X"))
      processAll(q)
      assert(spark.table("scd2_out").count() === 0) // both runs still open

      in.addData(ev(1, 3.0, "B")) // closes user 1's A-run
      processAll(q)
      val first = spark.table("scd2_out").as[Scd2Interval].collect()
      val hUs = 3600L * 1000000L
      assert(first.map(i => (i.userId, i.value, i.validFromUs, i.validToUs, i.nRows)).toSet ===
        Set((1L, "A", 1 * hUs, Some(3 * hUs), 2L)))

      in.addData(ev(1, 4.0, "A"), ev(2, 5.0, "Y")) // closes B and X
      processAll(q)
      val all = spark.table("scd2_out").as[Scd2Interval].collect()
      assert(all.map(i => (i.userId, i.value, i.validFromUs, i.validToUs, i.nRows)).toSet ===
        Set(
          (1L, "A", 1 * hUs, Some(3 * hUs), 2L),
          (1L, "B", 3 * hUs, Some(4 * hUs), 1L),
          (2L, "X", 1 * hUs, Some(5 * hUs), 1L)))
      assert(all.length === all.distinct.length) // exactly once
    } finally q.stop()
  }

  test("scd2WithState same-value events keep extending the open run across batches") {
    val in = MemoryStream[LogEvent](spark)
    val out = StatefulOps.scd2WithState(in.toDS())
    val q = memSink(out.toDF(), "scd2_ext", "append")
    try {
      in.addData(ev(1, 1.0, "A"))
      processAll(q)
      in.addData(ev(1, 2.0, "A"))
      processAll(q)
      in.addData(ev(1, 3.0, "A"))
      processAll(q)
      assert(spark.table("scd2_ext").count() === 0)
      in.addData(ev(1, 9.0, "Z"))
      processAll(q)
      val rows = spark.table("scd2_ext").as[Scd2Interval].collect()
      val hUs = 3600L * 1000000L
      // the whole three-batch A-run closes as ONE interval of 3 rows
      assert(rows.map(i => (i.value, i.validFromUs, i.validToUs, i.nRows)).toSet ===
        Set(("A", 1 * hUs, Some(9 * hUs), 3L)))
    } finally q.stop()
  }

  test("scd2WithState batch mode equals the relational scd2Intervals twin") {
    val rnd = new scala.util.Random(11)
    val events = (1L to 300L).map { i =>
      ev(i % 7, i.toDouble, s"v${rnd.nextInt(3)}")
    }
    val typed = StatefulOps.scd2WithState(events.toDS())
      .collect()
      .map(i => (i.userId, i.value, i.validFromUs, i.validToUs.getOrElse(-1L), i.nRows))
      .toSet
    val relational = graft.operators.Behavioral.scd2Intervals(
        events.toDS().toDF(), "userId", "tsNanos", "eventType")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Math.floorDiv(r.getLong(2), 1000L),
        if (r.isNullAt(3)) -1L else Math.floorDiv(r.getLong(3), 1000L),
        r.getLong(4)))
      .toSet
    assert(typed === relational)
  }

  // ------------------------------------------------------------------
  // transitionPairsWithState: incremental Markov-pair extraction
  // ------------------------------------------------------------------

  test("transitionPairsWithState bridges batch boundaries through per-key state") {
    val in = MemoryStream[LogEvent](spark)
    val out = StatefulOps.transitionPairsWithState(in.toDS())
    val q = memSink(out.toDF(), "trans_out", "append")
    try {
      in.addData(ev(1, 1.0, "A"), ev(1, 2.0, "B"), ev(2, 1.0, "X"))
      processAll(q)
      val first = spark.table("trans_out").as[TransitionPair].collect()
      assert(first.map(p => (p.userId, p.fromType, p.toType)).toSet ===
        Set((1L, "A", "B"))) // user 2 has no pair yet

      // next batch: user 1's B->C crosses the batch boundary via state;
      // user 2's X->Y likewise
      in.addData(ev(1, 3.0, "C"), ev(2, 5.0, "Y"))
      processAll(q)
      val all = spark.table("trans_out").as[TransitionPair].collect()
      assert(all.map(p => (p.userId, p.fromType, p.toType)).toSet ===
        Set((1L, "A", "B"), (1L, "B", "C"), (2L, "X", "Y")))
      assert(all.length === all.distinct.length) // each pair exactly once
    } finally q.stop()
  }

  test("transitionPairsWithState batch mode equals the relational lag model") {
    val rnd = new scala.util.Random(17)
    val events = (1L to 200L).map(i => ev(i % 5, i.toDouble, s"t${rnd.nextInt(3)}"))
    val typed = StatefulOps.transitionPairsWithState(events.toDS())
      .collect().map(p => (p.userId, p.fromType, p.toType))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val expected = events.groupBy(_.userId).toSeq.flatMap { case (u, es) =>
      val o = es.sortBy(_.tsNanos).map(_.eventType)
      o.zip(o.drop(1)).map { case (f, t) => (u, f, t) }
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(typed === expected)
  }

  // ------------------------------------------------------------------
  // typedEvents mapping over the real table shape
  // ------------------------------------------------------------------

  test("typedEvents maps the events table into exact-micros LogEvents") {
    val df = Seq((5L, 1704067207179575175L, "click", 1.25))
      .toDF("user_id", "ts", "event_type", "value")
    val e = StatefulOps.typedEvents(df).collect().head
    assert(e === LogEvent(5L, 1704067207179575175L, "click", 1250000L))
  }

  // ------------------------------------------------------------------
  // anomalyWithState: the Welford monitor across batches
  // ------------------------------------------------------------------

  test("anomalyWithState flags against PRIOR history and carries exact sums across micro-batches") {
    val steady = (1 to 5).map(i => ev(1, i * 0.1, "t", 10))
    val spike = ev(1, 0.9, "t", 1000)
    val in = MemoryStream[LogEvent](spark)
    val q = memSink(StatefulOps.anomalyWithState(in.toDS()).toDF(), "anom", "append")
    try {
      in.addData(steady: _*) // batch 1: builds history, nothing flaggable
      processAll(q)
      in.addData(spike) // batch 2: judged against state from batch 1
      processAll(q)
      val rows = spark.table("anom").as[AnomalyFlag].collect()
      val bySpike = rows.find(_.tsNanos == spike.tsNanos).get
      assert(bySpike.nPrior === 5L && bySpike.isAnomaly)
      assert(rows.filter(_.tsNanos != spike.tsNanos).forall(!_.isAnomaly))

      // streaming replay == batch replay == the window-based operator
      val all = steady :+ spike
      val batchFlags = StatefulOps.anomalyWithState(all.toDS())
        .collect().map(f => f.tsNanos -> (f.nPrior, f.isAnomaly)).toMap
      assert(rows.map(f => f.tsNanos -> (f.nPrior, f.isAnomaly)).toMap === batchFlags)

      val windowed = graft.operators.Stats.runningAnomalies(
          all.toDF().select(col("userId"), col("tsNanos"), col("valueMicros")),
          "userId", Seq("tsNanos"), "valueMicros", z = 3, minPrior = 5)
        .select(col("tsNanos"), col("n_prior"), col("is_anomaly"))
        .as[(Long, Long, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(batchFlags === windowed)
    } finally q.stop()
  }

  // ------------------------------------------------------------------
  // cusumDriftWithState: Page's test across batches
  // ------------------------------------------------------------------

  test("cusumDriftWithState accumulates sustained shift, alarms once, resets") {
    // μ₀ = 10, slack = 1, h = 5 (micros ×1e6 via ev's value scaling):
    // steady values 10 keep both sums at 0; shifted values 13 add
    // (13−10−1) = 2 to g⁺ per event → 2, 4, 6(>5: ALARM + reset), 2
    val steady = (1 to 3).map(i => ev(1, i * 0.1, "t", 10))
    val shifted = (1 to 4).map(i => ev(1, 1.0 + i * 0.1, "t", 13))
    val in = MemoryStream[LogEvent](spark)
    val q = memSink(StatefulOps.cusumDriftWithState(in.toDS(),
      mu0Micros = 10000000L, slackMicros = 1000000L,
      thresholdMicros = 5000000L).toDF(), "drift", "append")
    try {
      in.addData(steady: _*)
      processAll(q)
      in.addData(shifted: _*) // state (0,0) carries over; shift accumulates
      processAll(q)
      val rows = spark.table("drift").as[DriftAlarm].collect()
        .sortBy(_.tsNanos)
      assert(rows.take(3).forall(r => r.gPlus == 0L && !r.alarm))
      assert(rows.drop(3).map(_.gPlus).toSeq ===
        Seq(2000000L, 4000000L, 6000000L, 2000000L))
      assert(rows.map(_.alarm).toSeq ===
        Seq(false, false, false, false, false, true, false))

      // streaming replay == batch replay of the same history
      val all = steady ++ shifted
      val batch = StatefulOps.cusumDriftWithState(all.toDS(),
          10000000L, 1000000L, 5000000L)
        .collect().map(r => r.tsNanos -> ((r.gPlus, r.gMinus, r.alarm))).toMap
      assert(rows.map(r => r.tsNanos -> ((r.gPlus, r.gMinus, r.alarm))).toMap === batch)
    } finally q.stop()
  }

  test("funnelWithState batch mode: strict-after chain inside the anchored window") {
    def evm(u: Long, minutes: Long, typ: String): LogEvent =
      LogEvent(u, minutes * 60000000000L, typ, 0L)
    val us = 60000000L
    val w = 60L * 60000000L // 60-minute window in micros
    val events = Seq(
      // u1: clean a→b→c
      evm(1, 1000, "a"), evm(1, 1010, "b"), evm(1, 1020, "c"),
      // u2: c before b is ineligible; the later c completes
      evm(2, 1000, "a"), evm(2, 1005, "c"), evm(2, 1010, "b"), evm(2, 1020, "c"),
      // u3: b at the SAME instant as a — strict > excludes it
      evm(3, 1000, "a"), evm(3, 1000, "b"),
      // u4: b beyond anchor+60min
      evm(4, 1000, "a"), evm(4, 1061, "b"),
      // u5: earliest a anchors (1050 does not re-anchor)
      evm(5, 1050, "a"), evm(5, 1040, "a"), evm(5, 1045, "b"),
      // u6: no entry step at all → no row
      evm(6, 1000, "b"), evm(6, 1010, "c"))
    val out = StatefulOps.funnelWithState(events.toDS(), Seq("a", "b", "c"), w)
      .collect().map(o => o.userId ->
        ((o.reached, o.stepUs(0), o.stepUs(1), o.stepUs(2), o.completed))).toMap
    assert(out === Map(
      1L -> ((3L, 1000 * us, 1010 * us, 1020 * us, true)),
      2L -> ((3L, 1000 * us, 1010 * us, 1020 * us, true)),
      3L -> ((1L, 1000 * us, -1L, -1L, false)),
      4L -> ((1L, 1000 * us, -1L, -1L, false)),
      5L -> ((2L, 1040 * us, 1045 * us, -1L, false))))
  }

  test("funnelWithState streaming: cross-batch assembly, in-watermark reordering, exactly-once close") {
    def evm(u: Long, minutes: Long, typ: String): LogEvent =
      LogEvent(u, minutes * 60000000000L, typ, 0L)
    val us = 60000000L
    val w = 60L * 60000000L
    val in = MemoryStream[LogEvent](spark)
    val funnel = StatefulOps.funnelWithState(
      in.toDS(), Seq("a", "b", "c"), w, watermarkDelay = "60 minutes")
    val q = memSink(funnel.toDF(), "funnel_out", "append")
    try {
      // u1: a then c; the b arrives LATER (next batch) but with an
      // earlier event time — an incremental fold would have discarded c
      // u2: b and c arrive BEFORE the anchor exists
      in.addData(evm(1, 1000, "a"), evm(1, 1030, "c"),
        evm(2, 1005, "b"), evm(2, 1008, "c"))
      processAll(q)
      assert(spark.table("funnel_out").count() === 0) // all windows open

      // the in-watermark late b (wm = 1030-60 = 970 < 1010); u2's anchor
      // arrives after its later steps; u3 opens a window it won't fill
      in.addData(evm(1, 1010, "b"), evm(2, 1002, "a"),
        evm(3, 1100, "a"), evm(3, 1200, "b"))
      processAll(q)

      // wm advances to 1240 → u1 (due 1060), u2 (1062), u3 (1160) close
      in.addData(evm(9, 1300, "a"))
      processAll(q)
      val closed = spark.table("funnel_out").as[FunnelOutcome].collect()
      assert(closed.map(o => o.userId ->
        ((o.reached, o.stepUs(0), o.stepUs(1), o.stepUs(2), o.completed))).toMap === Map(
        1L -> ((3L, 1000 * us, 1010 * us, 1030 * us, true)),
        2L -> ((3L, 1002 * us, 1005 * us, 1008 * us, true)),
        3L -> ((1L, 1100 * us, -1L, -1L, false))))

      // wm 1540 closes u9; exactly-once: nothing re-emits
      in.addData(evm(10, 1600, "a"))
      processAll(q)
      val all = spark.table("funnel_out").as[FunnelOutcome].collect()
      assert(all.length === 4 && all.distinct.length === 4)
      assert(all.find(_.userId == 9L).get.reached === 1L)
    } finally q.stop()
  }

  test("funnelWithState re-entry past window+watermark: one outcome per user, ever") {
    def evm(u: Long, minutes: Long, typ: String): LogEvent =
      LogEvent(u, minutes * 60000000000L, typ, 0L)
    val us = 60000000L
    val w = 60L * 60000000L
    val history1 = Seq(evm(1, 1000, "a"), evm(1, 1010, "b")) // first window
    val history2 = Seq( // u1 comes back LONG after window+watermark closed it
      evm(1, 1400, "a"), evm(1, 1410, "b"), evm(1, 1420, "c"))
    val in = MemoryStream[LogEvent](spark)
    val q = memSink(StatefulOps.funnelWithState(
      in.toDS(), Seq("a", "b", "c"), w, "60 minutes").toDF(),
      "funnel_reentry", "append")
    try {
      in.addData(history1: _*); processAll(q)
      in.addData(evm(9, 1300, "a")); processAll(q) // wm 1240 closes u1 @ due 1060
      val first = spark.table("funnel_reentry").as[FunnelOutcome].collect()
        .filter(_.userId == 1L)
      assert(first.map(o => (o.reached, o.stepUs(0), o.stepUs(1))).toSeq ===
        Seq((2L, 1000 * us, 1010 * us)))

      in.addData(history2: _*); processAll(q) // would re-anchor without tombstone
      in.addData(evm(10, 1600, "a")); processAll(q) // wm 1540 > 1400+60+watermark
      val u1 = spark.table("funnel_reentry").as[FunnelOutcome].collect()
        .filter(_.userId == 1L)
      assert(u1.length === 1, s"re-entry emitted a second outcome: ${u1.toSeq}")

      // and the single streaming row equals the batch twin over the FULL
      // history (global first view anchors; the 1400 block is outside)
      val batch = StatefulOps.funnelWithState(
          (history1 ++ history2 :+ evm(9, 1300, "a") :+ evm(10, 1600, "a")).toDS(),
          Seq("a", "b", "c"), w)
        .collect().filter(_.userId == 1L)
      assert(batch.toSeq === u1.toSeq)
    } finally q.stop()
  }

  test("funnelWithState recovers from a checkpoint restart: buffered state, anchor, and watermark survive") {
    // the failure-recovery path a 1000-executor deployment exercises
    // routinely: stop the query mid-history, start a NEW query from the
    // same checkpoint, and the union of outputs must equal the
    // uninterrupted run — open windows (buffered FunnelBuf state,
    // including the closed-tombstone field), the restored watermark, and
    // committed offsets must all round-trip. File sink: its commit log
    // is exactly-once across restarts (the memory sink refuses recovery).
    def evm(u: Long, minutes: Long, typ: String): LogEvent =
      LogEvent(u, minutes * 60000000000L, typ, 0L)
    val us = 60000000L
    val w = 60L * 60000000L
    val ckpt = SparkTestSession.tempDir("funnel-restart-ckpt")
    val out = SparkTestSession.tempDir("funnel-restart-out")
    val in = MemoryStream[LogEvent](spark)
    def start(): StreamingQuery = StatefulOps.funnelWithState(
        in.toDS(), Seq("a", "b", "c"), w, "60 minutes").toDF()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    try {
      // u1 mid-funnel (a, b buffered), u2 anchored-only — all state open
      in.addData(evm(1, 1000, "a"), evm(1, 1010, "b"), evm(2, 1005, "a"))
      processAll(q1)
    } finally q1.stop()

    val q2 = start() // restart: state + watermark restored from ckpt
    try {
      in.addData(evm(1, 1020, "c")) // completes u1 INSIDE restored window
      processAll(q2)
      in.addData(evm(9, 1300, "a")) // wm 1240 closes u1 (due 1060), u2 (1065)
      processAll(q2)
      in.addData(evm(10, 1600, "a")) // wm 1540 closes u9; u10 stays open
      processAll(q2)
    } finally q2.stop()

    val got = spark.read.parquet(out).as[FunnelOutcome].collect()
      .map(o => o.userId -> ((o.reached, o.stepUs(0), o.stepUs(1), o.stepUs(2), o.completed)))
    assert(got.length === got.distinct.length, s"restart duplicated outcomes: ${got.toSeq}")
    assert(got.toMap === Map(
      1L -> ((3L, 1000 * us, 1010 * us, 1020 * us, true)),
      2L -> ((1L, 1005 * us, -1L, -1L, false)),
      9L -> ((1L, 1300 * us, -1L, -1L, false))))
  }

  test("funnelWithState outcomes are provider-independent (RocksDB == default HDFS store)") {
    def evm(u: Long, minutes: Long, typ: String): LogEvent =
      LogEvent(u, minutes * 60000000000L, typ, 0L)
    val w = 60L * 60000000L
    val history = Seq(
      Seq(evm(1, 1000, "a"), evm(1, 1030, "c"), evm(2, 1005, "b")),
      Seq(evm(1, 1010, "b"), evm(2, 1002, "a")),
      Seq(evm(9, 1300, "a")))
    def run(sinkName: String): Set[(Long, Long, Seq[Long], Boolean)] = {
      val in = MemoryStream[LogEvent](spark)
      val q = memSink(StatefulOps.funnelWithState(
        in.toDS(), Seq("a", "b", "c"), w, "60 minutes").toDF(), sinkName, "append")
      try {
        history.foreach { b => in.addData(b); processAll(q) }
        spark.table(sinkName).as[FunnelOutcome].collect()
          .map(o => (o.userId, o.reached, o.stepUs, o.completed)).toSet
      } finally q.stop()
    }
    val hdfs = run("funnel_prov_hdfs")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rocks = try run("funnel_prov_rocks")
      finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert(hdfs === rocks && hdfs.nonEmpty)
  }

  test("funnelWithState streaming matches the batch twin on the same history") {
    def evm(u: Long, minutes: Long, typ: String): LogEvent =
      LogEvent(u, minutes * 60000000000L, typ, 0L)
    val w = 60L * 60000000L
    val history = Seq(
      evm(1, 1000, "a"), evm(1, 1010, "b"), evm(1, 1030, "c"),
      evm(2, 1005, "b"), evm(2, 1002, "a"), evm(2, 1008, "c"),
      evm(3, 1100, "a"), evm(3, 1200, "b"))
    val batch = StatefulOps.funnelWithState(history.toDS(), Seq("a", "b", "c"), w)
      .collect().map(o => o.userId -> o).toMap

    val in = MemoryStream[LogEvent](spark)
    val q = memSink(StatefulOps.funnelWithState(
      in.toDS(), Seq("a", "b", "c"), w, "60 minutes").toDF(), "funnel_par", "append")
    try {
      history.sortBy(_.tsNanos).grouped(3).foreach { b =>
        in.addData(b); processAll(q)
      }
      in.addData(evm(99, 2000, "a")) // close every window
      processAll(q)
      val streamed = spark.table("funnel_par").as[FunnelOutcome].collect()
        .filter(_.userId != 99L).map(o => o.userId -> o).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("funnelWithState generalizes to 4 steps: multi-batch streaming == batch twin") {
    def evm(u: Long, minutes: Long, typ: String): LogEvent =
      LogEvent(u, minutes * 60000000000L, typ, 0L)
    val us = 60000000L
    val w = 60L * 60000000L
    val steps = Seq("a", "b", "c", "d")
    val history = Seq(
      // u1 completes all four inside the window
      evm(1, 1000, "a"), evm(1, 1010, "b"), evm(1, 1020, "c"), evm(1, 1030, "d"),
      // u2 stalls at step 3 — the d lands past anchor+60min
      evm(2, 1000, "a"), evm(2, 1010, "b"), evm(2, 1020, "c"), evm(2, 1070, "d"),
      // u3 skips b entirely: later steps are unreachable (strict chain)
      evm(3, 1000, "a"), evm(3, 1020, "c"), evm(3, 1030, "d"))
    val batch = StatefulOps.funnelWithState(history.toDS(), steps, w)
      .collect().map(o => o.userId -> o).toMap
    assert(batch(1L).reached === 4L && batch(1L).completed)
    assert(batch(1L).stepUs === Seq(1000 * us, 1010 * us, 1020 * us, 1030 * us))
    assert(batch(2L).reached === 3L && !batch(2L).completed)
    assert(batch(2L).stepUs === Seq(1000 * us, 1010 * us, 1020 * us, -1L))
    assert(batch(3L).reached === 1L)
    assert(batch(3L).stepUs === Seq(1000 * us, -1L, -1L, -1L))

    val in = MemoryStream[LogEvent](spark)
    val q = memSink(StatefulOps.funnelWithState(
      in.toDS(), steps, w, "60 minutes").toDF(), "funnel_4step", "append")
    try {
      history.sortBy(_.tsNanos).grouped(4).foreach { b =>
        in.addData(b); processAll(q)
      }
      in.addData(evm(99, 2000, "a")) // close every window
      processAll(q)
      val streamed = spark.table("funnel_4step").as[FunnelOutcome].collect()
        .filter(_.userId != 99L).map(o => o.userId -> o).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("funnelWithState tombstone TTL: re-entry after expiry emits a second outcome (per-epoch)") {
    def evm(u: Long, minutes: Long, typ: String): LogEvent =
      LogEvent(u, minutes * 60000000000L, typ, 0L)
    val us = 60000000L
    val w = 60L * 60000000L
    val in = MemoryStream[LogEvent](spark)
    val q = memSink(StatefulOps.funnelWithState(
        in.toDS(), Seq("a", "b", "c"), w, "60 minutes",
        tombstoneTtlMicros = Some(120L * 60000000L)).toDF(),
      "funnel_ttl", "append")
    try {
      in.addData(evm(1, 1000, "a"), evm(1, 1010, "b")); processAll(q)
      in.addData(evm(9, 1300, "a")); processAll(q) // wm 1240 closes u1; TTL armed
      assert(spark.table("funnel_ttl").as[FunnelOutcome].collect()
        .count(_.userId == 1L) === 1)

      // wm 1540 > close-wm(1240) + TTL(120) -> tombstone expires, row drops
      in.addData(evm(10, 1600, "a")); processAll(q)

      // u1 re-enters AFTER expiry: a fresh funnel anchors and emits a
      // SECOND outcome once its window closes - the per-epoch contract
      in.addData(evm(1, 1700, "a"), evm(1, 1710, "b"), evm(1, 1720, "c"))
      processAll(q)
      in.addData(evm(11, 2000, "a")); processAll(q) // wm 1940 closes epoch 2
      val u1 = spark.table("funnel_ttl").as[FunnelOutcome].collect()
        .filter(_.userId == 1L).sortBy(_.stepUs.head)
      assert(u1.length === 2, s"expected per-epoch re-emission, got ${u1.toSeq}")
      assert(u1(0).reached === 2L && !u1(0).completed)
      assert(u1(1).reached === 3L && u1(1).completed &&
        u1(1).stepUs === Seq(1700 * us, 1710 * us, 1720 * us))
    } finally q.stop()
  }

  test("funnelWithState refuses an old-shape state checkpoint LOUDLY (no silent misbehavior)") {
    // The round-10 `closed` tombstone changed the encoded FunnelBuf, so
    // checkpoints from the pre-tombstone funnel cannot restore — the
    // scaladoc documents the cliff; this pins that the failure is a
    // clear error, not silent state corruption. A stand-in query writes
    // state with the OLD FunnelBuf shape (no `closed` field) at the
    // same operator position; restarting the REAL funnel from that
    // checkpoint must fail state-schema validation.
    def evm(u: Long, minutes: Long, typ: String): LogEvent =
      LogEvent(u, minutes * 60000000000L, typ, 0L)
    val w = 60L * 60000000L
    val ckpt = SparkTestSession.tempDir("funnel-oldshape-ckpt")
    val out = SparkTestSession.tempDir("funnel-oldshape-out")

    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val in1 = MemoryStream[LogEvent](spark)
    def oldFn(userId: Long, it: Iterator[LogEvent],
        state: GroupState[OldShapeFunnelBuf]): Iterator[FunnelOutcome] = {
      state.update(OldShapeFunnelBuf(it.map(_.tsNanos).min, Nil))
      Iterator.empty
    }
    val oldShaped = in1.toDS()
      .withColumn("event_time", EventTimeOps.eventTimeFromNanos(col("tsNanos")))
      .withWatermark("event_time", "60 minutes")
      .as[LogEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(oldFn)
    val q1 = oldShaped.toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      in1.addData(evm(1, 1000, "a"), evm(2, 1005, "a"))
      processAll(q1)
    } finally q1.stop()

    // restart the REAL (tombstoned) funnel from the old-shape checkpoint.
    // The fresh MemoryStream's offset must pass the checkpoint's
    // committed offset or no micro-batch is planned at all (and the
    // state never loads) — hence three addData calls, one offset each.
    val in2 = MemoryStream[LogEvent](spark)
    val thrown = intercept[Exception] {
      val q2 = StatefulOps.funnelWithState(
          in2.toDS(), Seq("a", "b", "c"), w, "60 minutes").toDF()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        in2.addData(evm(1, 1010, "b"))
        in2.addData(evm(1, 1011, "b"))
        in2.addData(evm(1, 1012, "b"))
        processAll(q2)
      } finally q2.stop()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val all = messages(thrown).mkString("\n")
    assert(all.contains("SCHEMA_NOT_COMPATIBLE"),
      s"old-shape restore failed but without a state-schema error: ${all.take(500)}")
  }

  test("cusumDriftWithState: downward drift trips the g-minus side") {
    // μ₀ = 10, slack 0, h = 3: values 8 add 2 to g⁻ each: 2, 4(>3: ALARM)
    val drops = Seq(ev(1, 0.1, "t", 8), ev(1, 0.2, "t", 8))
    val out = StatefulOps.cusumDriftWithState(drops.toDS(),
        10000000L, 0L, 3000000L)
      .collect().sortBy(_.tsNanos)
    assert(out.map(_.gMinus).toSeq === Seq(2000000L, 4000000L))
    assert(out.map(_.alarm).toSeq === Seq(false, true))
    assert(out.forall(_.gPlus == 0L))
  }
}

/** The pre-round-10 funnel state shape (no `closed` tombstone field) —
  * used only by the old-shape-checkpoint loud-failure spec. */
case class OldShapeFunnelBuf(anchorNs: Long, evs: Seq[FunnelEv])
