package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over the events/message-log shape, batch AND
  * streaming from the same plan: the reference's only streaming operators
  * are catch-up subscriptions (SURVEY §2.8), so everything beyond replay —
  * rates, sessions, late-data policy — is left to the consumer. On Spark
  * these are first-class: `window()` / `session_window()` aggregations that
  * run identically over a static DataFrame and a Structured Streaming
  * source, with `withWatermark` bounding state when the input is a stream.
  *
  * Timestamp discipline: the test tables carry parquet TIMESTAMP(NANOS),
  * which the session reads as nanos-since-epoch longs
  * (`spark.sql.legacy.parquet.nanosAsLong`). Conversions here use integer
  * `div` arithmetic (never doubles — 2^53 ulp loss at 2024-era nanos), so
  * every boundary is bit-exact and DuckDB-reproducible via `epoch_ns`.
  *
  * All aggregates are exact: counts, and value sums carried as
  * decimal-cast sums (`dsum`) or integer micros — deterministic under any
  * partial-aggregation order.
  */
object EventTimeOps {

  /** Exact floor division of a nanos long column by 1000 — pure Column
    * ops (no string interpolation, so odd column names are fine) and no
    * doubles (2^53 ulp loss at 2024-era nanos). Subtracting the
    * non-negative `pmod` remainder makes the value exactly divisible, so
    * the decimal division is exact and the long cast drops only zeros;
    * unlike SQL `div` (truncate toward zero) this FLOORS, matching DuckDB
    * `epoch_ns(ts) // 1000` for pre-epoch (negative) timestamps too. */
  def floorDivMicros(nanos: Column): Column =
    ((nanos - pmod(nanos, lit(1000L))).cast("decimal(38,0)") / lit(1000)).cast("long")

  /** nanos-since-epoch long → TimestampType (micros), exact integer floor
    * division; matches DuckDB `epoch_ns(ts) // 1000`. */
  def eventTimeFromNanos(ts: Column): Column =
    timestamp_micros(floorDivMicros(ts))

  def eventTimeFromNanos(tsCol: String): Column = eventTimeFromNanos(col(tsCol))

  /** Exact double-deterministic sum (same rule as SparkEntry). */
  private def dsum(c: Column): Column = sum(c.cast("decimal(30,6)")).cast("double")

  /** Apply a watermark only when the frame is streaming: the same plan
    * serves the batch twin (where a watermark is meaningless) and the
    * streaming deployment (where it bounds window state). */
  private def watermarked(df: DataFrame, eventTimeCol: String, delay: String): DataFrame =
    if (df.isStreaming) df.withWatermark(eventTimeCol, delay) else df

  /** Tumbling (or, with `slide`, sliding) event-time window aggregation:
    * (window_start_s, key, n_events, sum_value). Streaming: watermarked,
    * so state for a window is dropped `watermarkDelay` past its end.
    * Output window start as epoch seconds — window() aligns to the epoch,
    * so this is exact for whole-second window durations. */
  def windowedStats(
      events: DataFrame, tsNanosCol: String, keyCol: String, valueCol: String,
      windowDuration: String, slide: Option[String] = None,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val withTime = events.withColumn("event_time", eventTimeFromNanos(tsNanosCol))
    val win = slide match {
      case Some(s) => window(col("event_time"), windowDuration, s)
      case None    => window(col("event_time"), windowDuration)
    }
    watermarked(withTime, "event_time", watermarkDelay)
      .groupBy(win.as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), dsum(col(valueCol)).as("sum_value"))
      .select(
        (unix_micros(col("w.start")) / 1000000L).cast("long").as("window_start_s"),
        col(keyCol), col("n_events"), col("sum_value"))
  }

  /** Session-window aggregation via Spark's built-in `session_window`
    * (gap-based dynamic windows): (key, session_start_us, session_end_us,
    * n_events, sum_value_micros). `session_window.end` is last-event + gap
    * by definition; emitted here as exact micros. Value sums are integer
    * micros (`value` cast through decimal(30,6) then scaled) so the result
    * is bit-exact under any aggregation order. */
  def sessionStats(
      events: DataFrame, tsNanosCol: String, keyCol: String, valueCol: String,
      gap: String, watermarkDelay: String = "1 hour"): DataFrame = {
    val withTime = events
      .withColumn("event_time", eventTimeFromNanos(tsNanosCol))
      .withColumn("value_micros", valueMicros(col(valueCol)))
    watermarked(withTime, "event_time", watermarkDelay)
      .groupBy(session_window(col("event_time"), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value_micros")).as("sum_value_micros"))
      .select(
        col(keyCol),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"), col("sum_value_micros"))
  }

  /** double → exact long micros via Spark cast semantics (HALF_UP at
    * scale 6), reproducible in DuckDB as
    * `CAST(CAST(v AS DECIMAL(30,6)) * 1000000 AS BIGINT)`. */
  def valueMicros(c: Column): Column =
    (c.cast("decimal(30,6)") * lit(1000000)).cast("long")

  /** Batch sessionization at scale: the lag/gap/cumulative-sum
    * formulation over raw nanos longs (exact; no timestamp conversion in
    * the gap logic). One shuffle on the key; the running session id is a
    * per-key window cumsum — the classic warehouse shape, and the oracle
    * twin for both [[sessionStats]] and
    * [[StatefulOps.sessionizeWithState]].
    * Returns (key, session_start_ns, session_end_ns, n_events,
    * sum_value_micros). */
  def sessionizeBatch(
      events: DataFrame, tsNanosCol: String, keyCol: String, valueCol: String,
      gapNanos: Long): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(tsNanosCol)
    events
      .withColumn("prev_ts", lag(col(tsNanosCol), 1).over(byTime))
      .withColumn("new_session",
        (col("prev_ts").isNull || col(tsNanosCol) - col("prev_ts") > gapNanos).cast("long"))
      .withColumn("session_seq", sum(col("new_session")).over(byTime))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsNanosCol)).as("session_start_ns"),
        max(col(tsNanosCol)).as("session_end_ns"),
        count(lit(1)).as("n_events"),
        sum(valueMicros(col(valueCol))).as("sum_value_micros"))
      .drop("session_seq")
  }

  /** Event-time INTERVAL JOIN: for every left event, the right events of
    * the same key with `0 < right.ts - left.ts <= withinNanos` — the
    * "what followed within N minutes" primitive (attribution, causality
    * windows, next-event features). Batch AND streaming from one plan:
    *
    *  - the exact predicate compares raw NANOS (bit-exact, DuckDB-
    *    reproducible via `epoch_ns`);
    *  - a coarse micros-floored event-time range rides along so Spark's
    *    stream-stream join machinery can bound state: both sides
    *    watermarked, and the `[t_a, t_a + within]` constraint lets the
    *    right side's state be evicted `within + watermarkDelay` past the
    *    watermark — O(events per window per key), never O(history). The
    *    +1ms slack keeps the coarse bound a superset of the exact one
    *    (micros flooring), so it only gates STATE, never the result.
    *
    * One shuffle per side on the key; per-key pair expansion is bounded
    * by events-per-key-per-window, the operator's inherent output size.
    * Returns (key, id_a, id_b, gap_ns).
    *
    * `tsNanosCol` may carry any fixed integer time unit (the exact
    * predicate and `gap_ns` are in that unit — the driver gate passes
    * pre-floored micros so DuckDB sees identical values); the coarse
    * event-time bound stays a superset under any unit because both sides
    * compress identically. Pass true nanos in streaming deployments so
    * the watermark scale is real. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsNanosCol: String, idCol: String,
      withinNanos: Long, watermarkDelay: String = "1 hour"): DataFrame =
    intervalJoined(left, right, keyCol, tsNanosCol, idCol, withinNanos,
        watermarkDelay, "inner")
      .select(col(keyCol), col("id_a"), col("id_b"), col("gap_ns"))

  /** LEFT-OUTER event-time interval join: every left event, paired with
    * each follow-up within the window OR emitted once with sentinel −1s
    * if none arrived — the funnel drop-off detector ("views that never
    * got a click within 10 minutes") as ONE operator instead of a join
    * plus an anti-join re-scan.
    *
    * In streaming mode this is Spark's watermarked outer stream-stream
    * join: the event-time bound in the join condition lets the state
    * store CLOSE a left row once the watermark passes its window, and
    * only then emit the unmatched row — exactly-once orphan emission
    * with O(window) state, the 100 TB shape. Batch mode is the plain
    * left-outer join with the identical predicate, which is what the
    * DuckDB gate replays. Unmatched rows surface as `id_b = −1`,
    * `gap_ns = −1` (sentinels, not NULLs, so hash gates and downstream
    * aggregations never meet an engine-specific NULL ordering). */
  def leftOuterIntervalJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsNanosCol: String, idCol: String,
      withinNanos: Long, watermarkDelay: String = "1 hour"): DataFrame =
    intervalJoined(left, right, keyCol, tsNanosCol, idCol, withinNanos,
        watermarkDelay, "left_outer")
      .select(col(keyCol), col("id_a"),
        coalesce(col("id_b"), lit(-1L)).as("id_b"),
        coalesce(col("gap_ns"), lit(-1L)).as("gap_ns"))

  private def intervalJoined(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsNanosCol: String, idCol: String,
      withinNanos: Long, watermarkDelay: String, joinType: String): DataFrame = {
    require(withinNanos > 0)
    val l = watermarked(
        left.withColumn("t_a", eventTimeFromNanos(tsNanosCol)), "t_a", watermarkDelay)
      .select(col(keyCol).as("k_a"), col(idCol).as("id_a"),
        col(tsNanosCol).as("ts_a"), col("t_a"))
    val r = watermarked(
        right.withColumn("t_b", eventTimeFromNanos(tsNanosCol)), "t_b", watermarkDelay)
      .select(col(keyCol).as("k_b"), col(idCol).as("id_b"),
        col(tsNanosCol).as("ts_b"), col("t_b"))
    val coarseUpper = col("t_a") + expr(s"INTERVAL ${withinNanos / 1000L + 1000L} MICROSECOND")
    l.join(r,
        col("k_a") === col("k_b") &&
          col("ts_b") > col("ts_a") && col("ts_b") - col("ts_a") <= withinNanos &&
          col("t_b") >= col("t_a") && col("t_b") <= coarseUpper,
        joinType)
      .select(col("k_a").as(keyCol), col("id_a"), col("id_b"),
        (col("ts_b") - col("ts_a")).as("gap_ns"))
  }

  /** Streaming exact-dedup on id columns with bounded state:
    * `dropDuplicatesWithinWatermark` keeps each key's state only until the
    * watermark passes it (the 100 TB answer to "dedup an infinite
    * stream" — state is O(keys per watermark window), not O(all history)).
    * Batch twin: plain dropDuplicates. */
  def dedupWithinWatermark(
      events: DataFrame, tsNanosCol: String, idCols: Seq[String],
      watermarkDelay: String): DataFrame = {
    val withTime = events.withColumn("event_time", eventTimeFromNanos(tsNanosCol))
    if (withTime.isStreaming)
      withTime.withWatermark("event_time", watermarkDelay)
        .dropDuplicatesWithinWatermark(idCols)
    else withTime.dropDuplicates(idCols)
  }
}
