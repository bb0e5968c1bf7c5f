package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators._
import graft.streaming.{EventTimeOps, StatefulOps}

/** Event-time / stateful streaming family (batch mode of each streaming operator).
  *
  * One gate trait of [[SparkEntry]] (round-11 split of the single-file
  * registry): the operator defs, their `queries` entries, and their
  * DuckDB oracle twins travel together; SparkEntry composes the maps. */
private[graft] trait StreamingGates extends GateSupport {

  // ==================================================================
  // Event-time / stateful streaming family (graft.streaming): the
  // BATCH mode of each streaming operator — same plan, no watermark —
  // gate-checked in the MICROS domain (DuckDB reads parquet
  // TIMESTAMP(NANOS) truncated to micros, so `ts` is pre-floored with
  // EventTimeOps.floorDivMicros where the operator is nanos-native;
  // nanos-exact semantics are covered by StatefulStreamingSpec).
  // ==================================================================

  import graft.streaming.{EventTimeOps, StatefulOps}

  protected val SessionGapUs = 12L * 3600L * 1000000L // 12 hours in micros

  /** Watermark-bounded tumbling-window aggregation
    * (EventTimeOps.windowedStats), batch mode of the streaming plan. */
  protected def windowedStatsQuery(s: SparkSession, dir: String): DataFrame =
    EventTimeOps.windowedStats(eventsNs(s, dir), "ts", "event_type", "value", "6 hours")
      .orderBy("window_start_s", "event_type")

  /** Event-time interval join (EventTimeOps.intervalJoin), batch mode of
    * the stream-stream joinable plan: per user, events followed by
    * another event within 10 minutes. Timestamps pre-floored to micros
    * (the unit-agnostic long column, like the session gates) so DuckDB's
    * micros-truncated TIMESTAMP read sees identical values. */
  protected def intervalJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsNs(s, dir)
      .withColumn("ts_us", EventTimeOps.floorDivMicros(col("ts")))
    EventTimeOps.intervalJoin(ev, ev, "user_id", "ts_us", "event_id",
        withinNanos = 600L * 1000000L) // micros: the column's unit
      .select(col("user_id"), col("id_a"), col("id_b"), col("gap_ns").as("gap_us"))
      .orderBy("id_a", "id_b")
  }

  /** Left-outer event-time interval join
    * ([[graft.streaming.EventTimeOps.leftOuterIntervalJoin]], batch mode
    * of the watermarked OUTER stream-stream join): every event plus its
    * follow-ups within 10 minutes, or one sentinel row (−1) if none —
    * the funnel drop-off detector as one operator. */
  protected def intervalJoinOuterQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsNs(s, dir)
      .withColumn("ts_us", EventTimeOps.floorDivMicros(col("ts")))
    EventTimeOps.leftOuterIntervalJoin(ev, ev, "user_id", "ts_us", "event_id",
        withinNanos = 600L * 1000000L) // micros: the column's unit
      .select(col("user_id"), col("id_a"), col("id_b"), col("gap_ns").as("gap_us"))
      .orderBy("id_a", "id_b")
  }

  /** Batch sessionization (EventTimeOps.sessionizeBatch): lag/gap/cumsum,
    * one shuffle on the key. The gap column is unit-agnostic longs — here
    * micros (pre-floored), so the DuckDB twin sees identical values. */
  protected def sessionBatch(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsNs(s, dir)
      .withColumn("ts_us", EventTimeOps.floorDivMicros(col("ts")))
    EventTimeOps.sessionizeBatch(ev, "ts_us", "user_id", "value", gapNanos = SessionGapUs)
      .select(
        col("user_id"),
        col("session_start_ns").as("session_start_us"),
        col("session_end_ns").as("session_end_us"),
        col("n_events"), col("sum_value_micros"))
      .orderBy("user_id", "session_start_us")
  }

  /** Built-in session_window aggregation (EventTimeOps.sessionStats),
    * batch mode. session_window merges on STRICT overlap (diff < gap)
    * and its end is last-event + gap — the oracle mirrors both. */
  protected def sessionWindowStats(s: SparkSession, dir: String): DataFrame =
    EventTimeOps.sessionStats(eventsNs(s, dir), "ts", "user_id", "value", gap = "12 hours")
      .orderBy("user_id", "session_start_us")

  /** Streaming dedup's batch twin (EventTimeOps.dedupWithinWatermark).
    * Projected to the key set itself: which SURVIVOR row dropDuplicates
    * keeps is nondeterministic, but the deduped key set is exact. */
  protected def streamingDedup(s: SparkSession, dir: String): DataFrame =
    EventTimeOps.dedupWithinWatermark(eventsNs(s, dir), "ts",
        Seq("user_id", "event_type"), "1 hour")
      .select("user_id", "event_type")
      .orderBy("user_id", "event_type")

  /** flatMapGroupsWithState running totals (StatefulOps.runningUserTotals),
    * batch mode: one invocation per user with empty state = the plain
    * grouped aggregate the oracle computes. */
  protected def runningTotals(s: SparkSession, dir: String): DataFrame =
    StatefulOps.runningUserTotals(StatefulOps.typedEvents(eventsNs(s, dir)))
      .toDF("user_id", "n_events", "sum_value_micros")
      .orderBy("user_id")

  /** flatMapGroupsWithState sessionization (StatefulOps.sessionizeWithState),
    * batch mode. Input ts is pre-floored to micro precision (×1000 back
    * to nanos) so the operator's nanos-exact gap compare sees exactly
    * what the micros-domain oracle sees. */
  protected def sessionStateBatch(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsNs(s, dir)
      .withColumn("ts", EventTimeOps.floorDivMicros(col("ts")) * lit(1000L))
    StatefulOps.sessionizeWithState(StatefulOps.typedEvents(ev), gapMicros = SessionGapUs)
      .toDF("user_id", "session_start_us", "session_end_us", "n_events", "sum_value_micros")
      .orderBy("user_id", "session_start_us")
  }

  /** Incremental SCD2 maintenance ([[graft.streaming.StatefulOps
    * .scd2WithState]]) in BATCH mode — same plan as the streaming CDC →
    * type-2 dimension projection, no watermark: gap-closed intervals
    * plus the open tail (valid_to_us NULL), micros domain. The
    * relational twin is the `scd2_intervals` gate; multi-batch
    * incremental behavior is pinned in StatefulStreamingSpec. */
  protected def scd2StateBatch(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsNs(s, dir)
      .withColumn("ts", EventTimeOps.floorDivMicros(col("ts")) * lit(1000L))
    StatefulOps.scd2WithState(StatefulOps.typedEvents(ev))
      .toDF("user_id", "attr_value", "valid_from_us", "valid_to_us", "n_rows")
      .orderBy("user_id", "valid_from_us")
  }

  /** Per-event Welford anomaly monitor ([[graft.streaming.StatefulOps
    * .anomalyWithState]]) in BATCH mode — one invocation per user over
    * empty state, events folded in (ts, value) order, the z² verdict in
    * exact BigInt. Degenerates to exactly the `zscore_alerts` window
    * formulation (prior-only running sums), which is what the oracle
    * states; multi-batch incremental behavior + checkpoint recovery stay
    * pinned in StatefulStreamingSpec. */
  protected def anomalyStateBatch(s: SparkSession, dir: String): DataFrame =
    StatefulOps.anomalyWithState(StatefulOps.typedEvents(eventsNs(s, dir)))
      .toDF()
      .select(col("userId").as("user_id"),
        expr("tsNanos div 1000").as("ts_us"),
        col("nPrior").as("n_prior"), col("isAnomaly").as("is_anomaly"))
      .orderBy("user_id", "ts_us", "n_prior")

  /** Online CUSUM drift monitor ([[graft.streaming.StatefulOps
    * .cusumDriftWithState]]) in BATCH mode — the Page recurrence
    * g⁺←max(0, g⁺+(v−μ₀−s)), g⁻←max(0, g⁻+(μ₀−v−s)) with post-alarm
    * restart, folded per event type in (ts, value) order, exact long
    * micros end to end. The oracle UNROLLS the same recurrence with a
    * recursive CTE (one row advanced per group per step — inherently
    * sequential per key, so the gate monitors per event_type × user
    * bucket: 100 keys ≈ 100 rows each keeps the unroll tractable while
    * every event is still judged). μ₀ = 50 (the corpus mean),
    * slack = 10, threshold = 200 (units of value) — both alarm sides
    * fire and restart (282/90 on this fixture). Streaming semantics
    * stay pinned in StatefulStreamingSpec. */
  protected def cusumStateBatch(s: SparkSession, dir: String): DataFrame =
    StatefulOps.cusumDriftWithState(
        StatefulOps.typedEvents(eventsNs(s, dir)
          .withColumn("event_type",
            concat_ws("#", col("event_type"), pmod(col("user_id"), lit(20))))),
        mu0Micros = 50000000L, slackMicros = 10000000L,
        thresholdMicros = 200000000L)
      .toDF()
      .select(col("eventType").as("monitor_key"),
        expr("tsNanos div 1000").as("ts_us"),
        col("gPlus").as("g_plus"), col("gMinus").as("g_minus"), col("alarm"))
      .orderBy("monitor_key", "ts_us", "g_plus")

  /** Space-Saving top-K ([[graft.streaming.TransformWithStateOps
    * .TopKProcessor]]) in BATCH mode with k ≥ |distinct users| — at
    * that size the summary never evicts, so Space-Saving IS the exact
    * grouped count (the standard exactness degeneration of the
    * Metwally et al. sketch); the oracle states it as such. The
    * bounded-k eviction/overestimate behavior stays pinned in
    * TransformWithStateSpec. */
  protected def twsTopkBatch(s: SparkSession, dir: String): DataFrame =
    graft.streaming.TransformWithStateOps.topKWithState(
        StatefulOps.typedEvents(eventsNs(s, dir)), k = 65536)
      .toDF()
      .select(col("eventType").as("event_type"),
        col("userId").as("user_id"), col("n"))
      .orderBy("event_type", "user_id")

  protected def streamingGateQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "windowed_stats" -> windowedStatsQuery _,
    "interval_join" -> intervalJoinQuery _,
    "interval_join_outer" -> intervalJoinOuterQuery _,
    "session_batch" -> sessionBatch _,
    "session_window_stats" -> sessionWindowStats _,
    "streaming_dedup" -> streamingDedup _,
    "running_totals" -> runningTotals _,
    "session_state_batch" -> sessionStateBatch _,
    "scd2_state_batch" -> scd2StateBatch _,
    "anomaly_state_batch" -> anomalyStateBatch _,
    "cusum_state_batch" -> cusumStateBatch _,
    "tws_topk_batch" -> twsTopkBatch _,
  )

  protected def streamingGateOracles: Map[String, String] = Map(
    "windowed_stats" ->
      // Spark window('6 hours') aligns to the epoch; DuckDB's TIMESTAMP
      // read of the nanos parquet column is already floored to micros,
      // matching eventTimeFromNanos' floor division
      """SELECT (epoch_us(ts) // 21600000000) * 21600 AS window_start_s,
                event_type, count(*) AS n_events,
                CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "interval_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
         SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
                b.us - a.us AS gap_us
         FROM e a JOIN e b
           ON a.user_id = b.user_id AND b.us > a.us AND b.us - a.us <= 600000000
         ORDER BY id_a, id_b""",
    "interval_join_outer" ->
      // LEFT JOIN twin of the watermarked outer stream-stream join;
      // orphans carry the same -1 sentinels the operator emits
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
         SELECT a.user_id, a.event_id AS id_a,
                CAST(coalesce(b.event_id, -1) AS BIGINT) AS id_b,
                CAST(coalesce(b.us - a.us, -1) AS BIGINT) AS gap_us
         FROM e a LEFT JOIN e b
           ON a.user_id = b.user_id AND b.us > a.us AND b.us - a.us <= 600000000
         ORDER BY id_a, id_b""",
    "session_batch" ->
      // sessionizeBatch splits when diff > gap (12h in micros)
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
                           CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS BIGINT) AS vm
                    FROM events),
          m AS (SELECT user_id, us, vm,
                       CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                                 > 43200000000 THEN 1
                            WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL THEN 1
                            ELSE 0 END AS new_s
                FROM e),
          s AS (SELECT user_id, us, vm,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid
                FROM m)
          SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us,
                 count(*) AS n_events, CAST(sum(vm) AS BIGINT) AS sum_value_micros
          FROM s GROUP BY user_id, sid
          ORDER BY user_id, session_start_us""",
    "session_window_stats" ->
      // session_window merges on STRICT overlap (diff < gap) and pads
      // the end with the gap (end = last event + gap)
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
                           CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS BIGINT) AS vm
                    FROM events),
          m AS (SELECT user_id, us, vm,
                       CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                                 < 43200000000 THEN 0
                            ELSE 1 END AS new_s
                FROM e),
          s AS (SELECT user_id, us, vm,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid
                FROM m)
          SELECT user_id, min(us) AS session_start_us,
                 max(us) + 43200000000 AS session_end_us,
                 count(*) AS n_events, CAST(sum(vm) AS BIGINT) AS sum_value_micros
          FROM s GROUP BY user_id, sid
          ORDER BY user_id, session_start_us""",
    "streaming_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    "running_totals" ->
      """SELECT user_id, count(*) AS n_events,
                CAST(sum(CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS BIGINT)) AS BIGINT)
                  AS sum_value_micros
         FROM events GROUP BY user_id ORDER BY user_id""",
    "session_state_batch" ->
      // batch-mode flatMapGroupsWithState = sessionizeBatch's sessions
      // (identical micros-domain input and > gap split rule)
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
                           CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS BIGINT) AS vm
                    FROM events),
          m AS (SELECT user_id, us, vm,
                       CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                                 > 43200000000 THEN 1
                            WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL THEN 1
                            ELSE 0 END AS new_s
                FROM e),
          s AS (SELECT user_id, us, vm,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid
                FROM m)
          SELECT user_id, min(us) AS session_start_us, max(us) AS session_end_us,
                 count(*) AS n_events, CAST(sum(vm) AS BIGINT) AS sum_value_micros
          FROM s GROUP BY user_id, sid
          ORDER BY user_id, session_start_us""",
    "scd2_state_batch" ->
      // batch-mode scd2WithState = the scd2_intervals gaps-and-islands
      // over the micros domain; the open tail's valid_to_us is NULL
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
            lagged AS (SELECT user_id, us, event_type,
                CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY us)
                       IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
              FROM e),
            runs AS (SELECT user_id, us, event_type,
                sum(chg) OVER (PARTITION BY user_id ORDER BY us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
              FROM lagged),
            grp AS (SELECT user_id, run_id, min(event_type) AS attr_value,
                CAST(min(us) AS BIGINT) AS valid_from_us,
                CAST(count(*) AS BIGINT) AS n_rows
              FROM runs GROUP BY user_id, run_id)
         SELECT user_id, attr_value, valid_from_us,
                lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us) AS valid_to_us,
                n_rows
         FROM grp ORDER BY user_id, valid_from_us""",
    "anomaly_state_batch" ->
      // batch-mode anomalyWithState ≡ the zscore window formulation:
      // prior-only running (n, Σv, Σv²) per user in (ts, value) fold
      // order, z² test (n·v − s1)² > 9·(n·s2 − s1²) in exact int128
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
                           CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS BIGINT) AS vm
                    FROM events),
              w AS (
           SELECT user_id, us, vm,
                  count(*) OVER win AS n_prior,
                  coalesce(sum(CAST(vm AS HUGEINT)) OVER win, 0) AS s1,
                  coalesce(sum(CAST(vm AS HUGEINT) * vm) OVER win, 0) AS s2
           FROM e
           WINDOW win AS (PARTITION BY user_id ORDER BY us, vm
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT user_id, us AS ts_us, CAST(n_prior AS BIGINT) AS n_prior,
                CASE WHEN n_prior >= 5 THEN
                  (CAST(n_prior AS HUGEINT) * vm - s1) *
                  (CAST(n_prior AS HUGEINT) * vm - s1)
                    > 9 * (CAST(n_prior AS HUGEINT) * s2 - s1 * s1)
                ELSE FALSE END AS is_anomaly
         FROM w ORDER BY user_id, ts_us, n_prior""",
    "cusum_state_batch" ->
      // the Page recurrence unrolled as a recursive CTE: each iteration
      // advances every monitor key (event_type × user%20 bucket) by ONE
      // row (rn = i+1), emitting the post-update sums; alarm resets
      // both carries (Page restart). μ₀+slack = 60, μ₀−slack = 40,
      // threshold = 200 (micros-scaled)
      """WITH RECURSIVE
          e AS (SELECT event_type || '#' || CAST(user_id % 20 AS VARCHAR) AS mkey,
                       epoch_us(ts) AS us,
                       CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS BIGINT) AS vm,
                       row_number() OVER (
                         PARTITION BY event_type || '#' || CAST(user_id % 20 AS VARCHAR)
                         ORDER BY epoch_us(ts),
                                  CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS BIGINT)) AS rn
                FROM events),
          r AS (
            SELECT mkey, CAST(NULL AS BIGINT) AS ts_us,
                   CAST(0 AS BIGINT) AS g_plus, CAST(0 AS BIGINT) AS g_minus,
                   FALSE AS alarm,
                   CAST(0 AS BIGINT) AS carry_p, CAST(0 AS BIGINT) AS carry_m,
                   CAST(0 AS BIGINT) AS i
            FROM (SELECT DISTINCT mkey FROM e)
            UNION ALL
            SELECT e.mkey, e.us,
                   greatest(0, r.carry_p + (e.vm - 60000000)),
                   greatest(0, r.carry_m + (40000000 - e.vm)),
                   (greatest(0, r.carry_p + (e.vm - 60000000)) > 200000000
                    OR greatest(0, r.carry_m + (40000000 - e.vm)) > 200000000),
                   CASE WHEN greatest(0, r.carry_p + (e.vm - 60000000)) > 200000000
                          OR greatest(0, r.carry_m + (40000000 - e.vm)) > 200000000
                        THEN 0 ELSE greatest(0, r.carry_p + (e.vm - 60000000)) END,
                   CASE WHEN greatest(0, r.carry_p + (e.vm - 60000000)) > 200000000
                          OR greatest(0, r.carry_m + (40000000 - e.vm)) > 200000000
                        THEN 0 ELSE greatest(0, r.carry_m + (40000000 - e.vm)) END,
                   r.i + 1
            FROM r JOIN e ON e.mkey = r.mkey AND e.rn = r.i + 1)
         SELECT mkey AS monitor_key, ts_us, g_plus, g_minus, alarm
         FROM r WHERE ts_us IS NOT NULL
         ORDER BY monitor_key, ts_us, g_plus""",
    "tws_topk_batch" ->
      // Space-Saving with k >= |distinct keys| never evicts: the sketch
      // IS the exact grouped count
      """SELECT event_type, user_id, count(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
