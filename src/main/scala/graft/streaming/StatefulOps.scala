package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed log-event row for stateful operators: `valueMicros` is the
  * event's value already passed through Spark's double→decimal(30,6) cast
  * and scaled to integer micros ([[EventTimeOps.valueMicros]]), so every
  * downstream accumulation is exact long arithmetic — commutative,
  * deterministic, oracle-reproducible. */
case class LogEvent(userId: Long, tsNanos: Long, eventType: String, valueMicros: Long)

/** A closed user session: start/end in event-time micros (start = first
  * event, end = last event — [[EventTimeOps.sessionStats]]'s
  * `session_window.end` is last + gap by Spark's definition; this typed
  * surface reports the raw last-event time and leaves gap padding to the
  * caller). */
case class UserSession(userId: Long, startUs: Long, endUs: Long, nEvents: Long, sumValueMicros: Long)

/** Running per-user totals (update-mode output). */
case class UserTotal(userId: Long, nEvents: Long, sumValueMicros: Long)

/** One SCD2 validity interval over a user's attribute history:
  * [validFromUs, validToUs) in event-time micros; `validToUs` None ⇔
  * the interval is still open (batch mode only — a stream never emits
  * its open tail). */
case class Scd2Interval(
    userId: Long, value: String, validFromUs: Long, validToUs: Option[Long], nRows: Long)

/** Open SCD2 run carried in [[GroupState]]: current attribute value,
  * interval start, last observed position, rows folded so far. */
case class Scd2Open(value: String, validFromNs: Long, lastNs: Long, n: Long)

/** One (from → to) event-type transition of an entity. */
case class TransitionPair(userId: Long, fromType: String, toType: String)

/** Last observed event carried in [[GroupState]] for transition
  * extraction across micro-batches. */
case class LastEvent(tsNanos: Long, eventType: String)

/** Open-session accumulator carried in [[GroupState]]. Boundaries are
  * raw event-time NANOS so the gap comparison is exact — identical to
  * [[EventTimeOps.sessionizeBatch]]'s `> gapNanos` test; micros appear
  * only at emission ([[UserSession]]). */
case class SessionAcc(startNs: Long, lastNs: Long, n: Long, sumMicros: Long)

/** Welford monitor state: prior count and exact decimal Σv, Σv² (micros
  * square sums outgrow a long within dozens of events). */
case class WelfordState(n: Long, s1: java.math.BigDecimal, s2: java.math.BigDecimal)

/** One anomaly verdict per event: prior-history size and the exact-z²
  * flag ([[StatefulOps.anomalyWithState]]). */
case class AnomalyFlag(userId: Long, tsNanos: Long, nPrior: Long, isAnomaly: Boolean)

/** CUSUM drift-monitor state: the two one-sided cumulative sums, micros. */
case class CusumState(gPlus: Long, gMinus: Long)

/** One buffered funnel-relevant event: step index + event-time nanos. */
case class FunnelEv(step: Int, tsNanos: Long)

/** Funnel CEP state: the earliest step-0 time seen (Long.MaxValue until
  * one arrives) plus the buffered later-step events still inside the
  * window. After the user's outcome has been emitted the state shrinks
  * to a compact `closed` tombstone (empty buffer) that suppresses any
  * re-anchor from later step-0 events — the exactly-once,
  * first-touch-forever contract the batch twin (global first view)
  * implies. */
case class FunnelBuf(anchorNs: Long, evs: Seq[FunnelEv],
    closed: Boolean = false)

/** Final funnel outcome per user: steps reached (≥ 1 — only users who
  * entered emit), per-step match times in micros (−1 past `reached`),
  * one entry per funnel step (`stepUs.size == steps.size`, any N). */
case class FunnelOutcome(
    userId: Long, reached: Long, stepUs: Seq[Long], completed: Boolean)

/** Per-event CUSUM monitor row: post-update sums and the alarm flag. */
case class DriftAlarm(
  eventType: String, tsNanos: Long, gPlus: Long, gMinus: Long, alarm: Boolean)

/** Custom-state streaming operators via `mapGroupsWithState` /
  * `flatMapGroupsWithState` — the escape hatch for semantics that
  * windowed aggregation can't express: sessions that must close by
  * event-time timeout (emitting exactly once, incrementally, across
  * micro-batches), and monotone running aggregates pushed per batch.
  *
  * Scale shape: state is per-key and bounded (one [[SessionAcc]] or
  * [[UserTotal]] per active key), checkpointed by the streaming engine;
  * no driver-side state. Both operators also run in batch mode (Spark
  * invokes the function once per group with empty state), which is what
  * the DuckDB oracle checks; the incremental multi-batch behavior is
  * asserted in StatefulStreamingSpec against the batch twin.
  */
object StatefulOps {

  /** DataFrame (events-table shape: user_id, ts, event_type, value) →
    * typed Dataset[LogEvent]. `ts` may be a nanos-since-epoch long OR a
    * timestamp column (the driver's testdata switched to timestamp[us]
    * in round 7) — a timestamp is converted to nanos via its exact
    * micros (UTC sessions make the NTZ cast lossless). */
  def typedEvents(events: DataFrame): Dataset[LogEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val tsNanos = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts").cast("timestamp")) * lit(1000L)
    }
    events.select(
      col("user_id").cast("long").as("userId"),
      tsNanos.cast("long").as("tsNanos"),
      col("event_type").as("eventType"),
      EventTimeOps.valueMicros(col("value")).as("valueMicros"))
      .as[LogEvent]
  }

  /** Incremental sessionization with event-time timeout:
    * `flatMapGroupsWithState` in Append mode. A session closes — and is
    * emitted, exactly once — either when a later event for the same user
    * arrives more than `gap` after it, or when the event-time watermark
    * passes `last + gap` (the timeout path, so a user who goes quiet
    * still gets their final session without waiting for more input).
    *
    * Batch mode: the function runs once per user with empty state; all
    * gap-closed sessions are emitted and the trailing open session is
    * ALSO emitted (batch has no "later micro-batch" to close it — state
    * written in batch mode is discarded by definition of the API).
    *
    * Gap semantics are exact nanos (`tsNanos` carried end-to-end; the
    * `> gapMicros*1000` test is the same comparison sessionizeBatch
    * makes), so the twins agree at sub-microsecond boundaries; micros
    * appear only in the emitted [[UserSession]] (floor of nanos).
    *
    * Late events (in-watermark, arriving in a later micro-batch): one
    * that lands within the gap of the open session — before OR after its
    * current span — merges, extending the span in either direction. Ones
    * more than a gap BEFORE the open session's start merge with each
    * other (mutually in-gap late events form one session, as the batch
    * twin would) and emit when closed by the next run; they can never
    * merge forward into a FUTURE batch, and an event bridging two
    * already-split sessions is inherently unmergeable — the split was
    * emitted exactly-once in a previous batch.
    *
    * Within a micro-batch events are sorted by time in-memory — per-key
    * per-batch volume must fit executor memory (micro-batch-sized by
    * construction; bound the trigger interval / maxOffsetsPerTrigger for
    * hot keys) — and cross-batch order is the watermark's job.
    */
  def sessionizeWithState(
      events: Dataset[LogEvent], gapMicros: Long,
      watermarkDelay: String = "1 hour"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._

    val isStreaming = events.isStreaming
    val withTime = events
      .withColumn("event_time", EventTimeOps.eventTimeFromNanos(col("tsNanos")))
    val wm = if (isStreaming) withTime.withWatermark("event_time", watermarkDelay) else withTime
    val gapNanos = math.multiplyExact(gapMicros, 1000L)

    def us(ns: Long): Long = Math.floorDiv(ns, 1000L)
    def emit(userId: Long, a: SessionAcc): UserSession =
      UserSession(userId, us(a.startNs), us(a.lastNs), a.n, a.sumMicros)

    def fn(userId: Long, it: Iterator[LogEvent], state: GroupState[SessionAcc]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(emit(userId, s))
      } else {
        // Interval sweep: every event is a one-point run and the open
        // session from state is a run too; sorted by start, adjacent
        // runs merge when the next begins within the gap of the
        // current's end. In-watermark late events that are mutually
        // in-gap but unmergeable with the open session therefore merge
        // with EACH OTHER exactly as the batch twin would — not as
        // one-event fragments. Runs closed by a later run emit inline
        // (exactly-once: a late run can never merge with a FUTURE
        // batch's events, its close already emitted).
        val runs = state.getOption.toVector ++
          it.map(e => SessionAcc(e.tsNanos, e.tsNanos, 1L, e.valueMicros))
        val sorted = runs.sortBy(r => (r.startNs, r.lastNs))
        val closed = Vector.newBuilder[UserSession]
        var acc: SessionAcc = null
        sorted.foreach { r =>
          if (acc == null) acc = r
          else if (r.startNs - acc.lastNs > gapNanos) {
            closed += emit(userId, acc)
            acc = r
          } else {
            acc = SessionAcc(math.min(acc.startNs, r.startNs),
              math.max(acc.lastNs, r.lastNs),
              acc.n + r.n, acc.sumMicros + r.sumMicros)
          }
        }
        if (acc != null) {
          if (isStreaming) {
            state.update(acc)
            // close by watermark: fire once no event can precede last+gap.
            // Round the ns→ms conversion UP so the timeout never fires
            // early (splitting a session an in-gap event would extend);
            // timeout timestamps must also sit above the current watermark.
            val timeoutMs = math.max(
              Math.floorDiv(acc.lastNs + gapNanos + 999999L, 1000000L),
              state.getCurrentWatermarkMs() + 1L)
            state.setTimeoutTimestamp(timeoutMs)
          } else {
            closed += emit(userId, acc)
          }
        }
        closed.result().iterator
      }
    }

    wm.as[LogEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Incremental SCD2 maintenance: the streaming twin of
    * [[graft.operators.Behavioral.scd2Intervals]] — consecutive equal
    * attribute values per user collapse into validity intervals, and an
    * interval EMITS (exactly once, Append mode) the moment a different
    * value closes it; the open run lives in per-key [[GroupState]]. This
    * is the CDC-log → warehouse-dimension projection running
    * continuously — the reference's subscription → read-model pattern
    * (`reference/src/SqlStreamStore/Subscriptions`) applied to a
    * type-2 dimension.
    *
    * Batch mode: one invocation per user with empty state; gap-closed
    * intervals emit AND the trailing open interval emits with
    * `validToUs = None` — exactly [[graft.operators.Behavioral
    * .scd2Intervals]] over (userId, tsNanos, value), which the parity
    * spec pins.
    *
    * Ordering: within a micro-batch events sort by time in memory;
    * across batches the watermark bounds disorder. A cross-batch late
    * event older than the open run's last observed position folds into
    * the open run if it carries the same value (count + possible
    * backward start-extension when it predates validFrom) and otherwise
    * starts/closes runs at its sorted position in the CURRENT batch —
    * an already-emitted interval is never revised (the exactly-once
    * trade every append-mode stateful operator makes).
    *
    * State is ONE [[Scd2Open]] per user — bounded by the key space, not
    * the log; no timeout: an open run has no natural close except the
    * next change, and batch mode needs none. */
  def scd2WithState(
      events: Dataset[LogEvent],
      watermarkDelay: String = "1 hour"): Dataset[Scd2Interval] = {
    val spark = events.sparkSession
    import spark.implicits._
    val isStreaming = events.isStreaming
    val withTime = events
      .withColumn("event_time", EventTimeOps.eventTimeFromNanos(col("tsNanos")))
    val wm = if (isStreaming) withTime.withWatermark("event_time", watermarkDelay) else withTime

    def us(ns: Long): Long = Math.floorDiv(ns, 1000L)

    def fn(userId: Long, it: Iterator[LogEvent], state: GroupState[Scd2Open]): Iterator[Scd2Interval] = {
      val sorted = it.toVector.sortBy(e => (e.tsNanos, e.eventType))
      val closed = Vector.newBuilder[Scd2Interval]
      var acc: Scd2Open = state.getOption.orNull
      sorted.foreach { e =>
        if (acc == null)
          acc = Scd2Open(e.eventType, e.tsNanos, e.tsNanos, 1L)
        else if (acc.value == e.eventType)
          acc = Scd2Open(acc.value, math.min(acc.validFromNs, e.tsNanos),
            math.max(acc.lastNs, e.tsNanos), acc.n + 1L)
        else {
          closed += Scd2Interval(userId, acc.value, us(acc.validFromNs),
            Some(us(e.tsNanos)), acc.n)
          acc = Scd2Open(e.eventType, e.tsNanos, e.tsNanos, 1L)
        }
      }
      if (acc != null) {
        if (isStreaming) state.update(acc)
        else closed += Scd2Interval(userId, acc.value, us(acc.validFromNs), None, acc.n)
      }
      closed.result().iterator
    }

    wm.as[LogEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Per-entity transition extraction across micro-batches: emits one
    * [[TransitionPair]] per adjacent event pair in each user's
    * time-ordered sequence, bridging batch boundaries through a
    * one-[[LastEvent]]-per-key state — the incremental front half of
    * [[graft.operators.Behavioral.transitionCounts]] (group the emitted
    * pairs downstream, e.g. a counts-in-update-mode aggregation, to
    * maintain the Markov matrix continuously).
    *
    * Batch mode: empty state, one invocation per user ⇒ exactly the
    * relational lag model (the `transition_state_batch` gate pins it
    * against the `event_transitions` oracle). Ordering: in-batch events
    * sort in memory; across batches the watermarked stream bounds
    * disorder, and a late event older than the stored last event pairs
    * at its sorted position in the CURRENT batch (emitted pairs are
    * never revised — the append-mode exactly-once trade). State is one
    * (ts, type) per key. */
  def transitionPairsWithState(
      events: Dataset[LogEvent],
      watermarkDelay: String = "1 hour"): Dataset[TransitionPair] = {
    val spark = events.sparkSession
    import spark.implicits._
    val isStreaming = events.isStreaming
    val withTime = events
      .withColumn("event_time", EventTimeOps.eventTimeFromNanos(col("tsNanos")))
    val wm = if (isStreaming) withTime.withWatermark("event_time", watermarkDelay) else withTime

    def fn(userId: Long, it: Iterator[LogEvent], state: GroupState[LastEvent]): Iterator[TransitionPair] = {
      val sorted = it.toVector.sortBy(e => (e.tsNanos, e.eventType))
      val out = Vector.newBuilder[TransitionPair]
      var last: LastEvent = state.getOption.orNull
      sorted.foreach { e =>
        if (last != null) out += TransitionPair(userId, last.eventType, e.eventType)
        last = LastEvent(e.tsNanos, e.eventType)
      }
      if (last != null && isStreaming) state.update(last)
      out.result().iterator
    }

    wm.as[LogEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Running per-user totals: each micro-batch emits the user's updated
    * cumulative (count, exact-micros sum). Update-mode output; state is
    * one [[UserTotal]] per user. In batch mode this degenerates to a
    * plain groupBy aggregate (empty state, one invocation per user) —
    * the oracled gate twin (`running_totals`).
    *
    * State lifetime: running totals are inherently O(distinct keys). By
    * default (`idleTimeout = None`) state is kept forever — correct, but
    * unbounded over an infinite key space. Pass an `idleTimeout` (e.g.
    * "30 days") to evict keys idle longer than that via
    * ProcessingTimeTimeout; an evicted key that reappears restarts from
    * zero — the standard TTL trade. */
  def runningUserTotals(
      events: Dataset[LogEvent],
      idleTimeout: Option[String] = None): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf) {
        (userId: Long, it: Iterator[LogEvent], state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var n = 0L; var s = 0L
            state.getOption.foreach { t => n = t.nEvents; s = t.sumValueMicros }
            it.foreach { e => n += 1L; s += e.valueMicros }
            val t = UserTotal(userId, n, s)
            state.update(t)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(t)
          }
      }
  }

  /** The streaming form of [[graft.operators.Stats.runningAnomalies]]:
    * a per-key Welford monitor as `flatMapGroupsWithState` — each event
    * is judged against the PRIOR (n, Σv, Σv²) carried in O(1) state per
    * key, then folded in; the z² test `(n·v − s1)² > z²·(n·s2 − s1²)`
    * runs in BigInt, so the verdicts are exact and the batch replay
    * (same fold over the whole history, empty state) equals the
    * window-based batch operator bit for bit — the parity
    * StatefulStreamingSpec pins. Rows inside a micro-batch fold in
    * (tsNanos, valueMicros) order so replays agree; across batches the
    * caller feeds event-time order (the standard watermark discipline).
    * State never grows: three numbers per key, forever. */
  def anomalyWithState(
      events: Dataset[LogEvent], z: Int = 3, minPrior: Int = 5): Dataset[AnomalyFlag] = {
    val spark = events.sparkSession
    import spark.implicits._

    def fn(userId: Long, it: Iterator[LogEvent],
        state: GroupState[WelfordState]): Iterator[AnomalyFlag] = {
      val sorted = it.toVector.sortBy(e => (e.tsNanos, e.valueMicros))
      var n = 0L
      var s1 = BigInt(0)
      var s2 = BigInt(0)
      state.getOption.foreach { w =>
        n = w.n; s1 = BigInt(w.s1.toBigInteger); s2 = BigInt(w.s2.toBigInteger)
      }
      val out = sorted.map { e =>
        val v = BigInt(e.valueMicros)
        val dev = BigInt(n) * v - s1
        val flag = n >= minPrior &&
          dev * dev > BigInt(z.toLong * z) * (BigInt(n) * s2 - s1 * s1)
        val f = AnomalyFlag(userId, e.tsNanos, n, flag)
        n += 1L; s1 += v; s2 += v * v
        f
      }
      state.update(WelfordState(n,
        new java.math.BigDecimal(s1.bigInteger), new java.math.BigDecimal(s2.bigInteger)))
      out.iterator
    }

    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming funnel pattern match (CEP-lite, the Flink-CEP
    * `A → B → C within W` shape as flatMapGroupsWithState): per user,
    * the earliest step-1 event anchors a conversion window of
    * `windowMicros`; each later step matches the earliest event of its
    * type STRICTLY after the previous step's match and no later than
    * anchor + W. One outcome row per entered user (first-touch funnel),
    * emitted exactly once when the event-time watermark passes the
    * window end — at which point every event that could still change
    * the match is beyond-watermark late by construction, so the
    * streaming outcome, the batch run of this same function, and the
    * `funnel_state_batch` SQL twin agree exactly even under
    * in-watermark reordering.
    *
    * Reordering is the hard part and the reason the state BUFFERS
    * rather than folds: a late-arriving earlier A moves the anchor
    * (window shrinks downward), a late earlier B changes which C is
    * reachable — so no incremental reached-counter is correct.
    * Buffered state is pruned to what can still matter: only the
    * anchor for step 0, later-step events with ts ≤ anchor + W;
    * anchorless users keep only events the watermark hasn't passed (a
    * future anchor must carry ts ≥ watermark) and time out entirely at
    * their newest buffered ts — state is bounded by one user's
    * in-window activity, the CEP contract.
    *
    * Non-step events are filtered BEFORE the groupByKey, so the state
    * shuffle carries only funnel-relevant rows. Batch mode closes every
    * user inline (empty state, one invocation per user) — the oracled
    * gate twin.
    *
    * Exactly-once across RE-ENTRY: once a user's outcome is emitted,
    * the state shrinks to a compact `closed` tombstone (anchor only, no
    * buffer) that suppresses any later step-0 event — so a user who
    * comes back after window + watermarkDelay cannot anchor a second
    * window and emit a second outcome, matching the batch twin's
    * global-first-view anchor. The 100 TB cost is explicit: one ~24-byte
    * state row per EMITTED user retained for the stream's lifetime —
    * the unavoidable price of "one outcome per user, ever". Anchorless
    * users still remove state entirely at timeout.
    *
    * `tombstoneTtlMicros` is the escape hatch when that retention is
    * unacceptable: a set TTL arms an event-time timeout on each
    * tombstone, measured from the close (later activity does NOT
    * refresh it), after which the state row is removed — bounding
    * tombstone state at the cost of PER-EPOCH semantics: a user
    * re-entering after window + watermark + TTL anchors a fresh funnel
    * and emits a second outcome (spec-pinned), and the streaming
    * output then deliberately diverges from the batch twin's
    * one-row-per-user contract. Default None keeps exactly-once
    * forever.
    *
    * Operational note: adding the tombstone field changed the encoded
    * state shape, so checkpoints written by the PREVIOUS funnel version
    * do not restore into this one (flatMapGroupsWithState state is not
    * schema-evolvable) — restart such a pipeline from a fresh
    * checkpoint and replay, the standard stateful-upgrade drill.
    * Restart from a SAME-VERSION checkpoint is pinned by the recovery
    * spec (state, anchor, and watermark survive). */
  def funnelWithState(
      events: Dataset[LogEvent], steps: Seq[String], windowMicros: Long,
      watermarkDelay: String = "1 hour",
      tombstoneTtlMicros: Option[Long] = None): Dataset[FunnelOutcome] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    require(windowMicros > 0)
    require(tombstoneTtlMicros.forall(_ > 0), "tombstone TTL must be positive")
    val spark = events.sparkSession
    import spark.implicits._

    val isStreaming = events.isStreaming
    val stepOf = steps.zipWithIndex.toMap
    val windowNanos = math.multiplyExact(windowMicros, 1000L)
    val relevant = events.filter(col("eventType").isin(steps: _*)) // codegen'd pre-shuffle prune
    val withTime = relevant
      .withColumn("event_time", EventTimeOps.eventTimeFromNanos(col("tsNanos")))
    val wm = if (isStreaming) withTime.withWatermark("event_time", watermarkDelay) else withTime

    val nSteps = steps.size
    def close(userId: Long, buf: FunnelBuf): Iterator[FunnelOutcome] = {
      if (buf.anchorNs == Long.MaxValue) Iterator.empty
      else {
        val endNs = buf.anchorNs + windowNanos
        var prev = buf.anchorNs
        val times = Array.fill(nSteps)(-1L)
        times(0) = buf.anchorNs
        var k = 1
        while (k < nSteps && prev >= 0) {
          val cand = buf.evs
            .filter(e => e.step == k && e.tsNanos > prev && e.tsNanos <= endNs)
          val t = if (cand.isEmpty) -1L else cand.iterator.map(_.tsNanos).min
          times(k) = t
          prev = t
          k += 1
        }
        def us(ns: Long): Long = if (ns < 0) -1L else Math.floorDiv(ns, 1000L)
        val reached = times.count(_ >= 0).toLong
        Iterator.single(FunnelOutcome(userId, reached,
          times.map(us).toSeq, reached == nSteps.toLong))
      }
    }

    def fn(userId: Long, it: Iterator[LogEvent],
        state: GroupState[FunnelBuf]): Iterator[FunnelOutcome] = {
      if (state.hasTimedOut) {
        val buf = state.get
        if (buf.closed) {
          // a TTL'd tombstone expired: drop the state row entirely —
          // the user may re-enter and emit again (per-epoch contract)
          state.remove()
          Iterator.empty
        } else if (buf.anchorNs == Long.MaxValue) {
          // anchorless: nothing emitted, a later step-0 may still
          // legitimately enter (it would be the global first view)
          state.remove()
          Iterator.empty
        } else {
          // emitted: keep a compact closed tombstone so a step-0 event
          // arriving after window+watermark cannot re-anchor and emit
          // a SECOND outcome for the same user — the batch twin
          // anchors at the GLOBAL first view and emits exactly one
          // row, so must we (re-entry divergence fix). With a TTL the
          // tombstone itself times out (measured from this close) and
          // the contract relaxes to per-epoch.
          state.update(FunnelBuf(buf.anchorNs, Nil, closed = true))
          tombstoneTtlMicros.foreach { ttl =>
            state.setTimeoutTimestamp(
              state.getCurrentWatermarkMs() + math.max(1L, ttl / 1000L))
          }
          close(userId, buf)
        }
      } else if (state.getOption.exists(_.closed)) {
        Iterator.empty // user already emitted; ignore all later events
      } else {
        val old = state.getOption.getOrElse(FunnelBuf(Long.MaxValue, Nil))
        val incoming = it.map(e => FunnelEv(stepOf(e.eventType), e.tsNanos)).toVector
        val anchor = (incoming.iterator.filter(_.step == 0).map(_.tsNanos) ++
          Iterator.single(old.anchorNs)).min
        val merged = (old.evs.iterator ++ incoming.iterator).filter(_.step > 0)
        val kept =
          if (anchor < Long.MaxValue) {
            val endNs = math.addExact(anchor, windowNanos)
            merged.filter(e => e.tsNanos <= endNs).toVector
          } else if (isStreaming) {
            // no anchor yet: a future anchor's event time is ≥ the
            // watermark, so only events the watermark hasn't passed can
            // ever follow it
            val wmNs = state.getCurrentWatermarkMs() * 1000000L
            merged.filter(_.tsNanos >= wmNs).toVector
          } else merged.toVector
        if (!isStreaming) close(userId, FunnelBuf(anchor, kept))
        else if (anchor == Long.MaxValue && kept.isEmpty) {
          state.remove()
          Iterator.empty
        } else {
          state.update(FunnelBuf(anchor, kept))
          // close when the watermark passes the window end (anchored)
          // or the newest buffered event (anchorless — after that no
          // future anchor can precede anything buffered)
          val dueNs =
            if (anchor < Long.MaxValue) math.addExact(anchor, windowNanos)
            else kept.iterator.map(_.tsNanos).max
          val dueMs = Math.floorDiv(dueNs, 1000000L) + 1L
          state.setTimeoutTimestamp(math.max(dueMs, state.getCurrentWatermarkMs() + 1L))
          Iterator.empty
        }
      }
    }

    wm.as[LogEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Online CUSUM drift monitor (Page 1954's sequential test, the
    * production twin of the offline [[graft.operators.Stats
    * .cusumChangepoint]] localizer): per event type, the two one-sided
    * cumulative sums against a FIXED reference mean — the deployment
    * shape where μ₀ comes from the training window and production is
    * monitored for sustained shift, not single-point spikes (that is
    * [[anomalyWithState]]'s job):
    *
    *   g⁺ ← max(0, g⁺ + (v − μ₀ − slack)),  g⁻ ← max(0, g⁻ + (μ₀ − v − slack))
    *
    * Alarm when either exceeds `thresholdMicros`; both sums reset after
    * an alarm (Page restart). All arithmetic is exact long micros, so
    * the streaming run, the batch replay of the same history (this one
    * function runs on batch Datasets too — Spark executes
    * flatMapGroupsWithState with empty initial state there), and any
    * resumption from checkpointed state agree bit for bit —
    * StatefulStreamingSpec pins the parity. State is TWO longs per key,
    * forever; rows inside a micro-batch fold in (tsNanos, valueMicros)
    * order, across batches the caller feeds event-time order (the
    * standard watermark discipline). */
  def cusumDriftWithState(
      events: Dataset[LogEvent], mu0Micros: Long, slackMicros: Long,
      thresholdMicros: Long): Dataset[DriftAlarm] = {
    require(slackMicros >= 0 && thresholdMicros > 0, "need slack >= 0, threshold > 0")
    val spark = events.sparkSession
    import spark.implicits._

    def fn(eventType: String, it: Iterator[LogEvent],
        state: GroupState[CusumState]): Iterator[DriftAlarm] = {
      val sorted = it.toVector.sortBy(e => (e.tsNanos, e.valueMicros))
      var gP = 0L
      var gM = 0L
      state.getOption.foreach { s => gP = s.gPlus; gM = s.gMinus }
      val out = sorted.map { e =>
        gP = math.max(0L, gP + (e.valueMicros - mu0Micros - slackMicros))
        gM = math.max(0L, gM + (mu0Micros - e.valueMicros - slackMicros))
        val alarm = gP > thresholdMicros || gM > thresholdMicros
        val row = DriftAlarm(eventType, e.tsNanos, gP, gM, alarm)
        if (alarm) { gP = 0L; gM = 0L } // Page restart
        row
      }
      state.update(CusumState(gP, gM))
      out.iterator
    }

    events.groupByKey(_.eventType)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
