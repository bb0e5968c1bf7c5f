package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One running per-(user, event-type) count row per update. */
case class UserTypeCount(userId: Long, eventType: String, n: Long)

/** One running top-k counter row per update (Space-Saving estimate). */
case class TypeTopEntry(eventType: String, userId: Long, n: Long)

/** One bounded-feed item in per-user state. */
case class FeedItem(tsNanos: Long, eventType: String)

/** One emitted feed row: slot 0 = newest of the user's last-n events. */
case class FeedEntry(userId: Long, slot: Long, tsNanos: Long, eventType: String)

/** Spark 4's arbitrary-state API (`transformWithState`) applied to the
  * event log: a continuously-maintained per-user × event-type counter —
  * the "materialized aggregate read model" a subscription consumer keeps
  * in the reference's projection pattern
  * (ref: `src/SqlStreamStore/Subscriptions` feeding a read model), here
  * maintained by the engine's own state store instead of consumer code.
  *
  * Why `transformWithState` rather than `mapGroupsWithState`: composite
  * per-key state. The counter table is a [[MapState]] — one state-store
  * ENTRY per (user, event-type), so an update touches only the entries
  * its micro-batch's types hit, not a serialized blob of the user's whole
  * map (which is what a `GroupState[Map[...]]` would re-write per batch).
  * That is the difference that matters at 100 TB: state I/O proportional
  * to the DELTA, not to accumulated state size.
  *
  * Update-mode semantics: each batch emits the NEW running count for
  * exactly the (user, type) pairs that changed — downstream upserts.
  * Emission order within a batch is sorted by type for determinism.
  *
  * Batch mode: Spark runs the processor once per user over empty state,
  * so the output is precisely `groupBy(user, type).count()` — the DuckDB
  * oracle — while the incremental behavior is pinned by
  * TransformWithStateSpec against streaming replays on RocksDB (the
  * provider the API requires for streaming).
  *
  * Scale shape: state is per-key-per-type (bounded by |users|×|types|),
  * partitioned by the grouping key across executors, checkpointed
  * incrementally by the RocksDB provider (changelog checkpointing — no
  * full-snapshot-per-batch); no driver-side state, no corpus-sized
  * reshuffle beyond the one hash exchange on userId every stateful
  * operator pays. */
object TransformWithStateOps {

  class TypeCountProcessor extends StatefulProcessor[Long, LogEvent, UserTypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[LogEvent],
        timerValues: TimerValues): Iterator[UserTypeCount] = {
      val delta = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach(e => delta.update(e.eventType, delta.getOrElse(e.eventType, 0L) + 1L))
      delta.toSeq.sortBy(_._1).map { case (t, d) =>
        val n = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + d
        counts.updateValue(t, n)
        UserTypeCount(key, t, n)
      }.iterator
    }
  }

  /** A continuously-maintained top-`k` per stream key (here: the
    * heaviest users per event type) under BOUNDED state — the
    * Space-Saving sketch (Metwally et al., ICDT'05) as a
    * [[StatefulProcessor]]: the per-type [[MapState]] holds AT MOST `k`
    * counter entries; a user outside the table takes over the minimum
    * entry at `min+1` (the classic overestimate that preserves the
    * guarantee `true count ≤ stored count ≤ true count + min`).
    *
    * This is the streaming twin of the exact Misra-Gries batch
    * aggregate ([[graft.operators.HeavyHitters]]): batch proves
    * exactness thresholds over history; this maintains the list
    * forever at O(k) state per key — the regime where history no
    * longer fits state at all. Update mode emits each batch's CHANGED
    * entries only (delta-proportional output, like the counter
    * processor above).
    *
    * State I/O per batch is O(touched entries + evictions), never the
    * full table; the map scan to find the minimum is O(k) driver-free
    * executor work with k in the tens.
    *
    * Caveat (by design, documented): eviction emits NO retraction row —
    * a downstream read model may hold stale entries beyond the live
    * top-k until the next update touches them. Downstream must treat
    * the feed as "last-known counts", keep its own top-k window, or
    * consume the whole-table emission pattern ([[RecentFeedProcessor]])
    * when exact membership matters. */
  class TopKProcessor(k: Int) extends StatefulProcessor[String, LogEvent, TypeTopEntry] {
    require(k >= 1, s"Space-Saving table needs k >= 1 counters, got $k")
    @transient private var counters: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getMapState[Long, Long](
        "topk", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[LogEvent],
        timerValues: TimerValues): Iterator[TypeTopEntry] = {
      // mirror the state into a small local table once per batch:
      // O(k) reads, then pure in-memory Space-Saving over the rows
      val table = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
      counters.iterator().foreach { case (uid, n) => table.update(uid, n) }
      val touched = scala.collection.mutable.LinkedHashSet.empty[Long]
      rows.foreach { e =>
        val uid = e.userId
        table.get(uid) match {
          case Some(n) =>
            table.update(uid, n + 1); touched += uid
          case None if table.size < k =>
            table.update(uid, 1L); touched += uid
          case None =>
            // evict the minimum-count entry; ties broken by SMALLEST
            // user id so every replay and engine evicts identically
            val (evictId, evictN) = table.minBy { case (id, n) => (n, id) }
            table.remove(evictId)
            counters.removeKey(evictId)
            touched -= evictId
            table.update(uid, evictN + 1L)
            touched += uid
        }
      }
      touched.toSeq.sorted.map { uid =>
        val n = table(uid)
        counters.updateValue(uid, n)
        TypeTopEntry(key, uid, n)
      }.iterator
    }
  }

  /** The third TWS state shape next to [[TypeCountProcessor]]'s
    * MapState and [[TopKProcessor]]'s bounded counters: a [[ListState]]
    * ring of the user's last-`n` events — the "recent activity feed"
    * read model every product surface keeps warm. Each batch merges the
    * stored ring with the batch's rows by (ts, type) — a total order
    * over the payload, so replays and providers agree — truncates to
    * the newest `n`, rewrites the O(n) ring, and emits the user's full
    * refreshed feed newest-first (slot 0 = newest): downstream upserts
    * whole feeds, the natural unit for a feed cache.
    *
    * State is O(n) per user FOREVER — the bounded-state contract — and
    * only touched users pay any I/O in a batch. Batch mode (one pass,
    * empty state) degenerates to "last n events per user", the oracled
    * `recent_feed_batch` SQL twin. */
  class RecentFeedProcessor(n: Int) extends StatefulProcessor[Long, LogEvent, FeedEntry] {
    @transient private var feed: org.apache.spark.sql.streaming.ListState[FeedItem] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      feed = getHandle.getListState[FeedItem](
        "feed", Encoders.product[FeedItem], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[LogEvent],
        timerValues: TimerValues): Iterator[FeedEntry] = {
      val stored = feed.get().toSeq
      val merged = (stored ++ rows.map(e => FeedItem(e.tsNanos, e.eventType)))
        .sortBy(i => (i.tsNanos, i.eventType))
      val kept = merged.takeRight(n)
      feed.put(kept.toArray)
      kept.reverseIterator.zipWithIndex.map { case (i, slot) =>
        FeedEntry(key, slot.toLong, i.tsNanos, i.eventType)
      }
    }
  }

  /** Last-n activity feed per user (ListState ring; Update-mode whole-
    * feed emission for touched users). Batch mode = "last n events per
    * user", the oracled twin. */
  def recentFeedWithState(events: Dataset[LogEvent], n: Int): Dataset[FeedEntry] = {
    require(n >= 1)
    val spark = events.sparkSession
    import spark.implicits._
    org.apache.spark.sql.graft.ColumnGlue.ensureStateStoreCoordinator(spark)
    events.groupByKey(_.userId)
      .transformWithState(new RecentFeedProcessor(n), TimeMode.None(), OutputMode.Update())
  }

  /** Bounded-state running top-k users per event type (Space-Saving;
    * Update-mode delta emission). Batch mode runs one pass per key over
    * empty state — exact when the type's distinct users ≤ k. */
  def topKWithState(events: Dataset[LogEvent], k: Int): Dataset[TypeTopEntry] = {
    val spark = events.sparkSession
    import spark.implicits._
    org.apache.spark.sql.graft.ColumnGlue.ensureStateStoreCoordinator(spark)
    events.groupByKey(_.eventType)
      .transformWithState(new TopKProcessor(k), TimeMode.None(), OutputMode.Update())
  }

  /** Running (user, event-type) counts; Update-mode delta emission in
    * streaming, the full `groupBy.count()` in batch. */
  def typeCountsWithState(events: Dataset[LogEvent]): Dataset[UserTypeCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    // batch plans skip the streaming runner that normally registers the
    // state-store coordinator endpoint — register it up front
    org.apache.spark.sql.graft.ColumnGlue.ensureStateStoreCoordinator(spark)
    events.groupByKey(_.userId)
      .transformWithState(new TypeCountProcessor, TimeMode.None(), OutputMode.Update())
  }
}
