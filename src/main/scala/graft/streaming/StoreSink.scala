package graft.streaming

import graft.core._
import graft.store.StreamStore

import java.util.UUID

/** The stream-store as a Structured Streaming SINK: the replay story.
  *
  * The reference has no sink (it is a source of record); when this store
  * terminates a streaming pipeline, the contract must survive Spark's
  * at-least-once `foreachBatch` delivery — after a crash between sink
  * commit and checkpoint commit, the NEXT run re-delivers the same
  * micro-batch with the same `batchId`. The exactly-once recipe:
  *
  *  1. derive every messageId deterministically from `(batchId, row key)`
  *     (UUID v5 — [[DeterministicUuid]], the reference's
  *     `MetadataMessageIdGenerator` idea applied per batch), so a replayed
  *     batch re-generates byte-identical message ids; and
  *  2. append with `ExpectedVersion.Any`, whose idempotency rule (ref:
  *     `InMemoryStream.AppendToStreamExpectedVersionAny`,
  *     `EnforceIdempotentAppend.sql:12-39`) makes an exact replay of
  *     already-stored messages a no-op returning the original result —
  *     while a PARTIAL overlap (data changed between runs) still throws,
  *     surfacing non-determinism instead of silently forking history.
  *
  * Usage: `df.writeStream.foreachBatch { (batch, id) =>
  *   StoreSink.writeBatch(store, "out", id, batch.collect().map(...)) }`
  * (the driver-side append is the store's single-writer contract; shard
  * across streams by key for parallel sinks).
  */
object StoreSink {
  /** Namespace for sink-generated v5 ids (itself v5 of the nil UUID). */
  private val Namespace: UUID =
    DeterministicUuid.v5(new UUID(0L, 0L), "graft:streaming-sink")

  /** The deterministic messageId for `ordinal`-th row of `batchId` bound
    * for `streamId` — stable across micro-batch replays. */
  def messageId(streamId: String, batchId: Long, ordinal: Long): String =
    DeterministicUuid.v5(Namespace, s"$streamId\u0000$batchId\u0000$ordinal").toString

  /** Append one micro-batch idempotently: replaying the same (batchId,
    * rows) is a no-op; a replay with DIFFERENT rows throws
    * [[WrongExpectedVersionException]] rather than corrupting the log. */
  def writeBatch(
      store: StreamStore,
      streamId: String,
      batchId: Long,
      rows: Seq[(String, String)]): AppendResult = {
    val messages = rows.zipWithIndex.map { case ((msgType, jsonData), i) =>
      NewStreamMessage(messageId(streamId, batchId, i.toLong), msgType, jsonData)
    }
    store.appendToStream(streamId, ExpectedVersion.Any, messages)
  }
}
