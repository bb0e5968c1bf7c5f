package graft.core

import java.time.Instant

/** Core value types of the stream store.
  *
  * Semantics follow the reference event-store contract
  * (`/root/reference/src/SqlStreamStore/Streams/` sources); representation is
  * re-designed for Spark (case classes with stable Catalyst-encodable
  * shapes, see `graft.store.SparkStreamStore`).
  */

/** Store-wide position sentinels.
  * Ref: `src/SqlStreamStore/Streams/Position.cs:16-21`. */
object Position {
  val Start: Long = 0L
  val End: Long = -1L
}

/** Per-stream version sentinels.
  * Ref: `src/SqlStreamStore/Streams/StreamVersion.cs:16-21`. */
object StreamVersion {
  val Start: Int = 0
  val End: Int = -1
}

/** Expected-version sentinels for optimistic-concurrency appends.
  * Ref: `src/SqlStreamStore/Streams/ExpectedVersion.cs:12-23`. */
object ExpectedVersion {
  val EmptyStream: Int = -1
  val Any: Int = -2
  val NoStream: Int = -3
}

/** Validated stream id: any non-whitespace string; user streams must not
  * start with '$' (enforced at the store API layer, not here).
  * Ref: `src/SqlStreamStore/Streams/StreamId.cs:13-27`. */
object StreamId {
  def validate(id: String): String = {
    require(id != null && id.nonEmpty, "stream id must be non-empty")
    require(!id.exists(_.isWhitespace), s"stream id must not contain whitespace: '$id'")
    id
  }
  def isSystem(id: String): Boolean = id.startsWith("$")
}

/** System stream / message-type names used for deletion tracking.
  * Ref: `src/SqlStreamStore/Streams/Deleted.cs:14-24`. */
object Deleted {
  val DeletedStreamId = "$deleted"
  val StreamDeletedMessageType = "$stream-deleted"
  val MessageDeletedMessageType = "$message-deleted"
  def streamDeletedPayload(streamId: String): String =
    s"""{"StreamId":${Json.quote(streamId)}}"""
  def messageDeletedPayload(streamId: String, messageId: String): String =
    s"""{"StreamId":${Json.quote(streamId)},"MessageId":${Json.quote(messageId)}}"""
}

/** Metadata shadow-stream naming: metadata for stream `s` lives in `$$s`.
  * Ref: `src/SqlStreamStore.Postgres/StreamIdInfo.cs:16`. */
object MetadataStream {
  val MetadataMessageType = "$stream-metadata"
  def of(streamId: String): String = "$$" + streamId
}

/** A message to be appended (user-supplied part).
  * Ref: `src/SqlStreamStore/Streams/NewStreamMessage.cs`. */
final case class NewStreamMessage(
    messageId: String,
    `type`: String,
    jsonData: String,
    jsonMetadata: String = null)

/** A stored message (engine-assigned ordering fields included).
  * Ref: `src/SqlStreamStore/Streams/StreamMessage.cs:10-19`. */
final case class StreamMessage(
    streamId: String,
    messageId: String,
    streamVersion: Int,
    position: Long,
    createdUtc: java.sql.Timestamp,
    `type`: String,
    jsonData: String,
    jsonMetadata: String)

/** Result of an append: new head version/position of the stream.
  * Ref: `src/SqlStreamStore/Streams/AppendResult.cs`. */
final case class AppendResult(currentVersion: Int, currentPosition: Long)

sealed trait ReadDirection
object ReadDirection {
  case object Forward extends ReadDirection
  case object Backward extends ReadDirection
}

/** Stream-read status. Ref: `src/SqlStreamStore/Streams/PageReadStatus.cs`. */
sealed trait PageReadStatus
object PageReadStatus {
  case object Success extends PageReadStatus
  case object StreamNotFound extends PageReadStatus
}

/** Page of the global all-stream.
  * Ref: `src/SqlStreamStore/Streams/ReadAllPage.cs:16-36`. */
final case class ReadAllPage(
    fromPosition: Long,
    nextPosition: Long,
    isEnd: Boolean,
    direction: ReadDirection,
    messages: Seq[StreamMessage],
    readNext: () => ReadAllPage)

/** Page of a single stream.
  * Ref: `src/SqlStreamStore/Streams/ReadStreamPage.cs:27-52`. */
final case class ReadStreamPage(
    streamId: String,
    status: PageReadStatus,
    fromStreamVersion: Int,
    nextStreamVersion: Int,
    lastStreamVersion: Int,
    lastStreamPosition: Long,
    direction: ReadDirection,
    isEnd: Boolean,
    messages: Seq[StreamMessage],
    readNext: () => ReadStreamPage)

/** Stream-listing pattern ADT.
  * Ref: `src/SqlStreamStore/Streams/Pattern.cs:7-37`. */
sealed trait Pattern
object Pattern {
  case object Anything extends Pattern
  final case class StartsWith(value: String) extends Pattern
  final case class EndsWith(value: String) extends Pattern
}

/** Page of stream ids. Ref: `src/SqlStreamStore/Streams/ListStreamsPage.cs`. */
final case class ListStreamsPage(
    streamIds: Seq[String],
    continuationToken: String,
    readNext: () => ListStreamsPage)

/** Stream metadata read-back.
  * Ref: `src/SqlStreamStore/Streams/StreamMetadataResult.cs`. */
final case class StreamMetadataResult(
    streamId: String,
    metadataStreamVersion: Int,
    maxAge: Option[Int],
    maxCount: Option[Int],
    metadataJson: String)

/** Retention/metadata payload stored in `$$stream` messages.
  * Ref: `src/SqlStreamStore/Streams/MetadataMessage.cs:11-26`. */
final case class MetadataMessage(
    streamId: String,
    maxAge: Option[Int],
    maxCount: Option[Int],
    metaJson: Option[String])

/** Optimistic-concurrency violation.
  * Ref: `src/SqlStreamStore/WrongExpectedVersionException.cs`. */
final class WrongExpectedVersionException(
    val streamId: String,
    val expectedVersion: Int,
    message: String)
  extends RuntimeException(message)

object WrongExpectedVersionException {
  def apply(streamId: String, expectedVersion: Int): WrongExpectedVersionException =
    new WrongExpectedVersionException(
      streamId, expectedVersion,
      s"Append failed due to WrongExpectedVersion. Stream: $streamId, Expected version: $expectedVersion")
}

/** A second writer tried to open a log root whose lease is held and fresh
  * (strict mode, `leaseTimeoutMs > 0`). The cross-process twin of the
  * reference's DB transaction boundary: the RDBMS serialized writers for
  * it (`PgSqlScripts/AppendToStream.sql` runs inside one transaction);
  * the parquet store serializes them with an exclusive lease file. */
final class StoreLockedException(val root: String, message: String)
  extends RuntimeException(message)

/** This writer's lease was taken over by another process (fencing epoch
  * bumped); every subsequent mutation fails with this instead of silently
  * interleaving appends into a log the new owner now writes. */
final class StoreFencedException(val root: String, message: String)
  extends RuntimeException(message)

/** Injectable clock so TTL/retention tests control time instead of sleeping.
  * Ref: `src/SqlStreamStore/Infrastructure/GetUtcNow.cs`. */
trait Clock extends Serializable { def nowUtc: Instant }
object Clock {
  object System extends Clock { def nowUtc: Instant = Instant.now() }
  /** Mutable test clock. */
  final class Manual(start: Instant) extends Clock {
    @volatile private var t: Instant = start
    def nowUtc: Instant = t
    def set(i: Instant): Unit = t = i
    def advanceSeconds(s: Long): Unit = t = t.plusSeconds(s)
  }
}

/** Minimal JSON helpers for the store's own tiny payloads (metadata and
  * tombstones). User payloads stay opaque strings, as in the reference
  * ("JSON only event and metadata payloads", README.md:24). */
object Json {
  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
