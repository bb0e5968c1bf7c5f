package graft.store

import graft.core._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.{Connection, DriverManager, PreparedStatement, ResultSet, SQLException}
import java.util.UUID

/** RDBMS-backed stream store: the same [[StreamStore]] contract as
  * [[SparkStreamStore]], persisted in relational tables via JDBC — the
  * Spark-side twin of the reference's SQL backends
  * (`reference/src/SqlStreamStore.Postgres/PostgresStreamStore.cs`,
  * `PgSqlScripts/Tables.sql:4-47`).
  *
  * Schema mirrors the reference's two-table star: a `streams` dimension
  * row per stream carrying the denormalized head (`version`, `position`)
  * plus retention settings (`Tables.sql:4-15`), and a `messages` fact/log
  * table keyed by the store-wide position, referencing streams by a
  * surrogate `id_internal` (`Tables.sql:33-47`). A one-row-per-key
  * `counters` table persists the dense position / id allocators so heads
  * never regress across reopen, even after physical deletes.
  *
  * Write path: one JDBC transaction per operation, with the message batch
  * inserted in a single round trip (`PreparedStatement.addBatch` /
  * `executeBatch`) — the shape of the reference's one-round-trip batch
  * insert (`PgSqlScripts/AppendToStream.sql:100-113`). The 5-way
  * expected-version and idempotency semantics are identical to
  * [[SparkStreamStore]] (both port `InMemoryStream.cs:38-163` /
  * `EnforceIdempotentAppend.sql:12-39`); here deletes and MaxCount
  * scavenges are physical row deletes inside the transaction, as in the
  * reference (`DeleteStreamMessages.sql:1-47`, `Scavenge.sql:23-30`),
  * rather than tombstones — the RDBMS makes in-place deletes cheap.
  *
  * Read path: paged reads are driver point-queries over the indexed
  * tables (the page contract is inherently driver-side); the Spark-facing
  * surface is [[allMessages]], a position-partitioned `spark.read.jdbc`
  * scan that parallelizes across executors, so analytical queries and
  * Structured-Streaming-style subscriptions (via
  * `graft.streaming.Subscriptions`, which runs over the trait) operate on
  * the same tables. MaxAge expiry is filtered from pages post-read and
  * purged in-line (`ReadonlyStreamStoreBase.cs:394-490` semantics, with
  * the purge synchronous instead of task-queued).
  *
  * Concurrency: single logical writer per database, serialized through
  * `this` — embedded Derby is in-process, matching the single-JVM driver
  * model; the consistency boundary is the per-operation transaction, as
  * in the reference ("the stream as the … transaction boundary",
  * reference README.md:25).
  */
final class JdbcStreamStore(
    val spark: SparkSession,
    jdbcUrl: String,
    clock: Clock = Clock.System,
    trackDeletes: Boolean = true,
    dialect: Option[SqlDialect] = None)
  extends StreamStore with JdbcPlumbing {

  import JdbcStreamStore._

  /** Engine dialect — resolved from the URL unless injected (the seam
    * that carries every engine-variant construct; see [[SqlDialect]]). */
  override protected val sqlDialect: SqlDialect =
    dialect.getOrElse(SqlDialect.forUrl(jdbcUrl))

  protected val conn: Connection = {
    JdbcStreamStore.ensureDerbyHome()
    val c = DriverManager.getConnection(jdbcUrl)
    c.setAutoCommit(false)
    c
  }

  createSchema()
  private var nextPosition: Long = readCounter("next_position", Position.Start)
  private var nextIdInternal: Long = readCounter("next_id_internal", 0L)

  // ------------------------------------------------------------------
  // Append (ref: AppendToStream.sql:1-177; InMemoryStream.cs:38-163)
  // ------------------------------------------------------------------

  override def appendToStream(
      streamId: String,
      expectedVersion: Int,
      messages: Seq[NewStreamMessage]): AppendResult = synchronized {
    StreamId.validate(streamId)
    require(!StreamId.isSystem(streamId), s"stream id must not start with '$$': $streamId")
    // reject up front (both backends, identically) rather than letting
    // the unique (stream, message_id) index surface a raw SQLException
    require(messages.iterator.map(_.messageId).toSet.size == messages.length,
      s"duplicate message ids within one append batch: $streamId")
    inTx(appendInternal(streamId, expectedVersion, messages))
  }

  private def appendInternal(
      streamId: String,
      expectedVersion: Int,
      messages: Seq[NewStreamMessage]): AppendResult = {
    if (messages.isEmpty && expectedVersion >= 0)
      return AppendResult(expectedVersion, nextPosition - 1)

    expectedVersion match {
      case ExpectedVersion.Any | ExpectedVersion.NoStream =>
        val head = selectHead(streamId).getOrElse(insertHead(streamId))
        if (expectedVersion == ExpectedVersion.NoStream) appendNoStream(streamId, head, messages)
        else appendAny(streamId, head, messages)
      case _ => // EmptyStream (-1) or exact version >= 0: stream must exist
        val head = selectHead(streamId).getOrElse(throw WrongExpectedVersionException(streamId, expectedVersion))
        appendExpectedVersion(streamId, head, expectedVersion, messages)
    }
  }

  /** Ref: InMemoryStream.AppendToStreamExpectedVersionNoStream (:139-163). */
  private def appendNoStream(streamId: String, head: HeadRow, messages: Seq[NewStreamMessage]): AppendResult = {
    if (head.version >= 0) {
      val existing = firstIds(head, messages.length)
      if (messages.length > existing.length) throw WrongExpectedVersionException(streamId, ExpectedVersion.NoStream)
      if (messages.indices.exists(i => existing(i)._2 != messages(i).messageId))
        throw WrongExpectedVersionException(streamId, ExpectedVersion.NoStream)
      AppendResult(head.version, head.position) // full-prefix replay: idempotent no-op
    } else appendEvents(streamId, head, messages)
  }

  /** Ref: InMemoryStream.AppendToStreamExpectedVersionAny (:105-137). */
  private def appendAny(streamId: String, head: HeadRow, messages: Seq[NewStreamMessage]): AppendResult = {
    if (messages.nonEmpty && head.version >= 0) {
      val stored = storedVersions(head, messages.map(_.messageId))
      stored.get(messages.head.messageId) match {
        case Some(v0) =>
          val slice = sliceFrom(head, v0, messages.length)
          if (slice.length < messages.length) throw WrongExpectedVersionException(streamId, ExpectedVersion.Any)
          var n = 1
          while (n < messages.length) {
            if (messages(n).messageId != slice(n)._2)
              throw WrongExpectedVersionException(streamId, ExpectedVersion.Any)
            n += 1
          }
          return AppendResult(head.version, head.position) // exact-suffix replay
        case None =>
          // SQL backends raise WrongExpectedVersion on partial overlap
          // (EnforceIdempotentAppend.sql:12-39)
          if (stored.nonEmpty)
            throw WrongExpectedVersionException(streamId, ExpectedVersion.Any)
      }
    }
    appendEvents(streamId, head, messages)
  }

  /** Ref: InMemoryStream.AppendToStreamExpectedVersion (:56-103). */
  private def appendExpectedVersion(
      streamId: String, head: HeadRow, expectedVersion: Int, messages: Seq[NewStreamMessage]): AppendResult = {
    if (expectedVersion > head.version) throw WrongExpectedVersionException(streamId, expectedVersion)
    if (head.version >= 0 && expectedVersion < head.version) {
      val byVersion = versionRange(head, expectedVersion + 1, expectedVersion + messages.length)
      messages.indices.foreach { i =>
        val v = expectedVersion + i + 1
        byVersion.get(v) match {
          case Some(id) if id == messages(i).messageId => ()
          case _ => throw WrongExpectedVersionException(streamId, expectedVersion)
        }
      }
      AppendResult(head.version, head.position)
    } else {
      if (head.version >= 0 && messages.nonEmpty &&
          storedVersions(head, messages.map(_.messageId)).nonEmpty)
        throw WrongExpectedVersionException(streamId, expectedVersion)
      appendEvents(streamId, head, messages)
    }
  }

  /** Physical append: batch-insert the messages in one round trip, bump
    * the denormalized head row and the persistent position counter in the
    * same transaction (ref: AppendToStream.sql:100-125). */
  private def appendEvents(streamId: String, head: HeadRow, messages: Seq[NewStreamMessage]): AppendResult = {
    if (messages.isEmpty) return AppendResult(head.version, head.position)
    val nowMicros = {
      val i = clock.nowUtc
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    val base = nextPosition
    val ins = cachedStatement(
      s"INSERT INTO $MessagesTable (position, stream_id_internal, stream_version, message_id, created_micros, msg_type, json_data, json_metadata) VALUES (?,?,?,?,?,?,?,?)")
    try {
      messages.zipWithIndex.foreach { case (m, i) =>
        ins.setLong(1, base + i)
        ins.setLong(2, head.idInternal)
        ins.setInt(3, head.version + 1 + i)
        ins.setString(4, m.messageId)
        ins.setLong(5, nowMicros)
        ins.setString(6, m.`type`)
        ins.setString(7, m.jsonData)
        ins.setString(8, m.jsonMetadata)
        ins.addBatch()
      }
      ins.executeBatch()
    } catch { case e: Throwable => try ins.clearBatch() catch { case _: SQLException => () }; throw e }

    val newVersion = head.version + messages.length
    val newPosition = base + messages.length - 1
    update(s"UPDATE $StreamsTable SET version=?, position=? WHERE id_internal=?") { ps =>
      ps.setInt(1, newVersion); ps.setLong(2, newPosition); ps.setLong(3, head.idInternal)
    }
    nextPosition = base + messages.length
    writeCounter("next_position", nextPosition)

    if (streamId.startsWith("$$")) applyMetadataToTarget(streamId.drop(2))
    val after = head.copy(version = newVersion, position = newPosition)
    after.maxCount.foreach(mc => scavenge(after, mc))
    AppendResult(newVersion, newPosition)
  }

  /** New stream row inherits MaxAge/MaxCount from a pre-existing metadata
    * stream (ref: AppendToStream.sql:27-37). */
  private def insertHead(streamId: String): HeadRow = {
    val (maxAge, maxCount) =
      if (StreamId.isSystem(streamId)) (None, None)
      else latestMetadata(streamId).map(m => (m.maxAge, m.maxCount)).getOrElse((None, None))
    val idInternal = nextIdInternal
    nextIdInternal += 1
    writeCounter("next_id_internal", nextIdInternal)
    update(s"INSERT INTO $StreamsTable (id, id_original, id_original_reversed, id_internal, version, position, max_age, max_count) VALUES (?,?,?,?,?,?,?,?)") { ps =>
      ps.setString(1, dbId(streamId))
      ps.setString(2, streamId)
      ps.setString(3, reversed(streamId))
      ps.setLong(4, idInternal)
      ps.setInt(5, StreamVersion.End)
      ps.setLong(6, Position.End)
      setOptInt(ps, 7, maxAge)
      setOptInt(ps, 8, maxCount)
    }
    HeadRow(streamId, idInternal, StreamVersion.End, Position.End, maxAge, maxCount)
  }

  /** MaxCount retention: physically delete rows below the version cutoff,
    * as the reference does post-append (ref: Scavenge.sql:23-30,
    * PostgresStreamStore.Append.cs:69-77). */
  private def scavenge(head: HeadRow, maxCount: Int): Unit = {
    val cutoff = head.version - maxCount // keep versions > cutoff
    if (cutoff >= 0)
      update(s"DELETE FROM $MessagesTable WHERE stream_id_internal=? AND stream_version<=?") { ps =>
        ps.setLong(1, head.idInternal); ps.setInt(2, cutoff)
      }
  }

  // Idempotency replay checks (ref: EnforceIdempotentAppend.sql:12-39).
  // All three lookups are bounded by the INCOMING batch size — O(batch)
  // index probes, never an O(stream-length) replay of the full message
  // list, so appending to a 10M-message stream costs the same as to a
  // 10-message one (the reference gets the same property by inserting
  // first and only replaying ids on constraint violation,
  // AppendToStream.sql:100-151).

  /** First `limit` (version, messageId) pairs in version order. */
  private def firstIds(head: HeadRow, limit: Int): IndexedSeq[(Int, String)] =
    if (limit <= 0) Vector.empty
    else query(s"SELECT stream_version, message_id FROM $MessagesTable WHERE stream_id_internal=? ORDER BY stream_version ${sqlDialect.limitClause(limit)}") {
      ps => ps.setLong(1, head.idInternal)
    } { rs => (rs.getInt(1), rs.getString(2)) }

  /** `limit` (version, messageId) pairs starting at `fromVersion`, in
    * version order — the stored run an exact-suffix replay must match. */
  private def sliceFrom(head: HeadRow, fromVersion: Int, limit: Int): IndexedSeq[(Int, String)] =
    if (limit <= 0) Vector.empty
    else query(s"SELECT stream_version, message_id FROM $MessagesTable WHERE stream_id_internal=? AND stream_version >= ? ORDER BY stream_version ${sqlDialect.limitClause(limit)}") {
      ps => ps.setLong(1, head.idInternal); ps.setInt(2, fromVersion)
    } { rs => (rs.getInt(1), rs.getString(2)) }

  /** version -> messageId for stored versions in [lo, hi]. */
  private def versionRange(head: HeadRow, lo: Int, hi: Int): Map[Int, String] =
    if (hi < lo) Map.empty
    else query(s"SELECT stream_version, message_id FROM $MessagesTable WHERE stream_id_internal=? AND stream_version BETWEEN ? AND ?") {
      ps => ps.setLong(1, head.idInternal); ps.setInt(2, lo); ps.setInt(3, hi)
    } { rs => rs.getInt(1) -> rs.getString(2) }.toMap

  /** Which of `ids` are already stored in the stream → messageId ->
    * stored version; point probes of the unique
    * (stream_id_internal, message_id) index, IN-chunked so huge batches
    * never overflow a statement. The placeholder count is ROUNDED UP to
    * the next power of two (extras re-bind the last id — duplicates in an
    * IN list are harmless), so the whole range of batch sizes maps to
    * ~9 distinct SQL texts and the statement cache actually hits instead
    * of Derby re-compiling a fresh N-placeholder plan per append. */
  private def storedVersions(head: HeadRow, ids: Seq[String]): Map[String, Int] =
    ids.distinct.grouped(IdProbeChunk).flatMap { chunk =>
      val n = Integer.highestOneBit(math.max(1, chunk.length * 2 - 1))
      val placeholders = Seq.fill(n)("?").mkString(",")
      query(s"SELECT message_id, stream_version FROM $MessagesTable WHERE stream_id_internal=? AND message_id IN ($placeholders)") { ps =>
        ps.setLong(1, head.idInternal)
        chunk.zipWithIndex.foreach { case (id, i) => ps.setString(i + 2, id) }
        (chunk.length until n).foreach(i => ps.setString(i + 2, chunk.last))
      } { rs => rs.getString(1) -> rs.getInt(2) }
    }.toMap

  // ------------------------------------------------------------------
  // Reads (ref: ReadAll.sql, Read.sql, ReadonlyStreamStoreBase.cs)
  // ------------------------------------------------------------------

  private def selectSql(prefetch: Boolean): String = {
    val dataCol = if (prefetch) "m.json_data" else sqlDialect.nullText
    s"SELECT s.id_original, m.message_id, m.stream_version, m.position, m.created_micros, m.msg_type, $dataCol, m.json_metadata, s.max_age " +
      s"FROM $MessagesTable m JOIN $StreamsTable s ON s.id_internal = m.stream_id_internal"
  }

  private def readMsg(rs: ResultSet): (StreamMessage, Option[Int]) = {
    val micros = rs.getLong(5)
    val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    val maxAge = { val v = rs.getInt(9); if (rs.wasNull()) None else Some(v) }
    (StreamMessage(rs.getString(1), rs.getString(2), rs.getInt(3), rs.getLong(4), ts,
      rs.getString(6), rs.getString(7), rs.getString(8)), maxAge)
  }

  /** TTL filter, applied post-read like the reference
    * (`ReadonlyStreamStoreBase.cs:394-490`): expired messages are dropped
    * from the page and purged; `$` streams exempt (their head rows never
    * carry max_age). Purge is synchronous here — one DELETE batch plus one
    * tracking append, inside the reading operation's transaction. */
  private def filterExpired(msgs: Seq[(StreamMessage, Option[Int])]): Seq[StreamMessage] = {
    val now = clock.nowUtc
    val (keep, expired) = msgs.partition { case (m, maxAge) =>
      maxAge.forall(a => m.createdUtc.toInstant.plusSeconds(a.toLong).isAfter(now))
    }
    if (expired.nonEmpty) {
      expired.foreach { case (m, _) =>
        update(s"DELETE FROM $MessagesTable WHERE position=?")(_.setLong(1, m.position))
      }
      if (trackDeletes) {
        val tombs = expired.map(_._1).filterNot(m => StreamId.isSystem(m.streamId)).map(m =>
          NewStreamMessage(UUID.randomUUID().toString, Deleted.MessageDeletedMessageType,
            Deleted.messageDeletedPayload(m.streamId, m.messageId)))
        if (tombs.nonEmpty) appendInternal(Deleted.DeletedStreamId, ExpectedVersion.Any, tombs)
      }
    }
    keep.map(_._1)
  }

  override def readAllForwards(from: Long, maxCount: Int, prefetch: Boolean): ReadAllPage = synchronized {
    require(maxCount > 0)
    val fromPos = if (from == Position.End) Long.MaxValue else from
    val rows = inTx(query(selectSql(prefetch) + s" WHERE m.position >= ? ORDER BY m.position ${sqlDialect.limitClause(maxCount + 1)}") {
      ps => ps.setLong(1, fromPos)
    }(readMsg))
    val isEnd = rows.length <= maxCount
    val page = rows.take(maxCount)
    val nextPos =
      if (!isEnd) rows(maxCount)._1.position
      else if (page.nonEmpty) page.last._1.position + 1
      else fromPos
    val kept = inTx(filterExpired(page))
    ReadAllPage(from, nextPos, isEnd, ReadDirection.Forward, kept,
      () => readAllForwards(nextPos, maxCount, prefetch))
  }

  override def readAllBackwards(from: Long, maxCount: Int, prefetch: Boolean): ReadAllPage = synchronized {
    require(maxCount > 0)
    val fromPos = if (from == Position.End) Long.MaxValue else from
    val rows = inTx(query(selectSql(prefetch) + s" WHERE m.position <= ? ORDER BY m.position DESC ${sqlDialect.limitClause(maxCount + 1)}") {
      ps => ps.setLong(1, fromPos)
    }(readMsg))
    if (rows.isEmpty)
      return ReadAllPage(Position.Start, Position.Start, isEnd = true,
        ReadDirection.Backward, Nil,
        () => readAllBackwards(Position.Start, maxCount, prefetch))
    val isEnd = rows.length <= maxCount
    val page = rows.take(maxCount)
    val nextPos = if (!isEnd) rows(maxCount)._1.position else Position.Start
    val kept = inTx(filterExpired(page))
    val resolvedFrom = kept.headOption.map(_.position).getOrElse(0L)
    ReadAllPage(resolvedFrom, nextPos, isEnd, ReadDirection.Backward, kept,
      () => readAllBackwards(nextPos, maxCount, prefetch))
  }

  override def readStreamForwards(streamId: String, fromVersion: Int, maxCount: Int, prefetch: Boolean): ReadStreamPage = synchronized {
    require(maxCount > 0)
    inTx(selectHead(streamId)) match {
      case None =>
        ReadStreamPage(streamId, PageReadStatus.StreamNotFound, fromVersion, StreamVersion.End,
          StreamVersion.End, Position.End, ReadDirection.Forward, isEnd = true, Nil,
          () => readStreamForwards(streamId, fromVersion, maxCount, prefetch))
      case Some(head) =>
        val fromV = math.max(fromVersion, 0)
        val rows = inTx(query(selectSql(prefetch) + s" WHERE m.stream_id_internal = ? AND m.stream_version >= ? ORDER BY m.stream_version ${sqlDialect.limitClause(maxCount + 1)}") {
          ps => ps.setLong(1, head.idInternal); ps.setInt(2, fromV)
        }(readMsg))
        val isEnd = rows.length <= maxCount
        val page = rows.take(maxCount)
        val nextV = if (!isEnd) rows(maxCount)._1.streamVersion else head.version + 1
        val kept = inTx(filterExpired(page))
        ReadStreamPage(streamId, PageReadStatus.Success, fromVersion, nextV, head.version,
          head.position, ReadDirection.Forward, isEnd, kept,
          () => readStreamForwards(streamId, nextV, maxCount, prefetch))
    }
  }

  override def readStreamBackwards(streamId: String, fromVersion: Int, maxCount: Int, prefetch: Boolean): ReadStreamPage = synchronized {
    require(maxCount > 0)
    inTx(selectHead(streamId)) match {
      case None =>
        ReadStreamPage(streamId, PageReadStatus.StreamNotFound, fromVersion, StreamVersion.End,
          StreamVersion.End, Position.End, ReadDirection.Backward, isEnd = true, Nil,
          () => readStreamBackwards(streamId, fromVersion, maxCount, prefetch))
      case Some(head) =>
        val fromV = if (fromVersion == StreamVersion.End) Int.MaxValue else fromVersion
        val rows = inTx(query(selectSql(prefetch) + s" WHERE m.stream_id_internal = ? AND m.stream_version <= ? ORDER BY m.stream_version DESC ${sqlDialect.limitClause(maxCount + 1)}") {
          ps => ps.setLong(1, head.idInternal); ps.setInt(2, fromV)
        }(readMsg))
        val isEnd = rows.length <= maxCount
        val page = rows.take(maxCount)
        val nextV = if (!isEnd) rows(maxCount)._1.streamVersion else StreamVersion.End
        val kept = inTx(filterExpired(page))
        ReadStreamPage(streamId, PageReadStatus.Success, fromVersion, nextV, head.version,
          head.position, ReadDirection.Backward, isEnd, kept,
          () => readStreamBackwards(streamId, nextV, maxCount, prefetch))
    }
  }

  override def readHeadPosition(): Long = synchronized { nextPosition - 1 }

  override def readStreamHeadPosition(streamId: String): Long =
    synchronized { inTx(selectHead(streamId)).map(_.position).getOrElse(Position.End) }

  override def readStreamHeadVersion(streamId: String): Int =
    synchronized { inTx(selectHead(streamId)).map(_.version).getOrElse(StreamVersion.End) }

  override def readMessageData(streamId: String, streamVersion: Int): Option[String] = synchronized {
    inTx(query(
      s"SELECT m.json_data FROM $MessagesTable m JOIN $StreamsTable s ON s.id_internal = m.stream_id_internal WHERE s.id=? AND m.stream_version=?") {
      ps => ps.setString(1, dbId(streamId)); ps.setInt(2, streamVersion)
    }(_.getString(1)).headOption)
  }

  // ------------------------------------------------------------------
  // Deletes (ref: DeleteStream.sql:1-74, DeleteStreamMessages.sql:1-47)
  // ------------------------------------------------------------------

  override def deleteStream(streamId: String, expectedVersion: Int): Unit = synchronized {
    require(!StreamId.isSystem(streamId), s"stream id must not start with '$$': $streamId")
    inTx {
      val head = selectHead(streamId)
      if (head.isEmpty) {
        if (expectedVersion >= 0) throw WrongExpectedVersionException(streamId, expectedVersion)
      } else {
        if (expectedVersion >= 0 && head.get.version != expectedVersion)
          throw WrongExpectedVersionException(streamId, expectedVersion)
        val metaId = MetadataStream.of(streamId)
        val metaHead = selectHead(metaId)
        dropStream(head.get)
        metaHead.foreach(dropStream)
        if (trackDeletes) {
          val events = Seq(NewStreamMessage(
            UUID.randomUUID().toString, Deleted.StreamDeletedMessageType,
            Deleted.streamDeletedPayload(streamId))) ++
            metaHead.map(_ => NewStreamMessage(
              UUID.randomUUID().toString, Deleted.StreamDeletedMessageType,
              Deleted.streamDeletedPayload(metaId)))
          appendInternal(Deleted.DeletedStreamId, ExpectedVersion.Any, events)
        }
      }
    }
  }

  private def dropStream(head: HeadRow): Unit = {
    update(s"DELETE FROM $MessagesTable WHERE stream_id_internal=?")(_.setLong(1, head.idInternal))
    update(s"DELETE FROM $StreamsTable WHERE id_internal=?")(_.setLong(1, head.idInternal))
  }

  override def deleteMessage(streamId: String, messageId: String): Unit = synchronized {
    inTx {
      selectHead(streamId).foreach { head =>
        val n = updateCount(s"DELETE FROM $MessagesTable WHERE stream_id_internal=? AND message_id=?") {
          ps => ps.setLong(1, head.idInternal); ps.setString(2, messageId)
        }
        if (n > 0 && trackDeletes && !StreamId.isSystem(streamId)) {
          val tomb = NewStreamMessage(
            UUID.randomUUID().toString, Deleted.MessageDeletedMessageType,
            Deleted.messageDeletedPayload(streamId, messageId))
          appendInternal(Deleted.DeletedStreamId, ExpectedVersion.Any, Seq(tomb))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // Metadata (ref: PostgresStreamStore.Metadata.cs:25-52, SetStreamMetadata.sql)
  // ------------------------------------------------------------------

  override def getStreamMetadata(streamId: String): StreamMetadataResult = synchronized {
    inTx(latestMetadataMessage(streamId)) match {
      case None => StreamMetadataResult(streamId, StreamVersion.End, None, None, null)
      case Some((version, json)) =>
        val m = MetadataJson.read(json)
        StreamMetadataResult(streamId, version, m.maxAge, m.maxCount, m.metaJson.orNull)
    }
  }

  override def setStreamMetadata(
      streamId: String,
      expectedStreamMetadataVersion: Int,
      maxAge: Option[Int],
      maxCount: Option[Int],
      metadataJson: Option[String]): Unit = synchronized {
    require(!StreamId.isSystem(streamId) || streamId == Deleted.DeletedStreamId,
      s"stream id must not start with '$$': $streamId") // ref: StreamStoreBase.cs:115-118
    val payload = MetadataJson.write(MetadataMessage(streamId, maxAge, maxCount, metadataJson))
    val msg = NewStreamMessage(
      DeterministicUuid.forMetadata(streamId, payload).toString,
      MetadataStream.MetadataMessageType, payload)
    inTx {
      appendInternal(MetadataStream.of(streamId), expectedStreamMetadataVersion, Seq(msg))
      // applyMetadataToTarget ran inside appendEvents; scavenge the target
      // if maxCount shrank (ref: CheckStreamMaxCount after SetStreamMetadata)
      selectHead(streamId).foreach(h => h.maxCount.foreach(mc => scavenge(h, mc)))
    }
  }

  /** Propagate the latest `$$s` metadata to stream `s`'s head retention
    * settings (ref: SetStreamMetadata.sql:20-37). */
  private def applyMetadataToTarget(targetStreamId: String): Unit =
    latestMetadata(targetStreamId).foreach { m =>
      selectHead(targetStreamId).foreach { h =>
        update(s"UPDATE $StreamsTable SET max_age=?, max_count=? WHERE id_internal=?") { ps =>
          setOptInt(ps, 1, m.maxAge); setOptInt(ps, 2, m.maxCount); ps.setLong(3, h.idInternal)
        }
      }
    }

  private def latestMetadata(streamId: String): Option[MetadataMessage] =
    latestMetadataMessage(streamId).map { case (_, json) => MetadataJson.read(json) }

  private def latestMetadataMessage(streamId: String): Option[(Int, String)] =
    selectHead(MetadataStream.of(streamId)).flatMap { h =>
      query(s"SELECT stream_version, json_data FROM $MessagesTable WHERE stream_id_internal=? ORDER BY stream_version DESC ${sqlDialect.limitClause(1)}") {
        ps => ps.setLong(1, h.idInternal)
      } { rs => (rs.getInt(1), rs.getString(2)) }.headOption
    }

  // ------------------------------------------------------------------
  // ListStreams (ref: ListStreams.sql:10-16, Pattern.cs:7-37)
  // ------------------------------------------------------------------

  /** Keyset-paged stream listing pushed to the database as an indexed
    * range scan — O(page), not O(streams), per call (ref:
    * ListStreams.sql:10-16 pages on id_internal the same way). */
  override def listStreams(pattern: Pattern, maxCount: Int, continuationToken: Option[String]): ListStreamsPage = synchronized {
    val afterId = continuationToken.map(_.toLong).getOrElse(-1L)
    val (patternSql, patternArg) = pattern match {
      case Pattern.Anything => ("", None)
      case Pattern.StartsWith(p) => (" AND id_original LIKE ? ESCAPE '!'", Some(escapeLike(p) + "%"))
      // suffix match = indexed PREFIX scan on the reversed column (v2;
      // ref MsSql V3's IdOriginalReversed, ScriptsV3/CreateSchema.sql:50-64):
      // a leading-wildcard LIKE can never use an index, the reversed form can
      case Pattern.EndsWith(p) =>
        (" AND id_original_reversed LIKE ? ESCAPE '!'", Some(escapeLike(reversed(p)) + "%"))
    }
    val rows = inTx(query(
      s"SELECT id_original, id_internal FROM $StreamsTable WHERE id_internal > ?$patternSql ORDER BY id_internal ${sqlDialect.limitClause(maxCount)}") { ps =>
      ps.setLong(1, afterId)
      patternArg.foreach(ps.setString(2, _))
    } { rs => (rs.getString(1), rs.getLong(2)) })
    val token = rows.lastOption.map(_._2).getOrElse(afterId).toString
    ListStreamsPage(rows.map(_._1), token,
      () => listStreams(pattern, maxCount, Some(token)))
  }

  private def escapeLike(s: String): String =
    s.flatMap {
      case c @ ('%' | '_' | '!') => s"!$c"
      case c => c.toString
    }

  // ------------------------------------------------------------------
  // Spark surface
  // ------------------------------------------------------------------

  /** The all-stream as a DataFrame: a position-partitioned parallel JDBC
    * scan (`spark.read.jdbc` with `partitionColumn` — each executor reads
    * a position range), schema-aligned with
    * [[SparkStreamStore.allMessages]] so analytical queries are
    * backend-agnostic. Filters on `position` prune partitions at the
    * database via the generated range predicates. */
  def allMessages(numPartitions: Int = spark.sparkContext.defaultParallelism): DataFrame = {
    val bounds = synchronized(inTx(query(
      s"SELECT MIN(position), MAX(position) FROM $MessagesTable")(_ => ()) { rs =>
      (rs.getLong(1), rs.wasNull(), rs.getLong(2))
    }.headOption))
    val view =
      s"""(SELECT s.id_original AS stream_id, m.message_id, m.stream_version, m.position,
         |  m.created_micros, m.msg_type, m.json_data, m.json_metadata
         |  FROM $MessagesTable m JOIN $StreamsTable s ON s.id_internal = m.stream_id_internal) v""".stripMargin
    bounds match {
      case Some((lo, false, hi)) =>
        val props = new java.util.Properties()
        spark.read.jdbc(jdbcUrl, view, "POSITION", lo, hi + 1,
          math.max(1, math.min(numPartitions, (hi - lo + 1).toInt)), props)
          .select(
            col("STREAM_ID").as("streamId"),
            col("MESSAGE_ID").as("messageId"),
            col("STREAM_VERSION").as("streamVersion"),
            col("POSITION").as("position"),
            expr("timestamp_micros(CREATED_MICROS)").as("createdUtc"),
            col("MSG_TYPE").as("type"),
            col("JSON_DATA").as("jsonData"),
            col("JSON_METADATA").as("jsonMetadata"))
      case _ =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], JdbcMessageSchema)
    }
  }

  /** The all-stream as a Structured Streaming source (the DSv2
    * micro-batch source over this database: offsets = log positions,
    * batches read as parallel position ranges) — the streaming twin of
    * [[SparkStreamStore.allMessagesStream]], so both backends expose the
    * same batch + streaming surfaces. */
  def allMessagesStream(numPartitions: Int = spark.sparkContext.defaultParallelism,
      fromPositionExclusive: Long = -1L): DataFrame =
    spark.readStream
      .format("graft.sources.JdbcLogSource")
      .option("url", jdbcUrl)
      .option("numPartitions", numPartitions.toString)
      .option("fromPosition", fromPositionExclusive.toString)
      .load()

  // ------------------------------------------------------------------
  // Plumbing
  // ------------------------------------------------------------------

  /** Fixed-width database key for a stream id (ref:
    * `PostgresqlStreamId.cs:14-27` — sha over the original). */
  private def dbId(streamId: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(streamId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  private def selectHead(streamId: String): Option[HeadRow] =
    query(s"SELECT id_internal, version, position, max_age, max_count FROM $StreamsTable WHERE id=?") {
      ps => ps.setString(1, dbId(streamId))
    } { rs =>
      val maxAge = { val v = rs.getInt(4); if (rs.wasNull()) None else Some(v) }
      val maxCount = { val v = rs.getInt(5); if (rs.wasNull()) None else Some(v) }
      HeadRow(streamId, rs.getLong(1), rs.getInt(2), rs.getLong(3), maxAge, maxCount)
    }.headOption

  /** Run `f` in the connection's transaction: commit on success, roll back
    * on failure. Re-entrant (inner calls piggyback on the outer tx) so
    * deletes/purges can append tracking events atomically. */
  private var txDepth = 0
  private def inTx[T](f: => T): T = {
    txDepth += 1
    try {
      val r = f
      txDepth -= 1
      if (txDepth == 0) conn.commit()
      r
    } catch {
      case e: Throwable =>
        txDepth -= 1
        if (txDepth == 0) try conn.rollback() catch { case _: SQLException => () }
        throw e
    }
  }

  private def readCounter(key: String, default: Long): Long =
    inTx(query(s"SELECT v FROM $CountersTable WHERE k=?")(_.setString(1, key))(_.getLong(1)).headOption.getOrElse(default))

  private def writeCounter(key: String, v: Long): Unit = {
    val n = updateCount(s"UPDATE $CountersTable SET v=? WHERE k=?") { ps => ps.setLong(1, v); ps.setString(2, key) }
    if (n == 0) update(s"INSERT INTO $CountersTable (k, v) VALUES (?,?)") { ps => ps.setString(1, key); ps.setLong(2, v) }
  }

  /** Schema version check (ref: `PostgresStreamStore.cs:127-137`,
    * `CheckSchemaResult.cs`): the version stamped when this database's
    * schema was created vs the version this code expects. Databases
    * created before versioning report 0 — the stamp is written only at
    * schema creation, never retro-stamped on reopen, so a mismatch
    * faithfully means "migrate before using". */
  def checkSchema(): CheckSchemaResult = synchronized {
    CheckSchemaResult(readCounter(SchemaVersionKey, 0L).toInt, CurrentSchemaVersion)
  }

  /** The DDL this store executes at open, for DBA-managed deployments
    * (ref: `SchemaCreationScriptTool/Program.cs`,
    * `PostgresStreamStore.cs:258` `GetSchemaCreationScript`). */
  def schemaCreationScript: String = JdbcStreamStore.schemaCreationScript(sqlDialect)

  /** Bring this database's schema to [[CurrentSchemaVersion]], one
    * versioned step at a time (ref: `MigrateProgress.cs`,
    * `PostgresStreamStore.Migration.cs` — the reference ships migration
    * tooling beside `CheckSchema`). The ladder is DATA
    * ([[JdbcStreamStore.migrationLadder]]): each rung brings `from` to
    * `from + 1` and the version is stamped + committed per rung, so a
    * crash mid-ladder resumes at the completed rung (the 2-hop shape of
    * the reference's operational V2→V3 mover, `MsSqlStreamStoreV3`). A
    * database stamped NEWER than this code refuses to migrate
    * (downgrade). Returns the version migrated to. */
  def migrate(): Int =
    migrateTo(CurrentSchemaVersion, JdbcStreamStore.migrationLadder)

  /** Ladder fold, target + rungs injectable — the test seam that lets a
    * multi-hop upgrade (v1 → v3) run before a real v3 exists. */
  private[store] def migrateTo(
      target: Int, ladder: Seq[JdbcStreamStore.MigrationStep]): Int = synchronized {
    var v = checkSchema().currentVersion
    require(v <= target,
      s"database schema version $v is newer than this code's $target — refusing to downgrade")
    while (v < target) {
      val from = v
      val step = ladder.find(_.from == from).getOrElse(
        throw new IllegalStateException(s"no migration defined from schema version $from"))
      step.run(this)
      v += 1
      writeCounter(SchemaVersionKey, v.toLong)
      conn.commit()
    }
    v
  }

  /** v0 (pre-versioning / partial creation) → v1: complete whatever v1
    * objects are missing, tolerate whatever exists — INCLUDING the
    * reference's legacy pre-0.8.0 layout (ref
    * `SqlStreamStore.MsSql/ScriptsV2/CreateSchema_v1.sql`: a Streams
    * table WITHOUT the per-stream `Position` column). For that shape
    * the already-exists-tolerant CREATE leaves the column missing, so
    * this rung mirrors the reference's `ScriptsV2/Migration_v2.sql`:
    * add `position` defaulted to −1, then backfill each stream from its
    * own max message position (streams with no messages stay −1 —
    * exactly the reference's `ISNULL(MAX(...), -1)`). */
  private[store] def stepV0toV1(): Unit = {
    creationDdlV1(sqlDialect).foreach(ddl)
    if (!columnExists(StreamsTable, "position")) {
      val Seq(alter, backfill) =
        JdbcStreamStore.legacyPositionMigration(sqlDialect)
      ddl(alter)
      cachedStatement(backfill).executeUpdate()
    }
  }

  /** v1 → v2: add the reversed-id column, BACKFILL it from id_original
    * (real data movement — keyset-paged so memory stays bounded at any
    * stream count, the shape of the reference's `MigrateProgress.cs`
    * batch loop), then index it for suffix-listing pushdown. */
  private[store] def stepV1toV2(): Unit = {
    if (!columnExists(StreamsTable, "id_original_reversed"))
      ddl(s"ALTER TABLE $StreamsTable ADD COLUMN id_original_reversed VARCHAR(1000)")
    var after = -1L
    var page = backfillPage(after)
    while (page.nonEmpty) {
      val upd = cachedStatement(
        s"UPDATE $StreamsTable SET id_original_reversed=? WHERE id_internal=?")
      page.foreach { case (idInternal, idOriginal) =>
        upd.setString(1, reversed(idOriginal)); upd.setLong(2, idInternal); upd.addBatch()
      }
      upd.executeBatch()
      after = page.last._1
      page = backfillPage(after)
    }
    ddl(s"CREATE INDEX ${StreamsTable}_rev ON $StreamsTable(id_original_reversed)")
  }

  /** DDL bridge for ladder rungs defined outside this class (the
    * companion's [[JdbcStreamStore.migrationLadder]] entries and
    * test-injected rungs run against the store's own connection —
    * embedded Derby holds an exclusive file lock, so a side connection
    * cannot do it). */
  private[store] def migrationDdl(sql: String): Boolean = ddl(sql)

  private def backfillPage(after: Long): IndexedSeq[(Long, String)] =
    query(s"SELECT id_internal, id_original FROM $StreamsTable WHERE id_internal > ? AND id_original_reversed IS NULL ORDER BY id_internal ${sqlDialect.limitClause(MigrateBatch)}") {
      ps => ps.setLong(1, after)
    } { rs => (rs.getLong(1), rs.getString(2)) }

  private def tableExists(table: String): Boolean = {
    val md = conn.getMetaData
    Seq(table.toUpperCase, table.toLowerCase, table).distinct.exists { t =>
      val rs = md.getTables(null, null, t, null)
      try rs.next() finally rs.close()
    }
  }

  private def columnExists(table: String, column: String): Boolean = {
    val md = conn.getMetaData
    (for {
      t <- Seq(table.toUpperCase, table.toLowerCase, table).distinct
      c <- Seq(column.toUpperCase, column.toLowerCase, column).distinct
    } yield (t, c)).exists { case (t, c) =>
      val rs = md.getColumns(null, null, t, c)
      try rs.next() finally rs.close()
    }
  }

  /** Fresh database (no streams table): create the CURRENT schema and
    * stamp it — but only when every object was created by this call AND
    * no version row exists (a crash mid-DDL keeps reporting version 0,
    * and [[migrate]] is the defined way forward — never a silent
    * retro-stamp on reopen). An EXISTING database is left untouched: its
    * stamp tells [[checkSchema]] the story, and an old-version database
    * must [[migrate]] before writes (the reference's documented
    * contract) — only the counters table is completed so the version
    * check itself can run on crash-partial databases. */
  private def createSchema(): Unit = synchronized {
    if (!tableExists(StreamsTable)) {
      val created = creationDdl(sqlDialect).map(ddl)
      if (created.forall(identity) && readCounter(SchemaVersionKey, 0L) == 0L)
        writeCounter(SchemaVersionKey, CurrentSchemaVersion.toLong)
    } else if (!tableExists(CountersTable)) {
      // crash-partial database: complete just the counters table so the
      // version check itself can run (metadata-guarded rather than
      // relying on already-exists tolerance, which an unknown dialect
      // cannot classify)
      creationDdlV1(sqlDialect).filter(_.contains(CountersTable)).foreach(ddl)
    }
    conn.commit()
  }

  override def close(): Unit = synchronized {
    closeCachedStatements()
    try conn.close() catch { case _: SQLException => () }
    derbyShutdown(jdbcUrl) // release embedded Derby's file locks
  }
}

object JdbcStreamStore {
  private val StreamsTable = "graft_streams"
  private val MessagesTable = "graft_messages"
  private val CountersTable = "graft_counters"

  /** Max ids per IN-list when probing stored message ids. */
  private val IdProbeChunk = 256

  /** Rows per keyset page during the v1→v2 backfill. */
  private val MigrateBatch = 1000

  /** Version this code writes when it creates a schema; bump on any DDL
    * change (ref: `MsSqlStreamStoreV3` `CurrentVersion`). v2 added
    * `id_original_reversed` + its index (suffix ListStreams pushdown —
    * the reference's MsSql V3 made the same move with its computed
    * `IdOriginalReversed` column, `ScriptsV3/CreateSchema.sql:50-64`). */
  val CurrentSchemaVersion = 2
  private val SchemaVersionKey = "schema_version"

  /** One rung of the migration ladder: brings a database from schema
    * version `from` to `from + 1`. The ladder is an ordered value, not a
    * match statement, so a future v3 is an APPEND here and nothing else
    * changes — and tests exercise a 2-hop upgrade today by extending it
    * (JdbcStoreSpec's v1→v3 case). */
  private[store] final case class MigrationStep(
      from: Int, describe: String, run: JdbcStreamStore => Unit)

  private[store] val migrationLadder: Seq[MigrationStep] = Seq(
    MigrationStep(0, "complete the v1 object set (pre-versioning / crash-partial " +
      "creation, incl. the legacy no-stream-position layout: add + backfill it)",
      _.stepV0toV1()),
    MigrationStep(1, "add + keyset-backfill id_original_reversed, then index it",
      _.stepV1toV2()))

  /** Surrogate-pair-aware string reversal — the ONE definition used both
    * to fill `id_original_reversed` and to reverse EndsWith patterns, so
    * the prefix match can never disagree with the stored form. */
  private[store] def reversed(s: String): String =
    new java.lang.StringBuilder(s).reverse.toString

  /** Two-table star + counters (ref: Tables.sql:4-47); id_internal is the
    * surrogate FK keeping message-index keys fixed-width, and `id` is the
    * fixed-width hash of `id_original` (ref: CHAR(42) sha1 id +
    * VARCHAR(1000) original, PostgresqlStreamId.cs:14-27 — here sha-256,
    * the divergence SURVEY §2 row 32 documents), so arbitrarily-shaped
    * stream ids never overflow the primary-key index. The messages
    * (stream, message_id) index is unique, as the reference's
    * uq_stream_id_internal_and_message_id (Tables.sql:45) — it backs the
    * O(batch) idempotency probes. */
  /** The v1 object set — what a pre-v2 database contains; kept as the
    * 0→1 migration step's target and as the test fixture for real v1→v2
    * upgrades. Text columns use the dialect's unbounded type. */
  private[store] def creationDdlV1(d: SqlDialect): Seq[String] = Seq(
    s"""CREATE TABLE $StreamsTable (
       |  id VARCHAR(64) NOT NULL PRIMARY KEY,
       |  id_original VARCHAR(1000) NOT NULL,
       |  id_internal BIGINT NOT NULL,
       |  version INT NOT NULL,
       |  position BIGINT NOT NULL,
       |  max_age INT,
       |  max_count INT)""".stripMargin,
    s"CREATE UNIQUE INDEX ${StreamsTable}_internal ON $StreamsTable(id_internal)",
    s"""CREATE TABLE $MessagesTable (
       |  position BIGINT NOT NULL PRIMARY KEY,
       |  stream_id_internal BIGINT NOT NULL,
       |  stream_version INT NOT NULL,
       |  message_id VARCHAR(64) NOT NULL,
       |  created_micros BIGINT NOT NULL,
       |  msg_type VARCHAR(1000),
       |  json_data ${d.textType},
       |  json_metadata ${d.textType})""".stripMargin,
    s"CREATE UNIQUE INDEX ${MessagesTable}_sv ON $MessagesTable(stream_id_internal, stream_version)",
    s"CREATE UNIQUE INDEX ${MessagesTable}_mid ON $MessagesTable(stream_id_internal, message_id)",
    s"""CREATE TABLE $CountersTable (
       |  k VARCHAR(64) NOT NULL PRIMARY KEY,
       |  v BIGINT NOT NULL)""".stripMargin)

  /** The reference's LEGACY pre-0.8.0 layout (ref
    * `SqlStreamStore.MsSql/ScriptsV2/CreateSchema_v1.sql`): the v1
    * object set WITHOUT the per-stream `position` column — what a
    * database created by the oldest deployments contains. Kept as the
    * test fixture for the v0 rung's add-and-backfill path (the
    * `ScriptsV2/Migration_v2.sql` semantics). */
  private[store] def creationDdlLegacy(d: SqlDialect): Seq[String] =
    creationDdlV1(d).map {
      case t if t.startsWith(s"CREATE TABLE $StreamsTable") =>
        t.replace("  position BIGINT NOT NULL,\n", "")
      case t => t
    }

  /** The legacy rung's add+backfill statements as a function of the
    * dialect — exposed so SqlDialectSpec can pin the EXACT text each
    * engine receives (r14 verdict #7: the other rungs carry per-dialect
    * text pins; this one was acceptance-tested on Derby only). Both
    * statements are deliberately ANSI-invariant — no limit suffix, no
    * text type, no vendor function — and the spec asserts that
    * invariance, so the Derby-acceptance-tested rung is textually the
    * one a Postgres/MySql/Sqlite user runs. Mirrors the reference's
    * `MsSql/ScriptsV2/Migration_v2.sql` (add `position` at −1, backfill
    * per stream via `ISNULL(MAX(...), -1)` — COALESCE is its ANSI
    * spelling). */
  private[store] def legacyPositionMigration(d: SqlDialect): Seq[String] = Seq(
    s"ALTER TABLE $StreamsTable ADD COLUMN position BIGINT DEFAULT -1 NOT NULL",
    s"""UPDATE $StreamsTable SET position =
       |  COALESCE((SELECT MAX(m.position) FROM $MessagesTable m
       |            WHERE m.stream_id_internal = $StreamsTable.id_internal), -1)"""
      .stripMargin)

  /** v2 additions: the reversed-id column + its index, which turn
    * `ListStreams(EndsWith)` from a full suffix scan into an indexed
    * prefix range scan on the reversed form. */
  private[store] def additionDdlV2: Seq[String] = Seq(
    s"ALTER TABLE $StreamsTable ADD COLUMN id_original_reversed VARCHAR(1000)",
    s"CREATE INDEX ${StreamsTable}_rev ON $StreamsTable(id_original_reversed)")

  /** Current-version creation DDL (fresh databases are born at v2: the
    * column rides the CREATE TABLE, then the index). */
  private[store] def creationDdl(d: SqlDialect): Seq[String] =
    creationDdlV1(d).map {
      case t if t.startsWith(s"CREATE TABLE $StreamsTable") =>
        t.replace("  max_count INT)", "  max_count INT,\n  id_original_reversed VARCHAR(1000))")
      case t => t
    } :+ s"CREATE INDEX ${StreamsTable}_rev ON $StreamsTable(id_original_reversed)"

  /** The creation DDL as one script (ref: `SchemaCreationScriptTool`). */
  def schemaCreationScript: String = schemaCreationScript(SqlDialect.Derby)
  def schemaCreationScript(d: SqlDialect): String =
    creationDdl(d).mkString(";\n\n") + ";\n"

  /** Result of [[JdbcStreamStore.checkSchema]] (ref:
    * `SqlStreamStore.Postgres/CheckSchemaResult.cs:5-16`). */
  final case class CheckSchemaResult(currentVersion: Int, expectedVersion: Int) {
    def isMatch: Boolean = currentVersion == expectedVersion
  }

  private final case class HeadRow(
      streamId: String,
      idInternal: Long,
      version: Int,
      position: Long,
      maxAge: Option[Int],
      maxCount: Option[Int])

  /** Schema of [[JdbcStreamStore.allMessages]] — identical to
    * `SparkStreamStore`'s message schema so queries are backend-agnostic. */
  val JdbcMessageSchema: StructType = StructType(Seq(
    StructField("streamId", StringType),
    StructField("messageId", StringType),
    StructField("streamVersion", IntegerType),
    StructField("position", LongType),
    StructField("createdUtc", TimestampType),
    StructField("type", StringType),
    StructField("jsonData", StringType),
    StructField("jsonMetadata", StringType)))

  /** Derby writes `derby.log` into `derby.system.home`; default it to the
    * JVM temp dir so embedded databases never litter the working tree.
    * Called before the first connection is opened. */
  private[store] def ensureDerbyHome(): Unit =
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
}
