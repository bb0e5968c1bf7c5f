package graft.store

import graft.core._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.Timestamp
import java.util.UUID
import java.util.concurrent.Executors
import scala.collection.mutable

/** Spark-native stream store over an append-only parquet log.
  *
  * Architecture (SURVEY.md §7): the `messages` parquet directory is the
  * single source of truth; per-stream heads, the global position
  * high-water mark, and retention settings are driver-side state rebuilt
  * on open by one Spark aggregation (`groupBy(streamId).agg(max…)`), which
  * is the recovery path the reference gets for free from its RDBMS.
  *
  * Concurrency model: all mutation is serialized through this object
  * (single logical writer) — the consistency/transaction boundary the
  * reference obtains from DB transactions ("the stream as the consistency
  * and transaction boundary", reference README.md:25). Reads are pure
  * DataFrame pipelines and can run concurrently.
  *
  * Scale design (100 TB): the log is written one compact parquet file per
  * append batch, sorted by `position`, so parquet min/max stats give the
  * optimizer position-range skipping; reads are single-table index-shaped
  * scans (filter → orderBy → limit ⇒ `TakeOrderedAndProject`, no shuffle).
  * Per-stream reads push an equality filter on `streamId` to the scan. A
  * size-tiered [[compact]] job bounds file count; at cluster scale the
  * same layout would be bucketed by `streamId` and the driver-side heads
  * map becomes a small broadcast table.
  *
  * Semantics ported from the reference (file:line cites on each member).
  */
final class SparkStreamStore(
    val spark: SparkSession,
    rootDir: String,
    clock: Clock = Clock.System,
    trackDeletes: Boolean = true,
    scavengeSynchronously: Boolean = true)
  extends StreamStore {

  import SparkStreamStore._

  private val messagesDir = rootDir.stripSuffix("/") + "/messages"
  private val fs = FileSystem.get(new java.net.URI(messagesDir), spark.sparkContext.hadoopConfiguration)

  /** Driver-side head state per stream (ref: denormalized `streams` table,
    * `SqlStreamStore.Postgres/PgSqlScripts/Tables.sql:4-15`). */
  private final case class Head(
      idInternal: Long,
      var version: Int,
      var position: Long,
      var maxAge: Option[Int],
      var maxCount: Option[Int])

  private val heads = mutable.LinkedHashMap.empty[String, Head]
  private var nextPosition: Long = Position.Start
  private var nextIdInternal: Long = 0L

  /** Background purge of TTL-expired rows, mirroring the reference's
    * `TaskQueue` (`src/SqlStreamStore/Infrastructure/TaskQueue.cs`). */
  private val purgeExecutor = Executors.newSingleThreadExecutor(r => {
    val t = new Thread(r, "graft-purge"); t.setDaemon(true); t
  })

  recover()

  // ------------------------------------------------------------------
  // Append (ref: AppendToStream.sql:1-177; InMemoryStream.cs:38-163)
  // ------------------------------------------------------------------

  override def appendToStream(
      streamId: String,
      expectedVersion: Int,
      messages: Seq[NewStreamMessage]): AppendResult = synchronized {
    StreamId.validate(streamId)
    require(!StreamId.isSystem(streamId), s"stream id must not start with '$$': $streamId")
    appendInternal(streamId, expectedVersion, messages)
  }

  private def appendInternal(
      streamId: String,
      expectedVersion: Int,
      messages: Seq[NewStreamMessage]): AppendResult = {
    // Empty batch with a concrete expected version: no-op at head
    // (ref: StreamStoreBase.cs:59-66).
    if (messages.isEmpty && expectedVersion >= 0)
      return AppendResult(expectedVersion, readHeadPosition())

    expectedVersion match {
      case ExpectedVersion.Any | ExpectedVersion.NoStream =>
        val head = heads.getOrElseUpdate(streamId, createHead(streamId))
        if (expectedVersion == ExpectedVersion.NoStream) appendNoStream(streamId, head, messages)
        else appendAny(streamId, head, messages)
      case _ => // EmptyStream (-1) or exact version >= 0: stream must exist
        val head = heads.getOrElse(streamId, throw WrongExpectedVersionException(streamId, expectedVersion))
        appendExpectedVersion(streamId, head, expectedVersion, messages)
    }
  }

  /** New stream row inherits MaxAge/MaxCount from a pre-existing metadata
    * stream (ref: AppendToStream.sql:27-37). */
  private def createHead(streamId: String): Head = {
    val (maxAge, maxCount) =
      if (StreamId.isSystem(streamId)) (None, None)
      else latestMetadata(streamId).map(m => (m.maxAge, m.maxCount)).getOrElse((None, None))
    val h = Head(nextIdInternal, StreamVersion.End, Position.End, maxAge, maxCount)
    nextIdInternal += 1
    h
  }

  /** Ref: InMemoryStream.AppendToStreamExpectedVersionNoStream (:139-163). */
  private def appendNoStream(streamId: String, head: Head, messages: Seq[NewStreamMessage]): AppendResult = {
    if (head.version >= 0) {
      val existing = existingIds(streamId)
      if (messages.length > existing.length) throw WrongExpectedVersionException(streamId, ExpectedVersion.NoStream)
      if (messages.indices.exists(i => existing(i)._2 != messages(i).messageId))
        throw WrongExpectedVersionException(streamId, ExpectedVersion.NoStream)
      AppendResult(head.version, head.position) // full-prefix replay: idempotent no-op
    } else appendEvents(streamId, head, messages)
  }

  /** Ref: InMemoryStream.AppendToStreamExpectedVersionAny (:105-137). */
  private def appendAny(streamId: String, head: Head, messages: Seq[NewStreamMessage]): AppendResult = {
    if (messages.nonEmpty && head.version >= 0) {
      val existing = existingIds(streamId)
      val byId = existing.iterator.zipWithIndex.map { case ((_, id), idx) => id -> idx }.toMap
      byId.get(messages.head.messageId) match {
        case Some(i) =>
          if (i + messages.length > existing.length) throw WrongExpectedVersionException(streamId, ExpectedVersion.Any)
          var n = 1
          while (n < messages.length) {
            if (messages(n).messageId != existing(i + n)._2)
              throw WrongExpectedVersionException(streamId, ExpectedVersion.Any)
            n += 1
          }
          return AppendResult(head.version, head.position) // exact-suffix replay
        case None =>
          // SQL backends raise WrongExpectedVersion on partial overlap
          // (EnforceIdempotentAppend.sql:12-39)
          if (messages.exists(m => byId.contains(m.messageId)))
            throw WrongExpectedVersionException(streamId, ExpectedVersion.Any)
      }
    }
    appendEvents(streamId, head, messages)
  }

  /** Ref: InMemoryStream.AppendToStreamExpectedVersion (:56-103), also the
    * EmptyStream (-1) case. */
  private def appendExpectedVersion(
      streamId: String, head: Head, expectedVersion: Int, messages: Seq[NewStreamMessage]): AppendResult = {
    if (expectedVersion > head.version) throw WrongExpectedVersionException(streamId, expectedVersion)
    if (head.version >= 0 && expectedVersion < head.version) {
      // Idempotency: incoming batch must replay at exactly versions
      // expectedVersion+1 .. expectedVersion+len
      val existing = existingIds(streamId)
      val byVersion = existing.toMap
      messages.indices.foreach { i =>
        val v = expectedVersion + i + 1
        byVersion.get(v) match {
          case Some(id) if id == messages(i).messageId => ()
          case _ => throw WrongExpectedVersionException(streamId, expectedVersion)
        }
      }
      AppendResult(head.version, head.position)
    } else {
      // expectedVersion == currentVersion: plain append, but any reused id => throw
      if (head.version >= 0 && messages.nonEmpty) {
        val ids = existingIds(streamId).map(_._2).toSet
        if (messages.exists(m => ids.contains(m.messageId)))
          throw WrongExpectedVersionException(streamId, expectedVersion)
      }
      appendEvents(streamId, head, messages)
    }
  }

  /** Physical append: assign dense versions/positions, one parquet file per
    * batch sorted by position (ref versions: AppendToStream.sql:109-111;
    * dense global positions replace the RDBMS sequence — no gaps by
    * construction, so the reference's gap-heal (ReadonlyStreamStoreBase
    * .cs:65-92) is unnecessary). */
  private def appendEvents(streamId: String, head: Head, messages: Seq[NewStreamMessage]): AppendResult = {
    if (messages.nonEmpty) {
      val now = Timestamp.from(clock.nowUtc)
      val rows = messages.zipWithIndex.map { case (m, i) =>
        Row(streamId, m.messageId, head.version + 1 + i, nextPosition + i, now, m.`type`, m.jsonData, m.jsonMetadata)
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), MessageSchema)
      df.write.mode("append").parquet(messagesDir)
      head.version += messages.length
      head.position = nextPosition + messages.length - 1
      nextPosition += messages.length
      if (streamId.startsWith("$$")) applyMetadataToTarget(streamId.drop(2))
      head.maxCount.foreach(mc => scavenge(streamId, head, mc))
    }
    AppendResult(head.version, head.position)
  }

  /** MaxCount retention: keep the newest `maxCount` messages by version
    * (ref: Scavenge.sql:23-30, triggered post-append
    * PostgresStreamStore.Append.cs:69-77). */
  private def scavenge(streamId: String, head: Head, maxCount: Int): Unit = {
    val cutoff = head.version - maxCount // keep versions > cutoff
    if (cutoff >= 0) {
      val job: Runnable = () =>
        rewriteLog(not(col("streamId") === streamId && col("streamVersion") <= cutoff))
      if (scavengeSynchronously) job.run() else purgeExecutor.submit(job)
    }
  }

  /** In-order (version, messageId) pairs currently stored for a stream —
    * backs the idempotency replay checks. */
  private def existingIds(streamId: String): IndexedSeq[(Int, String)] =
    messagesDF
      .filter(col("streamId") === streamId)
      .select("streamVersion", "messageId")
      .orderBy("streamVersion")
      .collect()
      .map(r => (r.getInt(0), r.getString(1)))
      .toIndexedSeq

  // ------------------------------------------------------------------
  // Reads (ref: ReadAll.sql, Read.sql, ReadonlyStreamStoreBase.cs)
  // ------------------------------------------------------------------

  private def messagesDF: DataFrame =
    if (fs.exists(new HPath(messagesDir))) spark.read.schema(MessageSchema).parquet(messagesDir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], MessageSchema)

  /** The all-stream as a DataFrame — the Spark-native query surface. */
  def allMessages: DataFrame = messagesDF

  /** The all-stream as a Structured Streaming source (file source over the
    * append-only log); new appends become new micro-batches. */
  def allMessagesStream: DataFrame =
    spark.readStream.schema(MessageSchema).parquet(messagesDir)

  private def toMessages(rows: Array[Row], prefetch: Boolean): Seq[StreamMessage] =
    rows.iterator.map { r =>
      StreamMessage(
        streamId = r.getString(0), messageId = r.getString(1),
        streamVersion = r.getInt(2), position = r.getLong(3),
        createdUtc = r.getTimestamp(4), `type` = r.getString(5),
        jsonData = if (prefetch) r.getString(6) else null,
        jsonMetadata = r.getString(7))
    }.toSeq

  /** TTL filter, applied post-read on the driver exactly like the reference
    * (`ReadonlyStreamStoreBase.cs:394-490`): expired messages are dropped
    * from the page and queued for background purge; `$` streams exempt. */
  private def filterExpired(msgs: Seq[StreamMessage]): Seq[StreamMessage] = {
    val now = clock.nowUtc
    val (keep, expired) = msgs.partition { m =>
      if (StreamId.isSystem(m.streamId)) true
      else heads.get(m.streamId).flatMap(_.maxAge) match {
        case Some(maxAge) => m.createdUtc.toInstant.plusSeconds(maxAge.toLong).isAfter(now)
        case None => true
      }
    }
    if (expired.nonEmpty) purgeExecutor.submit(new Runnable {
      def run(): Unit = expired.foreach(m =>
        try deleteMessage(m.streamId, m.messageId) catch { case _: Throwable => () })
    })
    keep
  }

  override def readAllForwards(from: Long, maxCount: Int, prefetch: Boolean): ReadAllPage = synchronized {
    require(maxCount > 0)
    val fromPos = if (from == Position.End) Long.MaxValue else from
    val rows = messagesDF
      .filter(col("position") >= fromPos)
      .orderBy(col("position"))
      .limit(maxCount + 1)
      .collect()
    val isEnd = rows.length <= maxCount
    val page = toMessages(rows.take(maxCount), prefetch)
    val nextPos =
      if (!isEnd) rows(maxCount).getLong(3)
      else if (page.nonEmpty) page.last.position + 1
      else fromPos
    val kept = filterExpired(page)
    ReadAllPage(from, nextPos, isEnd, ReadDirection.Forward, kept,
      () => readAllForwards(nextPos, maxCount, prefetch))
  }

  override def readAllBackwards(from: Long, maxCount: Int, prefetch: Boolean): ReadAllPage = synchronized {
    require(maxCount > 0)
    // End sentinel => start from the largest position (ref:
    // PostgresStreamStore.ReadAll.cs:94 uses long.MaxValue)
    val fromPos = if (from == Position.End) Long.MaxValue else from
    val rows = messagesDF
      .filter(col("position") <= fromPos)
      .orderBy(col("position").desc)
      .limit(maxCount + 1)
      .collect()
    val isEnd = rows.length <= maxCount
    val page = toMessages(rows.take(maxCount), prefetch)
    val nextPos =
      if (!isEnd) rows(maxCount).getLong(3)
      else Position.Start // exhausted (ref: ReadAll.cs:109-119)
    val kept = filterExpired(page)
    ReadAllPage(from, nextPos, isEnd, ReadDirection.Backward, kept,
      () => readAllBackwards(nextPos, maxCount, prefetch))
  }

  override def readStreamForwards(streamId: String, fromVersion: Int, maxCount: Int, prefetch: Boolean): ReadStreamPage = synchronized {
    require(maxCount > 0)
    heads.get(streamId) match {
      case None =>
        ReadStreamPage(streamId, PageReadStatus.StreamNotFound, fromVersion, StreamVersion.End,
          StreamVersion.End, Position.End, ReadDirection.Forward, isEnd = true, Nil,
          () => readStreamForwards(streamId, fromVersion, maxCount, prefetch))
      case Some(head) =>
        val fromV = math.max(fromVersion, 0)
        val rows = messagesDF
          .filter(col("streamId") === streamId && col("streamVersion") >= fromV)
          .orderBy(col("streamVersion"))
          .limit(maxCount + 1)
          .collect()
        val isEnd = rows.length <= maxCount
        val page = toMessages(rows.take(maxCount), prefetch)
        val nextV =
          if (!isEnd) rows(maxCount).getInt(2)
          else head.version + 1
        val kept = filterExpired(page)
        ReadStreamPage(streamId, PageReadStatus.Success, fromVersion, nextV, head.version,
          head.position, ReadDirection.Forward, isEnd, kept,
          () => readStreamForwards(streamId, nextV, maxCount, prefetch))
    }
  }

  override def readStreamBackwards(streamId: String, fromVersion: Int, maxCount: Int, prefetch: Boolean): ReadStreamPage = synchronized {
    require(maxCount > 0)
    heads.get(streamId) match {
      case None =>
        ReadStreamPage(streamId, PageReadStatus.StreamNotFound, fromVersion, StreamVersion.End,
          StreamVersion.End, Position.End, ReadDirection.Backward, isEnd = true, Nil,
          () => readStreamBackwards(streamId, fromVersion, maxCount, prefetch))
      case Some(head) =>
        val fromV = if (fromVersion == StreamVersion.End) Int.MaxValue else fromVersion
        val rows = messagesDF
          .filter(col("streamId") === streamId && col("streamVersion") <= fromV)
          .orderBy(col("streamVersion").desc)
          .limit(maxCount + 1)
          .collect()
        val isEnd = rows.length <= maxCount
        val page = toMessages(rows.take(maxCount), prefetch)
        val nextV =
          if (!isEnd) rows(maxCount).getInt(2)
          else StreamVersion.End
        val kept = filterExpired(page)
        ReadStreamPage(streamId, PageReadStatus.Success, fromVersion, nextV, head.version,
          head.position, ReadDirection.Backward, isEnd, kept,
          () => readStreamBackwards(streamId, nextV, maxCount, prefetch))
    }
  }

  override def readHeadPosition(): Long = synchronized { nextPosition - 1 }

  override def readStreamHeadPosition(streamId: String): Long =
    synchronized { heads.get(streamId).map(_.position).getOrElse(Position.End) }

  override def readStreamHeadVersion(streamId: String): Int =
    synchronized { heads.get(streamId).map(_.version).getOrElse(StreamVersion.End) }

  override def readMessageData(streamId: String, streamVersion: Int): Option[String] = synchronized {
    messagesDF
      .filter(col("streamId") === streamId && col("streamVersion") === streamVersion)
      .select("jsonData")
      .collect()
      .headOption
      .map(_.getString(0))
  }

  // ------------------------------------------------------------------
  // Deletes (ref: DeleteStream.sql:1-74, DeleteStreamMessages.sql:1-47)
  // ------------------------------------------------------------------

  override def deleteStream(streamId: String, expectedVersion: Int): Unit = synchronized {
    require(!StreamId.isSystem(streamId), s"stream id must not start with '$$': $streamId")
    deleteStreamInternal(streamId, expectedVersion)
  }

  private def deleteStreamInternal(streamId: String, expectedVersion: Int): Unit = {
    val head = heads.get(streamId)
    expectedVersion match {
      case ExpectedVersion.Any => ()
      case v =>
        val h = head.getOrElse(throw WrongExpectedVersionException(streamId, v))
        if (v >= 0 && h.version != v) throw WrongExpectedVersionException(streamId, v)
    }
    if (head.isEmpty) return // no-op, no tombstone (ref: DeleteStream.sql returns early)
    val metaId = MetadataStream.of(streamId)
    rewriteLog(not(col("streamId").isin(streamId, metaId)))
    heads.remove(streamId)
    heads.remove(metaId)
    if (trackDeletes) {
      val tomb = NewStreamMessage(
        UUID.randomUUID().toString, Deleted.StreamDeletedMessageType,
        s"""{"StreamId":${Json.quote(streamId)}}""")
      appendInternal(Deleted.DeletedStreamId, ExpectedVersion.Any, Seq(tomb))
    }
  }

  override def deleteMessage(streamId: String, messageId: String): Unit = synchronized {
    val exists = messagesDF
      .filter(col("streamId") === streamId && col("messageId") === messageId)
      .limit(1).count() > 0
    if (!exists) return // no-op (ref: DeleteStreamMessages.sql deletes 0 rows)
    rewriteLog(not(col("streamId") === streamId && col("messageId") === messageId))
    if (trackDeletes && !StreamId.isSystem(streamId)) {
      val tomb = NewStreamMessage(
        UUID.randomUUID().toString, Deleted.MessageDeletedMessageType,
        s"""{"StreamId":${Json.quote(streamId)},"MessageId":${Json.quote(messageId)}}""")
      appendInternal(Deleted.DeletedStreamId, ExpectedVersion.Any, Seq(tomb))
    }
  }

  /** Rewrite-and-swap of the log keeping rows matching `keep`. At 100 TB
    * this becomes tombstone-file + compaction; rewrite is correct and
    * simple at library scale, and deletes are rare (the reference rewrites
    * via DELETE inside the RDBMS just the same). Preserves dense positions
    * of surviving rows (positions are never reassigned, as in the ref). */
  private def rewriteLog(keep: org.apache.spark.sql.Column): Unit = {
    if (!fs.exists(new HPath(messagesDir))) return
    val tmp = new HPath(messagesDir + ".tmp")
    val dst = new HPath(messagesDir)
    messagesDF.filter(keep)
      .sortWithinPartitions("position")
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  /** Size-tiered compaction of the append log: many per-batch files → a few
    * position-sorted files. Run out-of-band; never concurrently with
    * scavenge (both are serialized through this store's lock). */
  def compact(targetFiles: Int = spark.sparkContext.defaultParallelism): Unit = synchronized {
    if (!fs.exists(new HPath(messagesDir))) return
    val tmp = new HPath(messagesDir + ".tmp")
    val dst = new HPath(messagesDir)
    messagesDF.repartitionByRange(targetFiles, col("position"))
      .sortWithinPartitions("position")
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  // ------------------------------------------------------------------
  // Metadata (ref: PostgresStreamStore.Metadata.cs:25-52, SetStreamMetadata.sql)
  // ------------------------------------------------------------------

  override def getStreamMetadata(streamId: String): StreamMetadataResult = synchronized {
    latestMetadataMessage(streamId) match {
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
    appendInternal(MetadataStream.of(streamId), expectedStreamMetadataVersion, Seq(msg))
    // applyMetadataToTarget ran inside appendEvents; scavenge the target if
    // maxCount shrank (ref: CheckStreamMaxCount after SetStreamMetadata)
    heads.get(streamId).foreach(h => h.maxCount.foreach(mc => scavenge(streamId, h, mc)))
  }

  /** Propagate the latest `$$s` metadata to stream `s`'s head retention
    * settings (ref: SetStreamMetadata.sql:20-37 updates streams.max_age/count). */
  private def applyMetadataToTarget(targetStreamId: String): Unit =
    latestMetadata(targetStreamId).foreach { m =>
      heads.get(targetStreamId).foreach { h =>
        h.maxAge = m.maxAge
        h.maxCount = m.maxCount
      }
    }

  private def latestMetadata(streamId: String): Option[MetadataMessage] =
    latestMetadataMessage(streamId).map { case (_, json) => MetadataJson.read(json) }

  private def latestMetadataMessage(streamId: String): Option[(Int, String)] = {
    val metaId = MetadataStream.of(streamId)
    if (!heads.contains(metaId)) None
    else messagesDF
      .filter(col("streamId") === metaId)
      .orderBy(col("streamVersion").desc)
      .limit(1)
      .select("streamVersion", "jsonData")
      .collect()
      .headOption
      .map(r => (r.getInt(0), r.getString(1)))
  }

  // ------------------------------------------------------------------
  // ListStreams (ref: ListStreams.sql, Pattern.cs:7-37)
  // ------------------------------------------------------------------

  override def listStreams(pattern: Pattern, maxCount: Int, continuationToken: Option[String]): ListStreamsPage = synchronized {
    val afterId = continuationToken.map(_.toLong).getOrElse(-1L)
    val matching = heads.iterator
      .filter { case (id, h) =>
        h.idInternal > afterId && (pattern match {
          case Pattern.Anything => true
          case Pattern.StartsWith(p) => id.startsWith(p)
          case Pattern.EndsWith(p) => id.endsWith(p)
        })
      }
      .toSeq.sortBy(_._2.idInternal)
      .take(maxCount)
    val token = matching.lastOption.map(_._2.idInternal).getOrElse(afterId).toString
    ListStreamsPage(matching.map(_._1), token,
      () => listStreams(pattern, maxCount, Some(token)))
  }

  // ------------------------------------------------------------------
  // Recovery: rebuild driver state from the log (replaces RDBMS durability)
  // ------------------------------------------------------------------

  private def recover(): Unit = {
    if (!fs.exists(new HPath(messagesDir))) return
    val agg = messagesDF
      .groupBy("streamId")
      .agg(max("streamVersion").as("v"), max("position").as("p"), min("position").as("first"))
      .orderBy("first")
      .collect()
    agg.foreach { r =>
      heads.put(r.getString(0), Head(nextIdInternal, r.getInt(1), r.getLong(2), None, None))
      nextIdInternal += 1
      nextPosition = math.max(nextPosition, r.getLong(2) + 1)
    }
    // retention settings from latest metadata message of each $$ stream
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("streamId").orderBy(col("streamVersion").desc)
    messagesDF
      .filter(col("streamId").startsWith("$$"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("streamId", "jsonData")
      .collect()
      .foreach { r =>
        val target = r.getString(0).drop(2)
        val m = MetadataJson.read(r.getString(1))
        heads.get(target).foreach { h => h.maxAge = m.maxAge; h.maxCount = m.maxCount }
      }
  }

  override def close(): Unit = purgeExecutor.shutdown()
}

object SparkStreamStore {
  /** Stable physical schema of the messages log (FIXTURES.md §A.1). */
  val MessageSchema: StructType = StructType(Seq(
    StructField("streamId", StringType, nullable = false),
    StructField("messageId", StringType, nullable = false),
    StructField("streamVersion", IntegerType, nullable = false),
    StructField("position", LongType, nullable = false),
    StructField("createdUtc", TimestampType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("jsonData", StringType, nullable = true),
    StructField("jsonMetadata", StringType, nullable = true)))
}
