package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.util.{Map => JMap, OptionalLong}
import scala.jdk.CollectionConverters._

/** Batch DataSource V2 over a [[graft.store.SparkStreamStore]] segment log
  * — the store's PHYSICAL message log (the append-only firehose, same
  * surface as `allMessagesStream`) as a first-class Spark batch table with
  * the pushdowns a 100 TB log needs:
  *
  *   - '''planning-time segment pruning''': every segment is position-
  *     sorted (flushed group-commit windows are written at
  *     `part-<startPosition>-*`, `SparkStreamStore.scala:432`; compacted
  *     generations are `repartitionByRange(position)`,
  *     `SparkStreamStore.scala:849-851`), so one footer-stats read per
  *     file at plan time yields an exact `[minPos, maxPos]` zone map and
  *     position-range predicates drop whole segments before any task is
  *     scheduled. A tail read of a year-long log plans O(tail) partitions,
  *     not O(log) — the DSv2 twin of the keyset page reads (SURVEY §2.1
  *     #1-4, ref `ReadAll.sql:35-40`).
  *   - '''column pruning''' pushed into the parquet record reader
  *     (`jsonData` payloads never leave the file for metadata-only scans —
  *     the DSv2 twin of `prefetchJsonData=false`, SURVEY §2.1 #5, ref
  *     `Read.sql:36-38`).
  *   - '''limit pushdown''': each reader stops after `limit` rows, so
  *     `LIMIT n` probes touch at most one row group per planned segment.
  *   - '''statistics''' (bytes + exact row count from the same footers)
  *     so Catalyst can size joins against the log correctly.
  *
  * Position filters are used for pruning but re-evaluated by Spark after
  * the scan (they are reported as unhandled residuals): row-level filtering
  * stays in codegen while file skipping happens here — the same contract
  * parquet zone maps give the built-in reader, lifted to whole segments.
  *
  * Deletes are logical in this store (tombstones applied by `allMessages`
  * / the read API); like `allMessagesStream`, this table exposes the
  * append-only physical log. Join `store.streamsDF` / apply tombstones for
  * the delete-aware view.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.LogSegmentSource")
  *   .option("path", storeRootDir)       // the store's root directory
  *   .load()
  *   .filter($"position" >= tailStart)   // prunes segments at plan time
  *   .select("streamId", "position")     // never decodes jsonData
  * }}}
  */
class LogSegmentSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.store.SparkStreamStore.MessageSchema
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new LogSegmentTable(properties.asScala.toMap)
}

object LogSegmentSource {
  val Schema: StructType = graft.store.SparkStreamStore.MessageSchema

  /** Resolve the live messages generation exactly as the store does
    * (`SparkStreamStore.loadGeneration`): `CURRENT` names it, else the
    * plain `messages/` dir. */
  private[sources] def resolveMessagesDir(fs: FileSystem, root: String): String = {
    val cur = new HPath(root + "/CURRENT")
    val gen: Long =
      if (!fs.exists(cur)) 0L
      else {
        val in = fs.open(cur)
        val text =
          try {
            val bytes = new Array[Byte](fs.getFileStatus(cur).getLen.toInt)
            in.readFully(0, bytes)
            new String(bytes, StandardCharsets.UTF_8).trim
          } finally in.close()
        text.toLongOption.getOrElse(0L)
      }
    if (gen == 0L) root + "/messages" else root + s"/messages-g$gen"
  }

  /** One log segment with its footer-derived zone map. */
  private[sources] final case class Segment(
      path: String, bytes: Long, rows: Long, minPos: Long, maxPos: Long)

  /** List segments and read each footer ONCE for exact position min/max +
    * row count. Driver-side metadata pass, one footer IO per segment —
    * what the store's own `spark.read.parquet` surface pays anyway, but
    * here the stats feed planning-time pruning instead of post-schedule
    * row-group skipping. */
  private[sources] def listSegments(conf: Configuration, dir: String): Seq[Segment] = {
    val fs = new HPath(dir).getFileSystem(conf)
    if (!fs.exists(new HPath(dir))) return Seq.empty
    fs.listStatus(new HPath(dir)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map { st =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        try {
          val footer = reader.getFooter
          var rows = 0L
          var minPos = Long.MaxValue
          var maxPos = Long.MinValue
          val posIdx = footer.getFileMetaData.getSchema.getFieldIndex("position")
          footer.getBlocks.asScala.foreach { block =>
            rows += block.getRowCount
            val stats: org.apache.parquet.column.statistics.Statistics[_] =
              block.getColumns.get(posIdx).getStatistics
            if (stats != null && stats.hasNonNullValue) {
              minPos = math.min(minPos, stats.genericGetMin.asInstanceOf[java.lang.Long])
              maxPos = math.max(maxPos, stats.genericGetMax.asInstanceOf[java.lang.Long])
            }
          }
          // a segment with no stats (shouldn't happen: position is required)
          // gets an infinite range so it is never wrongly pruned
          if (minPos > maxPos) { minPos = Long.MinValue; maxPos = Long.MaxValue }
          Segment(st.getPath.toString, st.getLen, rows, minPos, maxPos)
        } finally reader.close()
      }
  }

  /** The inclusive position interval implied by the pushable filters. */
  private[sources] def positionBounds(filters: Seq[Filter]): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    filters.foreach {
      case EqualTo("position", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan("position", v: Long)        => if (v < Long.MaxValue) lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("position", v: Long) => lo = math.max(lo, v)
      case LessThan("position", v: Long)           => if (v > Long.MinValue) hi = math.min(hi, v - 1)
      case LessThanOrEqual("position", v: Long)    => hi = math.min(hi, v)
      case _                                       => ()
    }
    (lo, hi)
  }

  private[sources] def isPositionRangeFilter(f: Filter): Boolean = f match {
    case EqualTo("position", _: Long) | GreaterThan("position", _: Long) |
        GreaterThanOrEqual("position", _: Long) | LessThan("position", _: Long) |
        LessThanOrEqual("position", _: Long) => true
    case _ => false
  }

  /** The output schema of an aggregation answerable from footer stats
    * alone: ungrouped max/min(position) and count(*), in any mix. None
    * when any aggregate (or a grouping) needs real rows. */
  private[sources] def footerAggSchema(agg: Aggregation): Option[StructType] = {
    if (agg.groupByExpressions.nonEmpty) return None
    def isPosition(e: org.apache.spark.sql.connector.expressions.Expression): Boolean = e match {
      case n: NamedReference => n.fieldNames.sameElements(Array("position"))
      case _ => false
    }
    val fields = agg.aggregateExpressions.map {
      case m: Max if isPosition(m.column) => StructField("max(position)", LongType)
      case m: Min if isPosition(m.column) => StructField("min(position)", LongType)
      case _: CountStar => StructField("count(*)", LongType, nullable = false)
      case _ => return None
    }
    Some(StructType(fields.toIndexedSeq))
  }

  /** Parquet projection for the pruned columns, built from the FILE's own
    * schema so field repetition matches exactly (the store's direct
    * writer marks required fields `required`; Spark-written compacted
    * generations may mark the same fields `optional` — parquet's
    * projection check demands the requested repetition agree). */
  private[sources] def parquetProjection(
      fileSchema: org.apache.parquet.schema.MessageType,
      columns: Array[String]): org.apache.parquet.schema.MessageType =
    new org.apache.parquet.schema.MessageType(
      fileSchema.getName,
      columns.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
}

private class LogSegmentTable(props: Map[String, String]) extends Table with SupportsRead {
  private val root = props.getOrElse("path",
    throw new IllegalArgumentException("graft.sources.LogSegmentSource requires option 'path' (store root)"))

  override def name(): String = s"graft-log($root)"
  override def schema(): StructType = LogSegmentSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LogSegmentScanBuilder(root)
}

private class LogSegmentScanBuilder(root: String)
  extends ScanBuilder
  with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit
  with SupportsPushDownAggregates {

  private var required: StructType = LogSegmentSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var aggSchema: Option[StructType] = None

  // one metadata pass per query planning, shared with the scan
  private lazy val allSegments: Seq[LogSegmentSource.Segment] = {
    val conf = new Configuration()
    val fs = new HPath(root).getFileSystem(conf)
    LogSegmentSource.listSegments(conf, LogSegmentSource.resolveMessagesDir(fs, root))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(LogSegmentSource.isPositionRangeFilter)
    // every filter (including the pushed range ones) stays a residual:
    // pruning here is file-granular; row-level evaluation remains in
    // Spark's codegen — the zone-map contract
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = l; false } // partial: per-reader cap only

  /** max/min(position) and count(*) answered ENTIRELY from the segment
    * footers already read for the zone map — the head-of-log probe
    * (`ReadHeadPosition`, SURVEY §2.4 #22, ref `ReadHeadPosition.sql`)
    * becomes a metadata-only plan: no task ever opens a row group.
    * Complete pushdown only, ungrouped only, and only when every
    * segment carried real position stats; Spark offers aggregates here
    * only when no residual filters exist, which matches: the footer
    * totals describe the whole (physical) log. */
  private def canPushAgg(agg: Aggregation): Boolean =
    LogSegmentSource.footerAggSchema(agg).isDefined && pushed.isEmpty &&
      allSegments.forall(_.minPos != Long.MinValue) // every footer had real stats

  override def supportCompletePushDown(agg: Aggregation): Boolean = canPushAgg(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canPushAgg(agg)) return false
    aggSchema = LogSegmentSource.footerAggSchema(agg)
    true
  }

  override def build(): Scan =
    new LogSegmentScan(root, allSegments, required, pushed, limit, aggSchema)
}

private class LogSegmentScan(
    root: String,
    allSegments: Seq[LogSegmentSource.Segment],
    required: StructType,
    pushed: Array[Filter],
    limit: Int,
    aggSchema: Option[StructType])
  extends Scan with Batch with SupportsReportStatistics {

  private lazy val segments: Seq[LogSegmentSource.Segment] = {
    val (lo, hi) = LogSegmentSource.positionBounds(pushed.toSeq)
    allSegments.filter(s => s.maxPos >= lo && s.minPos <= hi)
  }

  override def readSchema(): StructType = aggSchema.getOrElse(required)
  override def toBatch: Batch = this

  override def description(): String = {
    val cols = readSchema().fieldNames.mkString(",")
    val fs = pushed.map(_.toString).mkString(", ")
    s"graft-log root=$root ReadSchema=[$cols] PushedFilters=[$fs]" +
      (if (limit >= 0) s" PushedLimit=$limit" else "") +
      (if (aggSchema.isDefined) " PushedAggregates=footer-stats" else "")
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(segments.map(_.bytes).sum)
    override def numRows(): OptionalLong = OptionalLong.of(segments.map(_.rows).sum)
  }

  override def planInputPartitions(): Array[InputPartition] = aggSchema match {
    case Some(s) =>
      // one synthetic partition carrying the footer-derived answer
      // (canPushAgg already refused degenerate-stats segments); an empty
      // log yields one (null, null, 0) row — Spark's ungrouped-
      // aggregate-on-empty semantics
      val rows = segments.map(_.rows).sum
      val minPos: java.lang.Long =
        if (segments.isEmpty) null else java.lang.Long.valueOf(segments.map(_.minPos).min)
      val maxPos: java.lang.Long =
        if (segments.isEmpty) null else java.lang.Long.valueOf(segments.map(_.maxPos).max)
      Array(LogFooterAggPartition(s.fieldNames, minPos, maxPos, rows))
    case None =>
      segments.map(s => LogSegmentPartition(s.path, required.fieldNames, limit): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new LogSegmentReaderFactory
}

private case class LogSegmentPartition(path: String, columns: Array[String], limit: Int)
  extends InputPartition

/** The footer-derived answer to a fully-pushed aggregation: one row,
  * no file opened at execution time. */
private case class LogFooterAggPartition(
    fields: Array[String], minPos: java.lang.Long, maxPos: java.lang.Long, rows: Long)
  extends InputPartition

private class LogSegmentReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = partition match {
    case a: LogFooterAggPartition => new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(
        a.fields.toIndexedSeq.map {
          case "max(position)" => if (a.maxPos == null) null else a.maxPos.longValue()
          case "min(position)" => if (a.minPos == null) null else a.minPos.longValue()
          case "count(*)"      => a.rows
        })
      override def close(): Unit = ()
    }
    case p: LogSegmentPartition => createRowReader(p)
  }

  private def createRowReader(p: LogSegmentPartition): PartitionReader[InternalRow] = {
    val conf = new Configuration()
    val fileSchema = {
      val fr = ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(p.path), conf))
      try fr.getFooter.getFileMetaData.getSchema finally fr.close()
    }
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      LogSegmentSource.parquetProjection(fileSchema, p.columns).toString)
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new GroupReadSupport(), new HPath(p.path))
      .withConf(conf)
      .build()

    // generations Spark compacted under its default INT96 timestamp
    // encoding (before the store pinned TIMESTAMP_MICROS) carry
    // createdUtc as a 12-byte julian-day binary — detect once per file
    val createdIsInt96 = p.columns.contains("createdUtc") &&
      fileSchema.containsField("createdUtc") &&
      fileSchema.getType(fileSchema.getFieldIndex("createdUtc")).asPrimitiveType()
        .getPrimitiveTypeName ==
        org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96

    def int96Micros(g: Group, name: String): Long = {
      val bytes = g.getInt96(name, 0).getBytes // little-endian: 8B nanos-of-day, 4B julian day
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val nanosOfDay = buf.getLong
      val julianDay = buf.getInt
      (julianDay - 2440588L) * 86400L * 1000000L + nanosOfDay / 1000L
    }

    new PartitionReader[InternalRow] {
      private var current: Group = _
      private var emitted = 0L

      override def next(): Boolean = {
        if (p.limit >= 0 && emitted >= p.limit) return false
        current = reader.read()
        if (current != null) emitted += 1
        current != null
      }

      override def get(): InternalRow = {
        val values = new Array[Any](p.columns.length)
        var i = 0
        while (i < p.columns.length) {
          val name = p.columns(i)
          values(i) =
            if (current.getFieldRepetitionCount(name) == 0) null
            else name match {
              case "streamVersion" => current.getInteger(name, 0)
              case "createdUtc" if createdIsInt96 => int96Micros(current, name)
              case "position" | "createdUtc" => current.getLong(name, 0)
              case _ => UTF8String.fromString(current.getString(name, 0))
            }
          i += 1
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }

      override def close(): Unit = reader.close()
    }
  }
}
