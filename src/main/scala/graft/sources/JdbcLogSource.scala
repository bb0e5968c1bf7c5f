package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.sql.DriverManager
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** Structured Streaming SOURCE over the JDBC-backed stream-store log —
  * the "Structured Streaming over JDBC source" the project brief names
  * (BASELINE.json north star). The reference has no streaming surface at
  * all beyond polling subscriptions; this is the Spark-native upgrade:
  * the relational log becomes a first-class micro-batch stream.
  *
  * DataSource V2 micro-batch source: offsets are log positions (the
  * store-wide dense sequence), `latestOffset` polls `MAX(position)` with
  * one driver-side query per trigger (the same polling model as the
  * reference's `PollingStreamStoreNotifier.cs:51-82`), and each batch's
  * position range `(start, end]` is split into range partitions that
  * executors read in parallel straight from the database — so catch-up
  * over a large backlog scales with the cluster, and the steady-state
  * tail is one small indexed range scan per trigger.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft.sources.JdbcLogSource")
  *   .option("url", "jdbc:derby:/path/db")       // any JDBC database
  *   .option("numPartitions", "8")                // ranges per batch
  *   .option("fromPosition", "-1")                // exclusive start
  *   .load()
  * }}}
  *
  * The matching SINK is deliberately application-level `foreachBatch` →
  * `JdbcStreamStore.appendToStream` (the brief: "core append … logic is
  * application-level" — a blind row sink cannot run the expected-version
  * protocol). Exactly-once for the source comes from deterministic
  * position ranges: replaying a committed batch re-reads the same rows.
  *
  * Embedded Derby is single-JVM (works on local[*]); against a server-
  * mode database (Postgres etc.) executors connect independently. */
class JdbcLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = JdbcLogSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new JdbcLogTable(properties.asScala.toMap)
}

object JdbcLogSource {
  /** Same logical schema as the stores' `allMessages` surfaces. */
  val Schema: StructType = StructType(Seq(
    StructField("streamId", StringType),
    StructField("messageId", StringType),
    StructField("streamVersion", IntegerType),
    StructField("position", LongType),
    StructField("createdUtc", TimestampType),
    StructField("type", StringType),
    StructField("jsonData", StringType),
    StructField("jsonMetadata", StringType)))

  private[sources] val RowsSql =
    """SELECT s.id_original, m.message_id, m.stream_version, m.position, m.created_micros,
      |  m.msg_type, m.json_data, m.json_metadata
      |FROM graft_messages m JOIN graft_streams s ON s.id_internal = m.stream_id_internal
      |WHERE m.position > ? AND m.position <= ? ORDER BY m.position""".stripMargin

  private[sources] def maxPosition(url: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery("SELECT MAX(position) FROM graft_messages")
        try { rs.next(); val v = rs.getLong(1); if (rs.wasNull()) -1L else v }
        finally rs.close()
      } finally st.close()
    } finally conn.close()
  }
}

private class JdbcLogTable(props: Map[String, String]) extends Table with SupportsRead {
  private val url = props.getOrElse("url",
    throw new IllegalArgumentException("graft.sources.JdbcLogSource requires option 'url'"))

  override def name(): String = s"graft-jdbc-log(${url.takeWhile(_ != ';')})"
  override def schema(): StructType = JdbcLogSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = JdbcLogSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new JdbcLogMicroBatchStream(
            url,
            numPartitions = props.getOrElse("numPartitions", "4").toInt,
            fromPosition = props.getOrElse("fromPosition", "-1").toLong)
      }
    }
}

/** Offset = highest position included so far (exclusive start of the
  * next batch). Dense single-writer positions make ranges replayable. */
private case class JdbcLogOffset(position: Long) extends Offset {
  override def json(): String = position.toString
}

private class JdbcLogMicroBatchStream(url: String, numPartitions: Int, fromPosition: Long)
  extends MicroBatchStream {

  override def initialOffset(): Offset = JdbcLogOffset(fromPosition)

  override def latestOffset(): Offset =
    JdbcLogOffset(math.max(fromPosition, JdbcLogSource.maxPosition(url)))

  override def deserializeOffset(json: String): Offset = JdbcLogOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[JdbcLogOffset].position
    val hi = end.asInstanceOf[JdbcLogOffset].position
    val n = hi - lo
    if (n <= 0) return Array.empty
    val parts = math.min(numPartitions.toLong, n).toInt
    val step = math.ceil(n.toDouble / parts).toLong
    (0 until parts).iterator
      .map(i => JdbcLogPartition(url, lo + i * step, math.min(lo + (i + 1) * step, hi)))
      .filter(p => p.hi > p.lo)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = new JdbcLogReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class JdbcLogPartition(url: String, lo: Long, hi: Long) extends InputPartition

private class JdbcLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[JdbcLogPartition]
    new PartitionReader[InternalRow] {
      private val conn = DriverManager.getConnection(p.url)
      private val ps = {
        val s = conn.prepareStatement(JdbcLogSource.RowsSql)
        s.setLong(1, p.lo); s.setLong(2, p.hi)
        s
      }
      private val rs = ps.executeQuery()

      override def next(): Boolean = rs.next()

      override def get(): InternalRow = {
        def str(i: Int): UTF8String = {
          val v = rs.getString(i)
          if (v == null) null else UTF8String.fromString(v)
        }
        InternalRow(
          str(1), str(2),
          rs.getInt(3), rs.getLong(4),
          rs.getLong(5), // TimestampType internal representation is micros
          str(6), str(7), str(8))
      }

      override def close(): Unit = {
        try rs.close() finally { try ps.close() finally conn.close() }
      }
    }
  }
}
