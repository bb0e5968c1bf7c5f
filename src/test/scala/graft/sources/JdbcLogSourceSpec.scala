package graft.sources

import graft.SparkTestSession
import graft.core._
import graft.store.JdbcStreamStore
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming over the JDBC log: the DSv2 micro-batch source
  * (positions as offsets, range-partitioned batch reads) and the
  * application-level foreachBatch append sink — together, the brief's
  * "Structured Streaming over JDBC source/sink". */
class JdbcLogSourceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def mid(n: Int): String = f"00000000-0000-0000-0000-$n%012d"
  private def msgs(ns: Int*): Seq[NewStreamMessage] =
    ns.map(n => NewStreamMessage(mid(n), "type", s"""{"data":$n}"""))

  private def url(dir: String) = s"jdbc:derby:$dir/db;create=true"

  test("micro-batch source streams the JDBC log in position order, then follows appends") {
    val dir = SparkTestSession.tempDir("graft-jdbc-src")
    val store = new JdbcStreamStore(spark, url(dir))
    try {
      store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3))
      val q = spark.readStream
        .format("graft.sources.JdbcLogSource")
        .option("url", url(dir))
        .option("numPartitions", "2")
        .load()
        .writeStream.format("memory").queryName("jdbc_log").outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.sql("SELECT count(*) FROM jdbc_log").head().getLong(0) === 3L)
        store.appendToStream("b", ExpectedVersion.NoStream, msgs(4, 5))
        q.processAllAvailable()
        val rows = spark.sql(
          "SELECT streamId, streamVersion, position, jsonData FROM jdbc_log ORDER BY position").collect()
        assert(rows.map(_.getLong(2)).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
        assert(rows.map(_.getString(0)).toSeq === Seq("a", "a", "a", "b", "b"))
        assert(rows.head.getString(3) === """{"data":1}""")
        // createdUtc is a real timestamp column
        val ts = spark.sql("SELECT min(createdUtc) FROM jdbc_log").head().getTimestamp(0)
        assert(ts != null && ts.getTime > 0)
      } finally q.stop()
    } finally store.close()
  }

  test("store.allMessagesStream exposes the same source from the store handle") {
    val dir = SparkTestSession.tempDir("graft-jdbc-src-store")
    val store = new JdbcStreamStore(spark, url(dir))
    try {
      store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2))
      val q = store.allMessagesStream(numPartitions = 2)
        .writeStream.format("memory").queryName("jdbc_log_store").outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.sql("SELECT count(*) FROM jdbc_log_store").head().getLong(0) === 2L)
      } finally q.stop()
    } finally store.close()
  }

  test("fromPosition starts the stream after the given position") {
    val dir = SparkTestSession.tempDir("graft-jdbc-src-from")
    val store = new JdbcStreamStore(spark, url(dir))
    try {
      store.appendToStream("a", ExpectedVersion.NoStream, msgs(1, 2, 3, 4))
      val q = spark.readStream
        .format("graft.sources.JdbcLogSource")
        .option("url", url(dir))
        .option("fromPosition", "1")
        .load()
        .writeStream.format("memory").queryName("jdbc_log_from").outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.sql("SELECT position FROM jdbc_log_from ORDER BY position")
          .collect().map(_.getLong(0)).toSeq
        assert(got === Seq(2L, 3L))
      } finally q.stop()
    } finally store.close()
  }

  test("foreachBatch sink appends into a second JDBC store with store semantics") {
    // source store -> stream -> app-level append sink (expected-version
    // protocol runs in the application, as the reference requires)
    val srcDir = SparkTestSession.tempDir("graft-jdbc-pipe-src")
    val dstDir = SparkTestSession.tempDir("graft-jdbc-pipe-dst")
    val src = new JdbcStreamStore(spark, url(srcDir))
    val dst = new JdbcStreamStore(spark, url(dstDir))
    try {
      src.appendToStream("orders", ExpectedVersion.NoStream, msgs(1, 2, 3))
      val q = spark.readStream
        .format("graft.sources.JdbcLogSource")
        .option("url", url(srcDir))
        .load()
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.orderBy("position")
            .select("streamId", "messageId", "type", "jsonData")
            .collect()
            .foreach { r =>
              dst.appendToStream(r.getString(0), ExpectedVersion.Any,
                Seq(NewStreamMessage(r.getString(1), r.getString(2), r.getString(3))))
            }
        }
        .start()
      try {
        q.processAllAvailable()
        val page = dst.readStreamForwards("orders")
        assert(page.messages.map(_.messageId) === Seq(mid(1), mid(2), mid(3)))
        // replays are idempotent at the sink by message id (store protocol)
        src.appendToStream("orders", ExpectedVersion.Any, msgs(4))
        q.processAllAvailable()
        assert(dst.readStreamForwards("orders").messages.size === 4)
      } finally q.stop()
    } finally { src.close(); dst.close() }
  }
}
