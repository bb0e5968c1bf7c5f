package graft.store

import graft.SparkTestSession
import graft.core.{ExpectedVersion, NewStreamMessage, Position}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bulk import writes a log the store opens as if it had been appended
  * row-at-a-time: dense positions in order-column order, dense per-stream
  * versions, heads rebuilt by journal-less recovery, and appends that
  * continue where the import left off. */
class BulkImportSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = (0 until 600).map { i =>
    // interleaved streams; order key descends vs i to prove orderCol wins
    (s"s${i % 7}", s"m$i", s"t${i % 3}", s"""{"i":$i}""", 10000L + i)
  }.toDF("sid", "mid", "typ", "data", "ord")

  test("import + open: positions, versions, heads, and reads all agree") {
    val root = SparkTestSession.tempDir("bulk-import")
    val n = BulkImport.importMessages(spark, fixture, root,
      orderCol = "ord", streamIdCol = "sid", messageIdCol = "mid",
      typeCol = "typ", dataCol = "data", targetSegments = 5)
    assert(n === 600)

    val store = new SparkStreamStore(spark, root)
    try {
      assert(store.readHeadPosition() === 599)

      // positions dense and in ord order == i order
      val all = store.allMessages.orderBy("position").collect()
      assert(all.map(_.getAs[Long]("position")).toSeq === (0L until 600L))
      assert(all.map(_.getAs[String]("messageId")).toSeq ===
        (0 until 600).map(i => s"m$i"))

      // per-stream versions dense from 0 in the same order
      val s3 = store.readStreamForwards("s3", 0, 1000)
      val expected = (0 until 600).filter(_ % 7 == 3)
      assert(s3.messages.map(_.streamVersion).toSeq === expected.indices)
      assert(s3.messages.map(_.messageId).toSeq === expected.map(i => s"m$i"))

      // appends continue the imported sequence
      val r = store.appendToStream("s3", ExpectedVersion.Any,
        Seq(NewStreamMessage("post-import", "t0", "{}")))
      assert(r.currentPosition === 600)
      assert(r.currentVersion === expected.size)
    } finally store.close()
  }

  test("the imported log serves the DSv2 segment table with pruning stats") {
    val root = SparkTestSession.tempDir("bulk-import-dsv2")
    BulkImport.importMessages(spark, fixture, root,
      orderCol = "ord", streamIdCol = "sid", messageIdCol = "mid",
      typeCol = "typ", dataCol = "data", targetSegments = 6)
    val tail = spark.read.format("graft.sources.LogSegmentSource")
      .option("path", root).load()
      .filter(col("position") >= 500)
    assert(tail.count() === 100)
    assert(tail.rdd.getNumPartitions === 1,
      "position filter should prune the range-partitioned segments")
  }

  test("refuses a root that already has a message log") {
    val root = SparkTestSession.tempDir("bulk-import-taken")
    BulkImport.importMessages(spark, fixture, root,
      orderCol = "ord", streamIdCol = "sid", messageIdCol = "mid",
      typeCol = "typ", dataCol = "data")
    assertThrows[IllegalArgumentException] {
      BulkImport.importMessages(spark, fixture, root,
        orderCol = "ord", streamIdCol = "sid", messageIdCol = "mid",
        typeCol = "typ", dataCol = "data")
    }
  }

  test("import matches a message-by-message append replay exactly") {
    val rootA = SparkTestSession.tempDir("bulk-import-a")
    val rootB = SparkTestSession.tempDir("bulk-import-b")
    val rows = fixture.orderBy("ord").collect()
    BulkImport.importMessages(spark, fixture, rootA,
      orderCol = "ord", streamIdCol = "sid", messageIdCol = "mid",
      typeCol = "typ", dataCol = "data", targetSegments = 4)
    val replay = new SparkStreamStore(spark, rootB)
    try rows.foreach { r =>
      replay.appendToStream(r.getString(0), ExpectedVersion.Any,
        Seq(NewStreamMessage(r.getString(1), r.getString(2), r.getString(3))))
    } finally replay.close()

    val a = new SparkStreamStore(spark, rootA)
    val b = new SparkStreamStore(spark, rootB)
    try {
      val pa = a.readAllForwards(Position.Start, maxCount = 1000)
      val pb = b.readAllForwards(Position.Start, maxCount = 1000)
      val proj = (p: graft.core.ReadAllPage) =>
        p.messages.map(m => (m.position, m.streamId, m.streamVersion, m.messageId, m.`type`))
      assert(proj(pa) === proj(pb))
    } finally { a.close(); b.close() }
  }
}
