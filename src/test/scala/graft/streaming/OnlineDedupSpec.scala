package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming corpus ingestion with online near-dup dedup: each
  * micro-batch probes the index accumulated by earlier batches, and
  * replayed micro-batches (foreachBatch's at-least-once delivery) make
  * the same decisions and rewrite the same files. */
class OnlineDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val tA = "the quick brown fox jumps over the lazy sleeping dog tonight"
  private val tB = "completely different prose regarding distributed query engine design"
  private val tC = "a genuinely novel document about columnar storage layouts today"
  private val tD = "another unique piece mentioning watermark based state eviction rules"

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("online-dedup").toString

  test("each micro-batch dedups against all earlier batches and itself") {
    val root = freshDir()
    val online = new OnlineDedup(root, threshold = 0.5)
    def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

    online.processBatch(df(1L -> tA, 2L -> tB), 0L)
    online.processBatch(df(3L -> tA, 4L -> tC), 1L) // 3 duplicates batch-0's 1
    online.processBatch(df(5L -> tC, 6L -> tD, 7L -> tD), 2L) // 5 dups batch-1's 4; 7 dups 6 in-batch

    val corpus = online.corpus(spark).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(corpus === Set(1L, 2L, 4L, 6L))
  }

  test("replaying a micro-batch is idempotent: same decisions, same files") {
    val root = freshDir()
    val online = new OnlineDedup(root, threshold = 0.5)
    def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

    online.processBatch(df(1L -> tA), 0L)
    online.processBatch(df(2L -> tB, 3L -> tA), 1L)
    val before = online.corpus(spark).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet

    // at-least-once: the sink crashed after writing but before the
    // checkpoint committed — the engine re-delivers batch 1 verbatim
    online.processBatch(df(2L -> tB, 3L -> tA), 1L)
    val after = online.corpus(spark).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(before === Set(1L, 2L))
    assert(after === before, "replay must not duplicate or drop documents")
  }

  test("drives from a real stream through foreachBatch") {
    val root = freshDir()
    val online = new OnlineDedup(root, threshold = 0.5)
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(online.processBatch _)
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      in.addData(1L -> tA, 2L -> tB)
      q.processAllAvailable()
      in.addData(3L -> tA, 4L -> tD) // 3 is a dup of the previous batch's 1
      q.processAllAvailable()
    } finally q.stop()
    val corpus = online.corpus(spark).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(corpus === Set(1L, 2L, 4L))
  }
}
