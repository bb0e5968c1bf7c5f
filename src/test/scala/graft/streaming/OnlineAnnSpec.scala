package graft.streaming

import graft.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Online IVF embedding index: frozen first-batch centroids, per-batch
  * cell appends, probes over the accumulated index equal the one-shot
  * batch IVF on the union corpus, and replays are idempotent. */
class OnlineAnnSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // two clear directions in 4-d space; ids 0 and 1 become the seeds
  private def vec(dir: Int, jitter: Float): Seq[Float] =
    if (dir == 0) Seq(1.0f, jitter, 0.0f, 0.0f) else Seq(0.0f, 0.0f, 1.0f, jitter)

  private def batchDf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("online-ann").toString

  test("probes over accumulated batches equal batch IVF on the union corpus") {
    val root = freshDir()
    val online = new OnlineAnn(root, k = 2)
    val b0 = Seq(0L -> vec(0, 0.1f), 1L -> vec(1, 0.1f), 2L -> vec(0, 0.2f))
    val b1 = Seq(3L -> vec(1, 0.3f), 4L -> vec(0, 0.05f))
    val b2 = Seq(5L -> vec(1, 0.02f), 6L -> vec(0, 0.4f))
    online.processBatch(batchDf(b0: _*), 0L)
    online.processBatch(batchDf(b1: _*), 1L)
    online.processBatch(batchDf(b2: _*), 2L)
    assert(online.indexed(spark).count() === 7)

    val queries = batchDf(100L -> vec(0, 0.15f), 101L -> vec(1, 0.25f))
    val got = online.probe(queries, topK = 3, nprobe = 1).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap

    // reference: one-shot IVF over the union with the SAME frozen model
    // (first-batch seeds, iterations = 0)
    val union = batchDf((b0 ++ b1 ++ b2): _*)
    val model = Similarity.trainIvf(batchDf(b0: _*), k = 2, iterations = 0)
    val want = Similarity.ivfTopK(union, queries, model, k = 3, nprobe = 1).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    assert(got === want)
    // sanity: direction-0 query finds direction-0 vectors
    assert(Set(0L, 2L, 4L, 6L).contains(got((100L, 1L))))
    assert(Set(1L, 3L, 5L).contains(got((101L, 1L))))
  }

  test("replayed batches rewrite their own partitions; centroids stay frozen") {
    val root = freshDir()
    val online = new OnlineAnn(root, k = 2)
    online.processBatch(batchDf(0L -> vec(0, 0.1f), 1L -> vec(1, 0.1f)), 0L)
    online.processBatch(batchDf(2L -> vec(0, 0.2f)), 1L)
    val before = online.indexed(spark).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // at-least-once replay of batch 1 — and of batch 0, which must NOT
    // retrain the quantizer
    online.processBatch(batchDf(2L -> vec(0, 0.2f)), 1L)
    online.processBatch(batchDf(0L -> vec(0, 0.1f), 1L -> vec(1, 0.1f)), 0L)
    val after = online.indexed(spark).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(after === before)
  }

  test("drives from a real stream through foreachBatch") {
    val root = freshDir()
    val online = new OnlineAnn(root, k = 2)
    val in = MemoryStream[(Long, Seq[Float])](spark)
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => online.processBatch(df, id))
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", freshDir())
      .start()
    try {
      in.addData(0L -> vec(0, 0.1f), 1L -> vec(1, 0.1f))
      q.processAllAvailable()
      in.addData(2L -> vec(0, 0.3f), 3L -> vec(1, 0.2f))
      q.processAllAvailable()
    } finally q.stop()
    assert(online.indexed(spark).count() === 4)
    val res = online.probe(batchDf(100L -> vec(1, 0.15f)), topK = 2, nprobe = 1)
      .collect().map(_.getLong(1)).toSet
    assert(res.subsetOf(Set(1L, 3L)))
  }
}
