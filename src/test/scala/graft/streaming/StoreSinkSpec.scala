package graft.streaming

import graft.SparkTestSession
import graft.core._
import graft.store.SparkStreamStore
import org.scalatest.funsuite.AnyFunSuite

/** The store as a streaming sink: at-least-once `foreachBatch` delivery
  * must collapse to exactly-once in the log (StoreSink's deterministic
  * ids + the Any-append idempotency rule). */
class StoreSinkSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("duplicate micro-batch replay is a no-op; a diverged replay throws") {
    val store = new SparkStreamStore(spark, SparkTestSession.tempDir("graft-sink"))
    try {
      val b0 = Seq("t" -> """{"n":1}""", "t" -> """{"n":2}""")
      val r0 = StoreSink.writeBatch(store, "out", batchId = 0L, rows = b0)
      assert(r0 === AppendResult(1, 1))

      // crash-between-commits: Spark re-delivers batch 0 verbatim
      assert(StoreSink.writeBatch(store, "out", 0L, b0) === r0)
      assert(store.readStreamForwards("out").messages.size === 2)

      // progress continues past the replay
      val r1 = StoreSink.writeBatch(store, "out", 1L, Seq("t" -> """{"n":3}"""))
      assert(r1 === AppendResult(2, 2))
      // ...and replaying batch 1 after that is still a no-op
      assert(StoreSink.writeBatch(store, "out", 1L, Seq("t" -> """{"n":3}""")) === r1)
      assert(store.readStreamForwards("out").messages.map(_.jsonData) ===
        Seq("""{"n":1}""", """{"n":2}""", """{"n":3}"""))

      // a replay whose content DIVERGED (non-deterministic upstream) must
      // surface, not fork history: same ids, one extra row → partial
      // overlap → WrongExpectedVersion (ref: EnforceIdempotentAppend.sql)
      intercept[WrongExpectedVersionException] {
        StoreSink.writeBatch(store, "out", 1L,
          Seq("t" -> """{"n":3}""", "t" -> """{"n":4}"""))
      }
      assert(store.readStreamForwards("out").messages.size === 3)
    } finally store.close()
  }

  test("foreachBatch wiring: a re-run micro-batch lands once in the store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val store = new SparkStreamStore(spark, SparkTestSession.tempDir("graft-sink-fb"))
    try {
      val in = MemoryStream[Int](spark)
      def sinkBatch(batch: org.apache.spark.sql.Dataset[Int], batchId: Long): Unit = {
        // deterministic row order inside the batch (foreachBatch gives no
        // ordering guarantee; the sink contract requires a stable key)
        val rows = batch.collect().sorted.map(n => "t" -> s"""{"n":$n}""").toSeq
        StoreSink.writeBatch(store, "nums", batchId, rows)
        ()
      }
      val q = in.toDS().writeStream.foreachBatch(sinkBatch _)
        .option("checkpointLocation", SparkTestSession.tempDir("graft-sink-ckpt"))
        .start()
      try {
        in.addData(3, 1, 2)
        q.processAllAvailable()
      } finally q.stop()
      assert(store.readStreamForwards("nums").messages.map(_.jsonData) ===
        Seq("""{"n":1}""", """{"n":2}""", """{"n":3}"""))

      // simulate the redelivery Spark performs when the checkpoint commit
      // was lost: the same batchId + batch content runs through the same
      // sink function — the store must not grow
      val replay = spark.createDataset(Seq(3, 1, 2))
      sinkBatch(replay, 0L)
      assert(store.readStreamForwards("nums").messages.size === 3)
    } finally store.close()
  }
}
