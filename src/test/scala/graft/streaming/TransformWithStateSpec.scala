package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The arbitrary-state API operator
  * ([[TransformWithStateOps.typeCountsWithState]]): batch ≡ grouped
  * count, and streaming Update-mode replay on RocksDB (the provider the
  * API requires) emits per-batch deltas whose LAST emission per pair is
  * the batch twin's total. */
class TransformWithStateSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(u: Long, ts: Long, typ: String): LogEvent =
    LogEvent(u, ts, typ, 0L)

  test("batch mode equals groupBy().count()") {
    val events = Seq(ev(1, 1, "a"), ev(1, 2, "a"), ev(1, 3, "b"), ev(2, 4, "a"))
    val out = TransformWithStateOps.typeCountsWithState(events.toDS())
      .collect().map(r => (r.userId, r.eventType) -> r.n).toMap
    assert(out === Map((1L, "a") -> 2L, (1L, "b") -> 1L, (2L, "a") -> 1L))
  }

  test("streaming replay on RocksDB: running counts accumulate across micro-batches; only touched pairs emit") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws").toString
    try {
      val in = MemoryStream[LogEvent](spark)
      val q = TransformWithStateOps.typeCountsWithState(in.toDS())
        .writeStream.format("memory").queryName("tws_counts").outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0)).start()
      try {
        in.addData(ev(1, 1, "a"), ev(1, 2, "a"), ev(2, 3, "b"))
        q.processAllAvailable()
        val b1 = spark.table("tws_counts").as[UserTypeCount].collect().toSet
        assert(b1 === Set(UserTypeCount(1, "a", 2), UserTypeCount(2, "b", 1)))

        // batch 2 touches (1, a) and (1, b) — (2, b) must NOT re-emit
        in.addData(ev(1, 4, "a"), ev(1, 5, "b"))
        q.processAllAvailable()
        val all = spark.table("tws_counts").as[UserTypeCount].collect().toSeq
        val batch2 = all.diff(b1.toSeq)
        assert(batch2.toSet === Set(UserTypeCount(1, "a", 3), UserTypeCount(1, "b", 1)))

        // final running state (last emission per pair) == the batch twin
        val finalCounts = all.groupBy(r => (r.userId, r.eventType))
          .map { case (k, rs) => k -> rs.map(_.n).max }
        val twin = TransformWithStateOps.typeCountsWithState(
            Seq(ev(1, 1, "a"), ev(1, 2, "a"), ev(2, 3, "b"), ev(1, 4, "a"), ev(1, 5, "b")).toDS())
          .collect().map(r => (r.userId, r.eventType) -> r.n).toMap
        assert(finalCounts === twin)
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
