package graft.streaming

import graft.SparkTestSession
import graft.operators.TextCorpus
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Online line-boilerplate index: per-batch audits see the cumulative
  * document frequencies including the batch itself, replays are
  * idempotent, and once every document has arrived the final index
  * agrees with the batch formulation over the union. */
class OnlineBoilerplateSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("online-boiler").toString

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("frequencies accumulate: a footer becomes boilerplate when its df crosses") {
    val root = freshDir()
    val online = new OnlineBoilerplate(root, minDocs = 2)
    online.processBatch(df(1L -> "alpha\nshared footer"), 0L)
    online.processBatch(df(2L -> "beta\nshared footer"), 1L)
    online.processBatch(df(3L -> "gamma only"), 2L)

    val audits = online.audits(spark).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 audited at batch 0: footer seen once corpus-wide → clean
    assert(audits(1L) === ((2L, 0L)))
    // doc 2 audited at batch 1: footer df is now 2 → flagged
    assert(audits(2L) === ((2L, 1L)))
    assert(audits(3L) === ((1L, 0L)))

    val idx = online.index(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx.values.max === 2L) // the shared footer
    assert(idx.values.count(_ == 1L) === 3L) // alpha, beta, "gamma only"
  }

  test("in-batch duplication counts: two docs sharing a line in ONE batch flag") {
    val root = freshDir()
    val online = new OnlineBoilerplate(root, minDocs = 2)
    online.processBatch(df(1L -> "same line\nown a", 2L -> "same line\nown b"), 0L)
    val audits = online.audits(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(audits === Map(1L -> 1L, 2L -> 1L))
  }

  test("replaying a micro-batch is idempotent for audits AND the index") {
    val root = freshDir()
    val online = new OnlineBoilerplate(root, minDocs = 2)
    online.processBatch(df(1L -> "x\nfoot"), 0L)
    online.processBatch(df(2L -> "y\nfoot"), 1L)
    val auditsBefore = online.audits(spark).collect().toSet
    val idxBefore = online.index(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    online.processBatch(df(2L -> "y\nfoot"), 1L) // at-least-once redelivery
    val auditsAfter = online.audits(spark).collect().toSet
    val idxAfter = online.index(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(auditsAfter === auditsBefore)
    assert(idxAfter === idxBefore, "replay must not double-count frequencies")
  }

  test("final index agrees with the batch operator over the whole corpus") {
    val root = freshDir()
    val online = new OnlineBoilerplate(root, minDocs = 2)
    val all = Seq(
      1L -> "a\ncommon tail", 2L -> "b\ncommon tail", 3L -> "c\ncommon tail",
      4L -> "solo page")
    online.processBatch(df(all(0), all(1)), 0L)
    online.processBatch(df(all(2), all(3)), 1L)

    // re-audit every doc against the FINAL index (the retroactive pass
    // the scaladoc prescribes) and compare with the batch formulation
    val batchTruth = TextCorpus.boilerplateStats(df(all: _*), minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lines = df(all: _*)
      .select($"doc_id",
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split($"text", "\n")).as("line"))
      .select($"doc_id",
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.trim($"line")).as("line_hash"),
        org.apache.spark.sql.functions.trim($"line").as("t"))
      .filter(org.apache.spark.sql.functions.length($"t") > 0)
      .select("doc_id", "line_hash").distinct()
    val reAudit = lines.join(online.index(spark), Seq("line_hash"))
      .groupBy("doc_id")
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_lines"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when($"line_df" >= 2L, 1L).otherwise(0L))
          .as("n_boilerplate"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(reAudit === batchTruth)
  }

  test("drives from a real stream through foreachBatch") {
    val root = freshDir()
    val online = new OnlineBoilerplate(root, minDocs = 2)
    val in = MemoryStream[(Long, String)](spark)
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        online.processBatch(b, id))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("online-boiler-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    in.addData(1L -> "first\nshared", 2L -> "second\nshared")
    q.processAllAvailable()
    q.stop()
    val audits = online.audits(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(audits === Map(1L -> 1L, 2L -> 1L))
  }
}
