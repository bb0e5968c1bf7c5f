package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingestion with an ONLINE line-boilerplate index —
  * the incremental twin of
  * [[graft.operators.TextCorpus.boilerplateStats]], the [[OnlineDedup]]
  * pattern applied to the C4/CCNet line rule: a `foreachBatch` sink
  * that keeps a cumulative (line-digest → document-frequency) index and
  * audits each arriving batch against the frequencies accumulated so
  * far INCLUDING the batch itself. Re-running the batch formulation
  * over the whole corpus per micro-batch would rescan history; here
  * each batch costs O(batch + matched index rows): the batch's distinct
  * digests are counted, the standing index contributes its counts for
  * THOSE digests only (an equi-join on the digest, prunable by the
  * batch side), and the merged counts both update the index and score
  * the batch.
  *
  * A line's document frequency only GROWS, so an online verdict can
  * differ from a final batch verdict for early documents (a footer's
  * first sighting is not yet boilerplate) — the inherent one-pass
  * trade, same as any online dedup; re-audit historical docs from the
  * final index when the pipeline needs retroactive truth (one join, no
  * text rescan).
  *
  * Replay safety (foreachBatch is at-least-once): both outputs write to
  * `batch=<id>` partition directories with overwrite, and the standing
  * index read EXCLUDES the current batch's partition, so a replayed
  * batch merges against exactly the pre-batch state and overwrites its
  * own prior output — decisions are identical on first delivery and on
  * every replay.
  *
  * Layout under `rootDir`: `audits/` (doc_id, n_lines, n_boilerplate
  * per batch), `index/` (line_hash, line_df increments per batch; the
  * standing df of a digest is the SUM of its increments, so the index
  * read aggregates — append-shaped like the message log itself, and
  * compactable offline by the same recipe). Contract: one streaming
  * lineage per rootDir (batch ids are the idempotence key).
  */
final class OnlineBoilerplate(
    rootDir: String, minDocs: Long = 2L, sep: String = "\n",
    idCol: String = "doc_id", textCol: String = "text") {

  require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")

  private val auditsDir = s"$rootDir/audits"
  private val indexDir = s"$rootDir/index"

  /** The foreachBatch hook:
    * `stream.writeStream.foreachBatch(online.processBatch _)`. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val lines = batch
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("line"))
      .select(col("doc_id"), trim(col("line")).as("line"))
      .filter(length(col("line")) > 0)
      .select(col("doc_id"), md5(col("line")).as("line_hash"))
      .distinct()
      .localCheckpoint() // feeds the increment write AND the audit
    val batchDf = lines.groupBy("line_hash")
      .agg(count(lit(1)).as("line_df"))
    // a replayed batch must not count its own prior increments; a
    // footerless index dir (crash during the very first write) reads
    // as empty rather than wedging every replay (r15 advice)
    val standing =
      IndexIo.readOrElse(spark, indexDir)(
          batchDf.withColumn("batch", lit(0L)).limit(0))
        .filter(col("batch") =!= batchId)
        .groupBy("line_hash").agg(sum("line_df").as("line_df"))
    val merged = batchDf.unionByName(standing)
      .groupBy("line_hash").agg(sum("line_df").as("line_df"))
    val audit = lines.join(merged, Seq("line_hash"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("line_df") >= minDocs, 1L).otherwise(0L)).as("n_boilerplate"))
    audit.write.mode("overwrite").parquet(s"$auditsDir/batch=$batchId")
    batchDf.write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
  }

  /** All per-batch audits so far (a doc audited in batch b reflects the
    * corpus up to and including b). */
  def audits(spark: org.apache.spark.sql.SparkSession): DataFrame =
    IndexIo.readOrElse(spark, auditsDir)(spark.emptyDataFrame).drop("batch")

  /** The standing line-df index (digest → cumulative document count). */
  def index(spark: org.apache.spark.sql.SparkSession): DataFrame =
    IndexIo.tryRead(spark, indexDir)
      .map(_.groupBy("line_hash").agg(sum("line_df").as("line_df")))
      .getOrElse(spark.emptyDataFrame)
}
