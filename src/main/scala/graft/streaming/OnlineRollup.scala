package graft.streaming

import graft.operators.Merge
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of a sum/count rollup: a `foreachBatch` sink
  * that folds every micro-batch into the standing aggregate with
  * [[Merge.maintainAgg]] — the streaming face of the
  * self-maintainable-view identity. Per batch the work is one
  * delta-sized aggregation plus a rollup-sized merge; the history is
  * NEVER rescanned, which is the entire point at 100 TB (the rollup is
  * megabytes, the history is the 100 TB).
  *
  * Replay safety (foreachBatch is at-least-once): each batch writes the
  * FULL maintained snapshot to its own batch-keyed directory
  * (`rollup/batch=<id>`, overwrite), and builds it from the newest
  * snapshot with batch id STRICTLY BELOW its own — so a replayed batch
  * reads the same predecessor and rewrites the same directory,
  * bit-identical, never double-adding. Snapshot-per-batch costs a
  * rollup-sized write per batch, which is exactly the "rollup is tiny"
  * premise; if it weren't tiny, maintenance would be the wrong tool.
  *
  * Contract: `rootDir` belongs to ONE streaming query lineage (batch
  * ids are the idempotence key — the [[OnlineDedup]] contract). Sum
  * columns should be exact types (long/decimal) so replays and
  * recomputes are bit-equal; the maintained snapshot then always equals
  * `maintainAgg`-from-scratch over everything ingested so far.
  */
final class OnlineRollup(
    rootDir: String,
    keyCols: Seq[String],
    sumCols: Seq[String],
    countCol: String = "n") {
  require(keyCols.nonEmpty && sumCols.nonEmpty,
    "OnlineRollup needs at least one key column and one sum column")

  private val rollupDir = s"$rootDir/rollup"

  private def latestBefore(spark: SparkSession, batchId: Long): Option[(Long, DataFrame)] = {
    val root = new Path(rollupDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else {
      val ids = fs.listStatus(root).toSeq
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("batch=") => s.stripPrefix("batch=").toLong }
        .filter(_ < batchId)
      // a footerless snapshot dir (crash mid-write before any replay
      // healed it) is skipped for the next-older committed one rather
      // than failing schema inference forever (r15 advice)
      ids.sorted(Ordering[Long].reverse).iterator
        .flatMap(id =>
          IndexIo.tryRead(spark, s"$rollupDir/batch=$id").map(id -> _))
        .nextOption()
    }
  }

  /** The foreachBatch hook:
    * `stream.writeStream.foreachBatch(rollup.processBatch _)`. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val next = latestBefore(spark, batchId) match {
      case Some((_, prev)) => Merge.maintainAgg(prev, batch, keyCols, sumCols, countCol)
      case None => // first batch: the snapshot IS the batch aggregate
        batch.groupBy(keyCols.map(col): _*)
          .agg(sum(col(sumCols.head)).as(sumCols.head),
            (sumCols.tail.map(c => sum(col(c)).as(c)) :+
              count(lit(1)).as(countCol)): _*)
    }
    next.coalesce(1).write.mode("overwrite").parquet(s"$rollupDir/batch=$batchId")
  }

  /** The newest maintained snapshot (empty frame if nothing ingested). */
  def current(spark: SparkSession): Option[DataFrame] =
    latestBefore(spark, Long.MaxValue).map(_._2)
}
