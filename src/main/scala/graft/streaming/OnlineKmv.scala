package graft.streaming

import graft.operators.Sketches
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of a KMV (k-minimum-values) distinct-count
  * sketch — the set-operation sketch family's `foreachBatch` sink, the
  * [[OnlineRollup]] idiom applied to [[Sketches.kmvSketch]].
  *
  * The fold IS the sketch's own merge law: each micro-batch is sketched
  * alone (one map-side-combined distinct + distributed top-K over the
  * delta), then merged into the standing sketch with
  * [[Sketches.kmvMerge]] — and the KMV union law says the result is
  * EXACTLY the sketch of everything ingested so far (k smallest of a
  * union = k smallest of the concatenation), so the streaming state is
  * frame-equal to the one-shot batch build, not an approximation of it.
  * Duplicate values across batches collapse in the merge's distinct, so
  * at-least-once replay of DATA is absorbed by construction; replay of
  * a whole BATCH is absorbed by the snapshot-per-batch convention below.
  *
  * Replay safety (foreachBatch is at-least-once): each batch writes the
  * full maintained sketch to its own batch-keyed directory
  * (`kmv/batch=<id>`, overwrite) and builds from the newest snapshot
  * with batch id STRICTLY BELOW its own — a replayed batch reads the
  * same predecessor and rewrites the same directory, bit-identical.
  * The snapshot is ≤ k rows (≤ |groups|·k grouped) — trivially tiny.
  *
  * 100 TB shape: per batch, one delta-sized distinct (map-side
  * combined) + a top-K (`TakeOrderedAndProject`, never a global sort) +
  * a (2k)-row merge. The corpus is never rescanned; the standing state
  * is k rows. `by` non-empty maintains one sketch per group key
  * ([[Sketches.kmvSketchBy]] / [[Sketches.kmvMergeBy]] — the per-day /
  * per-segment rollup with set operations).
  */
final class OnlineKmv(
    rootDir: String,
    valueCol: String,
    k: Int,
    by: Seq[String] = Nil) {
  require(k >= 2, s"kmv k must be >= 2: $k")

  private val kmvDir = s"$rootDir/kmv"

  private def latestBefore(spark: SparkSession, batchId: Long): Option[DataFrame] = {
    val root = new Path(kmvDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("batch=") => s.stripPrefix("batch=").toLong }
      .filter(_ < batchId)
      .sorted(Ordering[Long].reverse)
      .iterator
      // a footerless snapshot dir (crash mid-write before any replay
      // healed it) is skipped for the next-older committed one rather
      // than failing schema inference forever (r15 advice)
      .flatMap(id => IndexIo.tryRead(spark, s"$kmvDir/batch=$id"))
      .nextOption()
  }

  /** The foreachBatch hook:
    * `stream.writeStream.foreachBatch(kmv.processBatch _)`. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta =
      if (by.isEmpty) Sketches.kmvSketch(batch, col(valueCol), k)
      else Sketches.kmvSketchBy(batch, by, col(valueCol), k)
    val next = latestBefore(spark, batchId) match {
      case Some(prev) if by.isEmpty => Sketches.kmvMerge(prev, delta, k)
      case Some(prev) => Sketches.kmvMergeBy(prev, delta, by, k)
      case None => delta
    }
    next.coalesce(1).write.mode("overwrite").parquet(s"$kmvDir/batch=$batchId")
  }

  /** The newest maintained sketch (None if nothing ingested). */
  def current(spark: SparkSession): Option[DataFrame] =
    latestBefore(spark, Long.MaxValue)
}
