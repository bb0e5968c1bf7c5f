package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generational compaction for the `Online*` family's batch-partitioned
  * standing indexes (r15 verdict #4).
  *
  * Every `Online*` operator appends one `<dir>/batch=<id>/` parquet
  * directory per micro-batch (the replay-idempotence recipe: overwrite
  * your own batch directory, read everyone else's). At thousands of
  * batches the standing-index probe degrades into a small-files scan —
  * file-listing time dominates the equi-join the index exists to serve.
  *
  * `compact()` rewrites the standing state into ONE size-targeted
  * generation under `<dir>/_compacted/g<k>/`, carrying the batch id as
  * a DATA column — the own-batch-exclusion replay contract needs the
  * id per row, not per directory. The underscore prefix keeps the
  * generation directories invisible to the live `parquet(dir)` read
  * (Spark's hidden-path convention), so the two layouts coexist.
  *
  * Commit protocol (the store's `compact()` discipline, adapted):
  * generation data is written first, then a `COMMIT-g<k>` marker file
  * (created atomically, content = the highest batch id the generation
  * covers). The current generation is the max committed marker; live
  * batch directories with `batch <= maxBatch` are EXCLUDED from reads
  * by the watermark — so deleting them (and older generations) is pure
  * space reclamation, safe to crash out of at any point. A crash
  * before the marker leaves an orphan data directory the next
  * compaction overwrites; a crash after it leaves covered directories
  * that the watermark already hides.
  *
  * Replay interplay: a batch at or below the watermark only replays if
  * compaction swallowed its rows while its checkpoint had not yet
  * committed — the replay then probes the same standing state (its own
  * rows excluded by the batch COLUMN) and rewrites a directory the
  * watermark hides, whose content the generation already carries.
  * Bit-identical outcomes either way, pinned by spec. */
private[graft] object BatchIndex {

  private def compRoot(dir: String) = s"${dir.stripSuffix("/")}/_compacted"

  private final case class Gen(gen: Long, maxBatch: Long)

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val MarkerRx = """COMMIT-g(\d+)""".r

  private def current(spark: SparkSession, dir: String): Option[Gen] = {
    val root = new Path(compRoot(dir))
    val fs = fsOf(spark, dir)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case MarkerRx(g) =>
            try {
              val in = fs.open(st.getPath)
              val text =
                try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
              Some(Gen(g.toLong, text.toLong))
            } catch { case _: Exception => None }
          case _ => None
        }
      }
      .maxByOption(_.gen)
  }

  /** The standing index as one frame (live tail ∪ current generation),
    * batch column included — callers apply their own-batch exclusion
    * and column selection. `empty` supplies the schema before anything
    * committed (and must carry a `batch` column). */
  def read(spark: SparkSession, dir: String)(empty: => DataFrame): DataFrame =
    current(spark, dir) match {
      case None => IndexIo.readOrElse(spark, dir)(empty)
      case Some(g) =>
        val comp = IndexIo.readOrElse(spark, s"${compRoot(dir)}/g${g.gen}")(empty)
        // one cheap directory listing decides whether a live tail above
        // the watermark exists at all — right after a compaction (the
        // common steady state) the read stays single-source
        val fs = fsOf(spark, dir)
        val hasTail = fs.exists(new Path(dir)) &&
          fs.listStatus(new Path(dir)).exists { st =>
            st.getPath.getName.startsWith("batch=") &&
              st.getPath.getName.stripPrefix("batch=").toLongOption
                .exists(_ > g.maxBatch)
          }
        if (!hasTail) comp
        else {
          // covered live dirs may linger until reclamation — the
          // watermark, not the delete, is what excludes them
          val live = IndexIo.readOrElse(spark, dir)(empty)
            .filter(col("batch") > g.maxBatch)
          comp.unionByName(live.select(comp.columns.map(col): _*))
        }
    }

  /** Rewrite the standing state into one `targetFiles`-file generation
    * and reclaim covered space. Returns the number of live batch
    * directories the new generation absorbed (0 = nothing to compact —
    * no data yet, or everything already compacted). */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 8): Int = {
    require(targetFiles >= 1, s"targetFiles must be >= 1: $targetFiles")
    val fs = fsOf(spark, dir)
    val cur = current(spark, dir)
    val liveDirs: Seq[(Long, Path)] = {
      val p = new Path(dir)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.flatMap { st =>
        st.getPath.getName match {
          case s if s.startsWith("batch=") =>
            s.stripPrefix("batch=").toLongOption
              .filter(id => cur.forall(id > _.maxBatch))
              .map(_ -> st.getPath)
          case _ => None
        }
      }
    }
    if (liveDirs.isEmpty) return 0
    val standing = read(spark, dir)(
      // read() only falls back to `empty` when neither layout holds
      // data — unreachable here because liveDirs is non-empty — but the
      // by-name thunk must still be well-typed
      spark.emptyDataFrame)
    // batch must ride as a DATA column: partition-style discovery would
    // drop it from the files and break own-batch exclusion after the
    // directory boundary is gone
    val nextGen = cur.map(_.gen + 1L).getOrElse(0L)
    val genDir = s"${compRoot(dir)}/g$nextGen"
    standing.repartition(targetFiles)
      .write.mode("overwrite").parquet(genDir)
    val maxBatch = math.max(
      liveDirs.map(_._1).max, cur.map(_.maxBatch).getOrElse(Long.MinValue))
    val marker = new Path(compRoot(dir), s"COMMIT-g$nextGen")
    val out = fs.create(marker, false) // commit point
    try out.write(maxBatch.toString.getBytes("UTF-8")) finally out.close()
    // space reclamation — correctness never depends on these deletes
    liveDirs.foreach { case (_, p) =>
      try fs.delete(p, true) catch { case _: java.io.IOException => () }
    }
    cur.foreach { g =>
      try fs.delete(new Path(s"${compRoot(dir)}/g${g.gen}"), true)
      catch { case _: java.io.IOException => () }
      try fs.delete(new Path(compRoot(dir), s"COMMIT-g${g.gen}"), false)
      catch { case _: java.io.IOException => () }
    }
    liveDirs.size
  }
}
