package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional data skipping for
  * a columnar lake: interleaving the bits of two sort keys gives a ONE-
  * dimensional order in which points close in EITHER dimension stay
  * close on disk, so parquet min/max row-group stats prune scans
  * filtered on `a`, on `b`, or on both (a plain `ORDER BY a, b` layout
  * prunes only on the leading column). The technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY` (Morton 1966; the same curve
  * databases use for spatial indexing), re-expressed as a plain
  * codegen'd integer expression + a range repartition — no engine
  * extension needed.
  */
object ZOrder {

  /** Morton code interleaving the low `bits` bits of two NON-NEGATIVE
    * integer columns: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1 — so the code is < 2^(2·bits) and sorting by it walks the
    * Z-curve over the (a, b) grid. Pure integer arithmetic (shifts,
    * masks, one ordered sum), exact and engine-reproducible; inputs
    * wider than `bits` bits must be pre-scaled (clamp, rank-bucket, or
    * shift) — the curve only orders what it sees.
    *
    * A codegen'd projection — zero shuffle; at 100 TB the code is
    * computed streaming in the write pipeline. */
  def mortonCode(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val al = a.cast("long")
    val bl = b.cast("long")
    // unrolled at plan-build time (bits is a constant): 2·bits shift/mask
    // terms summed — integer-exact in any order, one codegen'd expression
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Write `df` as parquet laid out along the Z-curve of (aCol, bCol):
    * range-repartition by the Morton code into `files` output files and
    * sort within each — every file then covers a compact Z-interval, so
    * its parquet min/max stats for BOTH columns span a small box and
    * selective filters on either column skip most files/row groups.
    * The one range exchange is the cost any clustered layout pays;
    * repeat readers amortize it exactly like [[BucketedTables]]. */
  def writeZOrdered(
      df: DataFrame, path: String, aCol: String, bCol: String,
      files: Int = 32, bits: Int = 21): Unit =
    df.withColumn("_z", mortonCode(col(aCol), col(bCol), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Write `df` as ~`targetBytes`-sized parquet files — the small-files
    * guard every corpus-build output step needs: thousands of tasks each
    * flushing a KB-scale file turns the next scan's planning and open()
    * overhead into the bottleneck (the classic HDFS/S3 small-files
    * problem), while one giant file serializes downstream parallelism.
    * File count = clamp(optimizer size estimate ÷ target), so output
    * layout adapts to the data actually flowing, not a hardcoded
    * partition count that is wrong at every other scale factor.
    *
    * The estimate is Catalyst's `plan.stats.sizeInBytes` (in-memory row
    * estimate, ~2-4× parquet's encoded size — callers wanting encoded
    * precision can pass a measured `bytesPerRowHint`); the repartition
    * is round-robin, the cheapest full-balance exchange. At 100 TB this
    * writes ~targetBytes/128 MB files per output, and the one extra
    * exchange it costs is exactly the exchange any explicit
    * `repartition(n)` guess would also pay — minus the wrong guess. */
  def writeSizeTargeted(
      df: DataFrame, path: String, targetBytes: Long = 128L << 20,
      maxFiles: Int = 100000): Unit = {
    require(targetBytes > 0 && maxFiles > 0, "need positive target and cap")
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = est / targetBytes match {
      case n if n < 1 => 1
      case n if n > maxFiles => maxFiles
      case n => n.toInt
    }
    df.repartition(files).write.mode("overwrite").parquet(path)
  }
}
