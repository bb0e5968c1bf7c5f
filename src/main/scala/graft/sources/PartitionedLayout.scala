package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style date-partitioned layout — DIRECTORY-level pruning, the
  * third leg of the layout family: [[BucketedTables]] removes join
  * exchanges, [[ZOrder]] packs row-group min/max stats for
  * multi-dimensional skipping WITHIN files, and this one turns a time-
  * range predicate into "never open the directory at all" — the scan
  * lists only matching `p_date=…/` paths, so a one-day query over a
  * 100 TB / multi-year log costs O(day), not O(history), before a
  * single row is read. This is the standard lake layout for append-only
  * event logs (every warehouse's daily-partition convention; in Spark
  * it is `DataFrameWriter.partitionBy` + catalyst partition pruning —
  * `PartitionFilters` in the scan, pinned by PartitionedLayoutSpec).
  *
  * Write discipline: `repartition(partition col)` BEFORE `partitionBy`,
  * so each day's rows co-locate in one task and each partition
  * directory gets ONE file instead of one-per-task — the small-files
  * guard (a naive partitionBy from 32 shuffled tasks writes up to
  * 32 × |days| files). The single shuffle is the cost any clustered
  * layout pays once at write time; for mixed day sizes compose with the
  * size-targeted writer's bin logic instead.
  *
  * The partition column is DERIVED (date of the event-time column) and
  * stays in the directory name only — readers get it back for free from
  * partition discovery, and the underlying files do not duplicate it.
  */
object PartitionedLayout {

  /** Partition-column name; `p_` prefix keeps it clear of data columns. */
  val PartitionCol = "p_date"

  /** Write `df` date-partitioned on `tsCol` (a timestamp-compatible
    * column; nanos-long event time should be converted upstream). */
  def writeByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn(PartitionCol, to_date(col(tsCol)))
      .repartition(col(PartitionCol))
      .write.partitionBy(PartitionCol).mode("overwrite").parquet(path)

  /** Scan one day: the `p_date = day` predicate binds to the partition
    * column, so Catalyst prunes at directory-listing time (the plan's
    * `PartitionFilters`) — files of other days are never opened. */
  def scanDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col(PartitionCol) === lit(day).cast("date"))

  /** Scan a closed day range — same pruning argument, range predicate. */
  def scanDayRange(
      spark: SparkSession, path: String, from: String, to: String): DataFrame =
    spark.read.parquet(path)
      .filter(col(PartitionCol) >= lit(from).cast("date") &&
        col(PartitionCol) <= lit(to).cast("date"))
}
