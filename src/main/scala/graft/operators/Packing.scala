package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-budget bins (token/char budget per training sequence) so that
  * bins fill greedily in a DETERMINISTIC document order — the step that
  * turns a shuffled corpus into dense, reproducible training batches.
  *
  * Scale shape: packing is inherently sequential within a bin, so the
  * corpus is first cut into fixed-size CHUNKS of `chunkSize` consecutive
  * ids; packing runs independently per chunk (window partitioned by
  * chunk — thousands of parallel partitions at 100 TB, each a bounded
  * sort run), and bin ids are globally unique as
  * `chunk * binsPerChunk + binInChunk`. A single global cumulative sum
  * would serialize the whole corpus through one partition; chunking
  * trades at most one under-filled bin per chunk boundary for full
  * parallelism. Integer arithmetic end to end, so any engine computes
  * identical bins (the `pack_sequences` gate's DuckDB oracle runs the
  * same window).
  */
object Packing {

  /** Bin ids are `chunk * BinStride + binInChunk`; a chunk whose total
    * cost exceeds `BinStride * budget` would collide (impossible for any
    * sane chunkSize/budget), and chunk ids stay below 2^31. */
  val BinStride: Long = 1L << 32

  /** Exact floor division on longs: pure Column ops (odd column names
    * are fine) and no doubles; FLOORS for negative values, matching
    * DuckDB `//` (same construction as EventTimeOps.floorDivMicros). */
  private def floorDiv(c: Column, divisor: Long): Column =
    ((c - pmod(c, lit(divisor))).cast("decimal(38,0)") / lit(divisor)).cast("long")

  /** Adds a `bin` column: the bin (budget-capped) that each row's END
    * lands in, packing rows in ascending `idCol` order within chunks of
    * `chunkSize` consecutive ids. A row larger than `budget` occupies
    * (at least) its own bin. `costCol` must be a positive integer
    * column (token or char count). */
  def assignBins(
      df: DataFrame, idCol: String, costCol: String,
      budget: Long, chunkSize: Long = 2000L): DataFrame = {
    val chunk = floorDiv(col(idCol).cast("long"), chunkSize)
    val w = Window.partitionBy(chunk).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(costCol).cast("long")).over(w))
      .withColumn("bin", chunk * BinStride + floorDiv(col("_cum") - lit(1L), budget))
      .drop("_cum")
  }

  /** Per-bin packing stats: document count, total cost, and fill ratio
    * against the budget — the utilization report a packing job emits. */
  def binStats(df: DataFrame, idCol: String, costCol: String,
      budget: Long, chunkSize: Long = 2000L): DataFrame =
    assignBins(df, idCol, costCol, budget, chunkSize)
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(costCol).cast("long")).as("total_cost"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"))
      .withColumn("fill_ratio", col("total_cost").cast("double") / lit(budget.toDouble))
}
