package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with last-observation-carried-forward — the
  * time-series normalization pass (sensor/metric feeds, feature-store
  * snapshots) that turns an irregular event log into a dense per-key
  * grid a downstream model can join on.
  *
  * The reference has no time-series surface at all; this is pure
  * pipeline tooling, built Spark-first:
  *
  *   1. bucket every observation with exact integer `div` (a float
  *      `floor(ts / step)` could misbucket at range extremes);
  *   2. keep the LAST observation per (key, bucket) — `row_number` over
  *      the (key, bucket) shuffle with a total tiebreak, so replays and
  *      retries pick the same row;
  *   3. per-key span → `explode(sequence(lo, hi))` generates the grid
  *      (output-bound cost: resampling's inherent size is the grid);
  *   4. grid ⟕ observations on (key, bucket), then
  *      `last(value, ignoreNulls)` over the per-key bucket order fills
  *      gaps forward.
  *
  * 100 TB shape: every exchange is keyed (key or (key, bucket)); the
  * LOCF window sorts per key bounded by that key's grid span — there is
  * no global sort and no driver materialization. The grid size is
  * span/step per key; callers pick `step` so the grid is the OUTPUT they
  * want, which bounds the explode by construction. */
object Resample {

  /** Dense per-key grid of `valueCol` carried forward.
    *
    * @param tsCol   integral event-time column (any fixed unit)
    * @param step    grid step in `tsCol` units (exact integer bucketing)
    * @param tieCol  total tiebreak among same-(key, ts) observations
    * @return (keyCol, bucket, valueCol) — one row per key per grid step
    *         between that key's first and last observation
    */
  def locfGrid(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      tieCol: String,
      step: Long): DataFrame = {
    require(step > 0, s"step must be positive: $step")
    val bucket: Column = expr(s"`$tsCol` div ${step}L")
    val obs = df.select(
      col(keyCol), bucket.as("bucket"), col(tsCol), col(tieCol), col(valueCol))

    val lastPerBucket = obs
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keyCol, "bucket")
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
      .filter(col("_rn") === 1)
      .select(col(keyCol), col("bucket"), col(valueCol))

    val grid = obs.groupBy(keyCol)
      .agg(min(col("bucket")).as("_lo"), max(col("bucket")).as("_hi"))
      .select(col(keyCol), explode(sequence(col("_lo"), col("_hi"))).as("bucket"))

    grid.join(lastPerBucket, Seq(keyCol, "bucket"), "left_outer")
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(
        Window.partitionBy(keyCol).orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Dense per-key grid with LINEAR interpolation between bracketing
    * observations — the numeric-feature counterpart of [[locfGrid]]
    * (LOCF is right for state-like values, interpolation for sampled
    * continuous signals). Same grid construction and the same single
    * keyed shuffle; gap buckets take
    * `v_prev + (v_next - v_prev) * (bucket - b_prev) / (b_next - b_prev)`
    * from the nearest real observation on each side (both always exist:
    * the grid spans each key's first..last OBSERVED bucket, and bucket
    * endpoints are observations). The fraction divides two small longs
    * as doubles in a fixed expression shape, so results are IEEE-exact
    * and engine-portable.
    *
    * 100 TB shape: identical to [[locfGrid]] — keyed exchanges only,
    * two per-key bounded window passes (prev-carrying and
    * next-carrying), output-bound grid explode. */
  def interpGrid(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      tieCol: String,
      step: Long): DataFrame = {
    require(step > 0, s"step must be positive: $step")
    val bucket: Column = expr(s"`$tsCol` div ${step}L")
    val obs = df.select(
      col(keyCol), bucket.as("bucket"), col(tsCol), col(tieCol), col(valueCol))

    val lastPerBucket = obs
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keyCol, "bucket")
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
      .filter(col("_rn") === 1)
      .select(col(keyCol), col("bucket"), col(valueCol))

    val grid = obs.groupBy(keyCol)
      .agg(min(col("bucket")).as("_lo"), max(col("bucket")).as("_hi"))
      .select(col(keyCol), explode(sequence(col("_lo"), col("_hi"))).as("bucket"))

    val wPrev = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // next-obs carry runs as a RUNNING frame over the REVERSED order:
    // Spark evaluates (currentRow, unboundedFollowing) frames by
    // rescanning to the partition end per row — O(span²) per key, 46 s
    // at sf0.1 — while running frames are incremental O(span)
    val wNext = Window.partitionBy(keyCol).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val markObs = when(col(valueCol).isNotNull,
      struct(col("bucket").as("b"), col(valueCol).as("v")))
    grid.join(lastPerBucket, Seq(keyCol, "bucket"), "left_outer")
      .withColumn("_prev", last(markObs, ignoreNulls = true).over(wPrev))
      .withColumn("_next", last(markObs, ignoreNulls = true).over(wNext))
      .withColumn(valueCol,
        when(col(valueCol).isNotNull, col(valueCol)).otherwise(
          col("_prev.v") + (col("_next.v") - col("_prev.v")) *
            ((col("bucket") - col("_prev.b")).cast("double") /
              (col("_next.b") - col("_prev.b")).cast("double"))))
      .drop("_prev", "_next")
  }
}
