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
}
