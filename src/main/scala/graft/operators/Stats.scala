package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics for corpus analysis — the numbers a pipeline
  * reads before setting its filter thresholds (length cutoffs, quality
  * bands, packing budgets). */
object Stats {

  /** Exact per-group quantiles by SORT RANK (lower discrete quantile:
    * the element at `floor(p·(n−1)) + 1` in ascending order), one output
    * row per (group, p). Rank selection instead of interpolation makes
    * the result an actual data element and the arithmetic engine-exact:
    * `p·(n−1)` is one IEEE multiply both engines evaluate identically,
    * and everything else is integer — no quantile-algorithm variation
    * (R-7 vs t-digest vs GK) can leak into the values.
    *
    * Cost shape: one shuffle on the group key for the ranking window
    * (sort runs bounded by group size, the stratifiedSample shape); the
    * per-group counts reduce to |groups| rows and the (group, p, rank)
    * target table BROADCASTS back onto the ranked rows — no second
    * big-side shuffle and no |ps|× row multiplication. Ties need no
    * tiebreaker: any permutation of equal values yields the same element
    * at a given rank. For quantiles over ONE corpus-spanning group, use
    * `approx_percentile` instead and give up the exactness. */
  def groupedQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "ps must be in [0, 1]")
    val vals = df.select(col(groupCol), col(valueCol))
    val ranked = vals.withColumn("rn",
      row_number().over(Window.partitionBy(groupCol).orderBy(col(valueCol).asc)).cast("long"))
    val targets = vals.groupBy(groupCol).agg(count(lit(1)).as("n_rows"))
      .select(col(groupCol), col("n_rows"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("rn", floor(col("p") * (col("n_rows") - 1)) + 1)
    ranked.join(broadcast(targets), Seq(groupCol, "rn"))
      .select(col(groupCol), col("p"), col("n_rows"), col(valueCol).as("value"))
  }
}
