package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (2-D skyline) selection: the rows not strictly
  * dominated on two maximize-dimensions — the "keep the best trade-offs"
  * filter a pipeline runs when no single quality score exists (e.g. long
  * documents vs. vocabulary-rich documents: keep everything on the
  * frontier, drop everything some other doc beats on both axes).
  *
  * Formulation: with both dimensions maximized, a row (x, y) survives iff
  *   max{ y' : x' > x } < y   (nothing strictly longer is at least as rich)
  *   ∧ max{ y' : x' = x } = y (nothing equally long is strictly richer).
  * Ties on BOTH axes survive together (identical points don't dominate
  * each other) — the same semantics as the NOT EXISTS dominance test,
  * which the oracle states directly.
  *
  * Cost shape: two windows partitioned by the group key — one
  * value-range frame ordered by x, one partition-max over (group, x).
  * Sort runs are bounded by group size (the [[Stats.groupedQuantiles]]
  * shape): ONE shuffle of the input on the group key, nothing else moves.
  * For a corpus-spanning skyline (no group key) do NOT drop the
  * partitioning — pre-bucket x into ranges, take per-bucket local
  * skylines with this operator (bucket = group), then merge: a bucket's
  * rows can only be dominated by higher-x buckets, so the exact pass
  * runs on the union of local frontiers — Σ per-bucket frontier sizes,
  * orders of magnitude smaller than the corpus. */
object Skyline {

  /** Per-group 2-D skyline, both dimensions maximized. Emits
    * (groupCol, idCol, xCol, yCol) for frontier rows. */
  def paretoFrontier(
      df: DataFrame, groupCol: String, idCol: String,
      xCol: String, yCol: String): DataFrame = {
    val wGt = Window.partitionBy(groupCol).orderBy(col(xCol).asc)
      .rangeBetween(1L, Window.unboundedFollowing)
    val wEq = Window.partitionBy(groupCol, xCol)
    df.select(col(groupCol), col(idCol), col(xCol), col(yCol))
      .withColumn("ygt", max(col(yCol)).over(wGt))
      .withColumn("yeq", max(col(yCol)).over(wEq))
      .filter((col("ygt").isNull || col("ygt") < col(yCol)) && col("yeq") <= col(yCol))
      .select(col(groupCol), col(idCol), col(xCol), col(yCol))
  }
}
