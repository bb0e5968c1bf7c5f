package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval lookup join — "which bracket(s) does this value
  * fall in": fact values against a dimension of `[lo, hi)` intervals
  * (price brackets, time windows, IP ranges, score bands). Naive Spark
  * plans the theta predicate `lo <= p AND p < hi` as a broadcast
  * NESTED-LOOP join — |facts| × |intervals| comparisons, the classic
  * accidental quadratic at 100 TB. This operator rewrites it to an
  * EQUI-join through bucketization (the standard range-join
  * optimization several SQL engines apply under range-join hints,
  * re-expressed with plain DataFrame ops):
  *
  *  - each interval explodes to the width-`w` buckets it overlaps
  *    (`sequence(floor(lo/w), floor((hi-1)/w))` — a pure projection of
  *    the SMALL side; blowup = interval span / w, chosen by the caller),
  *  - each point computes its single bucket `floor(p/w)`,
  *  - one hash equi-join on the bucket key + the exact residual filter.
  *
  * A point lies in exactly ONE bucket, so a (point, interval) match
  * surfaces exactly once — no post-join dedup. The exploded dimension
  * stays dimension-sized (× the bounded blowup) and BROADCASTS: the
  * fact side never shuffles at all. Degenerate spans (hi ≤ lo) explode
  * to zero buckets and match nothing, matching the `[lo, hi)` theta
  * semantics exactly.
  *
  * 100 TB shape: scan-side projection + broadcast hash join + codegen'd
  * residual — zero fact exchanges, cost ≡ one scan. If the interval
  * table itself is huge, the same construction runs as a shuffle
  * equi-join on the bucket key (both sides partition by bucket); the
  * operator takes `broadcastDim = false` for that case.
  */
object RangeJoin {

  /** Join `points` (any columns + `pointCol`, a numeric) with
    * `intervals` (any columns + `loCol`/`hiCol`, numerics; `[lo, hi)`
    * semantics) on containment. `bucketWidth` trades dimension blowup
    * (span/width rows per interval) against residual selectivity. */
  def bucketedRangeJoin(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long, broadcastDim: Boolean = true): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = lit(bucketWidth)
    // last bucket an [lo, hi) interval can touch: floor(hi/w), backed off
    // by one when hi sits exactly on a bucket boundary (hi is exclusive).
    // hi > lo then guarantees the sequence ascends — Spark's `sequence`
    // DESCENDS for inverted bounds, which would fabricate buckets.
    val bLo = floor(col(loCol) / w)
    val bHiRaw = floor(col(hiCol) / w)
    val bHi = when(col(hiCol) === bHiRaw * w, bHiRaw - 1).otherwise(bHiRaw)
    val dimExploded = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("_bucket", explode(sequence(bLo, bHi)))
    val dim = if (broadcastDim) broadcast(dimExploded) else dimExploded
    points
      .withColumn("_bucket", floor(col(pointCol) / w))
      .join(dim, Seq("_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }
}
