package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling, in the hashed-feature
  * fixed-point form: score every raw document by how much its hashed
  * unigram profile resembles a TARGET slice of the corpus relative to
  * the raw corpus overall, then keep the top-scoring documents (DSIR,
  * Xie et al., NeurIPS'23 — the hashed n-gram variant; the engine here
  * only needs counting, hashing, and one broadcast join).
  *
  * Design for 100 TB:
  *   - the two feature distributions reduce to ≤ `buckets` rows each
  *     (one partial-agg pass over the tokenized corpus; bucket count is
  *     a parameter, 10⁴-10⁶, NOT vocabulary-sized) and BROADCAST back —
  *     the corpus itself never shuffles on a token key;
  *   - per-document scoring is then map-side: explode → broadcast-join →
  *     one groupBy on the document id (the only corpus-wide shuffle, on
  *     the same id key every downstream consumer uses).
  *
  * Fixed-point scoring: the usual Σ log p̂_target(f)/p̂_raw(f) is
  * replaced by Σ floor(scale · (1 + n_t(f)) / (1 + n_r(f))) — a
  * monotone likelihood-ratio score in EXACT integer arithmetic (one
  * integer multiply + one integer divide per feature), so ranking is
  * reproducible bit-for-bit across engines, partitionings, and reruns —
  * no float log whose summation order could flip low bits.
  */
object Dsir {

  /** First-8-hex-chars md5 bucket in [0, buckets) — non-negative, so
    * `%` agrees with DuckDB `('0x' || substr(md5(w), 1, 8))::BIGINT %`. */
  private def bucketOf(c: Column, buckets: Int): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % buckets

  /** (doc id, fixed-point importance score). `isTarget` marks the slice
    * whose distribution the score favors (e.g. a curated source or a
    * lang filter); docs where it holds still get scored like any other.
    * Documents with no tokens are absent from the result (score of an
    * empty sum; filter upstream if they must appear). */
  def importanceWeights(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int = 4096, scale: Long = 1000000L): DataFrame = {
    require(buckets > 0 && scale > 0, "buckets and scale must be positive")
    val words = docs.select(
        col(idCol),
        isTarget.as("is_target"),
        explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .withColumn("bucket", bucketOf(col("word"), buckets))
      .select(col(idCol), col("is_target"), col("bucket"))

    // both distributions in ONE pass over the tokens: conditional counts
    val dist = words.groupBy("bucket").agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("n_target"),
      count(lit(1)).as("n_raw"))

    words
      .join(broadcast(dist), "bucket")
      // `div`, not `/`: exact long division (DuckDB `//`); both operands
      // positive, so truncate == floor on both engines
      .withColumn("term",
        expr(s"(CAST($scale AS BIGINT) * (n_target + 1)) div (n_raw + 1)"))
      .groupBy(idCol)
      .agg(sum("term").as("dsir_score"))
  }
}
