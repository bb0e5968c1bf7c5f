package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design: the baseline is brute-force top-k with the query set
  * broadcast — one pass over the corpus, no corpus shuffle, per-query
  * top-k via window rank on (query, score). That is already the right
  * plan for "N queries × 100 TB corpus" when N is small. The scale path
  * for large N is sign-LSH bucketing ([[signBits]] / [[lshTopK]]): both
  * sides hash to buckets, the join touches only same-bucket pairs.
  * Dot products are `zip_with`+`aggregate` column expressions —
  * codegen'd, strict left-to-right summation (deterministic results).
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double in
    * element order (deterministic). Native Catalyst expression
    * ([[graft.functions.DotProductF]]) — same left-to-right math as the
    * `zip_with`+`aggregate` HOF form (bit-identical results) but one
    * JIT'd loop per pair instead of per-element interpreted lambdas. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Brute-force cosine top-k: for each query row, the k nearest corpus
    * rows. Queries are broadcast; the corpus streams through once.
    * Output: (query_id, neighbor_id, score, rank). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      metric: (Column, Column) => Column = cosine): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", metric(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Sign-LSH bucket code: the first `bits` dimensions' signs packed into
    * a long — a deterministic hyperplane sketch (axis-aligned planes).
    * Fewer bits ⇒ bigger buckets ⇒ higher recall, more compute. */
  def signBits(vec: Column, bits: Int = 8): Column =
    aggregate(
      zip_with(slice(vec, 1, bits), sequence(lit(0), lit(bits - 1)),
        (x, i) => when(x > 0, call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))

  /** LSH-bucketed ANN top-k: candidates limited to the query's bucket.
    * Trades recall for a join that only touches same-bucket pairs —
    * the 100 TB path when the query set itself is large. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 8): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      signBits(col(vecCol), bits).as("bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      signBits(col(vecCol), bits).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * LSH-bucketed so only same-bucket pairs are compared. */
  def cosineNearDupPairs(
      df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 8): DataFrame = {
    val v = df.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      signBits(col(vecCol), bits).as("bucket"))
    val l = v.as("l"); val r = v.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("score", cosine(col("l.vec"), col("r.vec")))
      .filter(col("score") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("score"))
  }
}
