package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion — the step a RAG / search stack runs after
  * its per-modality retrievers: merge the lexical top-k
  * ([[Lexical.bm25TopK]]) and the vector top-k ([[Similarity]]'s ANN
  * family) into one ranking per query. Reciprocal Rank Fusion
  * (Cormack, Clarke & Büttcher, SIGIR'09): each list contributes
  * 1/(K + rank) per document; K=60 per the paper. Rank-based fusion
  * needs no score calibration between modalities — BM25 fixed-point
  * scores and float dot products fuse without any comparable scale,
  * which is exactly why RRF is the default in production hybrid search.
  *
  * Scores are computed in integer fixed point — `floor(10^12 / (K +
  * rank))` summed as longs — so fusion is bit-exact and
  * oracle-checkable in any engine (the float formulation differs only
  * below the 12th decimal digit and can't flip a rank that fixed point
  * preserves; ties break on doc id).
  *
  * 100 TB shape: inputs are ALREADY query-bounded candidate lists (k
  * rows per query per retriever — the corpus never reaches this
  * operator), so the union + one aggregation on (query, doc) + one
  * per-query window run on |queries| × Σk rows total. The heavy lifting
  * stays in the upstream retrievers, which carry their own scale
  * arguments (query-vocab-pruned postings, LSH/IVF bucketing).
  */
object Retrieval {

  /** Fixed-point scale for 1/(K+rank): 10^12 keeps 1/(60+1000) to ~9
    * significant digits — far beyond any realistic k. */
  val RrfScale: Long = 1000000000000L

  /** Fuse per-query rankings into one RRF-ordered top-k. Each input
    * frame must carry (`query_id`, `doc_id`, `rank`) with rank ≥ 1;
    * documents absent from a list simply contribute nothing (the
    * SIGIR'09 formulation). Output: (query_id, rank, doc_id, rrf_fp)
    * with rank reassigned by descending fused score, ties on doc_id. */
  def rrfFuse(rankings: Seq[DataFrame], rrfK: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(rrfK >= 0 && topK > 0)
    val u = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_.unionAll(_))
    val fused = u
      .groupBy("query_id", "doc_id")
      .agg(sum(expr(s"${RrfScale}L div (${rrfK}L + rank)")).as("rrf_fp"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf_fp").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "doc_id", "rrf_fp")
  }

  /** Top-k agreement between two rankings of the same query set — the
    * eval that DECIDES whether a cheaper retrieval path ships: how much
    * of the exact top-k does the int8/IVF/LSH path keep per query
    * (recall@k = n_common / k, emitted as exact integers so the gate
    * never divides)? The same measurement ranks reranker configs,
    * quantization levels, and index parameter sweeps; aggregate
    * downstream (`avg(n_common)/k` is mean recall@k).
    *
    * Inputs carry (queryCol, idCol, rankCol) with rank ≥ 1, the shape
    * every retrieval operator here emits. Output per query: `n_a`,
    * `n_b` (list sizes at cutoff k — smaller than k only when a query
    * has fewer candidates than k) and `n_common` (overlap size),
    * including queries with zero overlap.
    *
    * 100 TB shape: inputs are already k-bounded per query (the corpus
    * never reaches this operator — the retrievers carry the scale
    * argument); the intersection is one (query, id) co-partitioned
    * equi-join plus |queries|-sized aggregates. */
  def rankingOverlap(
      a: DataFrame, b: DataFrame, k: Int,
      queryCol: String = "query_id", idCol: String = "neighbor_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, "need a positive cutoff k")
    def top(df: DataFrame) = df.filter(col(rankCol) <= k)
      .select(col(queryCol).as("query_id"), col(idCol).as("_id"))
    val ta = top(a)
    val tb = top(b)
    val na = ta.groupBy("query_id").agg(count(lit(1)).as("n_a"))
    val nb = tb.groupBy("query_id").agg(count(lit(1)).as("n_b"))
    val common = ta.join(tb, Seq("query_id", "_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_common"))
    na.join(nb, Seq("query_id"), "full")
      .join(common, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_a", "n_b", "n_common"))
  }

  /** Relevance-judged ranking eval — MRR and hits@k, the standard IR /
    * RAG-retriever report card (Voorhees, TREC-8 1999: reciprocal rank
    * of the FIRST relevant result, averaged over queries). Unlike
    * [[rankingOverlap]] (which compares two RANKINGS), this scores one
    * ranking against a RELEVANCE SET (`qrels`: one row per relevant
    * (query, doc) pair — human labels, click data, or a planted
    * ground truth).
    *
    * Per query (cut to rank ≤ k): `n_rel` = relevant docs retrieved in
    * the top k, `first_rank` = rank of the first relevant one (0 when
    * none — never NULL, so downstream averages need no null handling),
    * `rr_ppm` = floor(10^6 / first_rank) (0 when none), and `hit` = 1
    * iff any relevant doc made the cut. All exact integers — MRR =
    * avg(rr_ppm)/10^6 and hit-rate@k = avg(hit) downstream; no
    * engine-varying float division inside the operator.
    *
    * `queries` is the evaluation's QUERY UNIVERSE: queries with no
    * ranking rows at all (the retriever returned nothing) still emit a
    * (0, 0, 0, 0) row, so a failing retriever drags the average down
    * instead of silently vanishing from it — the TREC convention.
    * Pass None to score only the queries present in `ranking` (safe
    * when the retriever guarantees a row per query, as ANN top-k
    * paths here do).
    *
    * 100 TB shape: `ranking` is already k-bounded per query (the
    * corpus stays in the upstream retriever) and `qrels` is label-sized
    * by nature; the join is one (query, id) equi-join between two
    * bounded frames and the rollup one |queries|-sized aggregate. */
  def relevanceEval(
      ranking: DataFrame, qrels: DataFrame, k: Int,
      queryCol: String = "query_id", idCol: String = "neighbor_id",
      rankCol: String = "rank",
      queries: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "need a positive cutoff k")
    // dedup the ranking on (query, doc) keeping the best rank: a
    // retriever emitting the same doc under two ranks inside the top-k
    // would otherwise double-count n_rel (first_rank stays plausible —
    // a silent metric inflation, not an error). qrels gets the same
    // distinct() below, so both sides are set-semantics.
    val top = ranking.filter(col(rankCol) <= k)
      .select(col(queryCol).as("query_id"), col(idCol).as("_id"),
        col(rankCol).cast("long").as("_rank"))
      .groupBy("query_id", "_id")
      .agg(min("_rank").as("_rank"))
    val rel = qrels.select(col(queryCol).as("query_id"), col(idCol).as("_id"))
      .distinct()
      .withColumn("_rel", lit(1L))
    val perQuery = top.join(rel, Seq("query_id", "_id"), "left")
      .groupBy("query_id")
      .agg(
        sum(coalesce(col("_rel"), lit(0L))).as("n_rel"),
        coalesce(min(when(col("_rel") === 1L, col("_rank"))), lit(0L))
          .as("first_rank"))
    val universed = queries match {
      case Some(q) =>
        q.select(col(queryCol).as("query_id")).distinct()
          .join(perQuery, Seq("query_id"), "left")
          .na.fill(0L, Seq("n_rel", "first_rank"))
      case None => perQuery
    }
    universed.select(
      col("query_id"),
      col("n_rel"),
      col("first_rank"),
      when(col("first_rank") > 0L, expr("1000000L div first_rank"))
        .otherwise(0L).as("rr_ppm"),
      when(col("n_rel") > 0L, 1L).otherwise(0L).as("hit"))
  }
}
