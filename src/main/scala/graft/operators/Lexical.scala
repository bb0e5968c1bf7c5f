package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical relevance operators: BM25 top-k retrieval and bigram
  * language-model quality scoring. These complete the corpus-search
  * family — [[Similarity]] covers the embedding side (brute/LSH/IVF/
  * quantized); this is the term-statistics side every training-data
  * pipeline also runs (candidate sourcing by keyword, LM-based quality
  * filtering a la CCNet/Gopher's perplexity gates — Wenzek et al. 2020,
  * Rae et al. 2021; BM25 per Robertson & Zaragoza 2009).
  *
  * All scoring is FIXED-POINT INTEGER arithmetic (scale 10^6). Spark's
  * `div`/DuckDB's `//` agree on non-negative operands, so every score is
  * bit-identical across engines and the gate can hash-compare raw
  * values — the same trick the mixture planner and quantizer gates use.
  * `ln()` is deliberately absent: libm vs JVM log differ in final ulps,
  * which a hash gate cannot tolerate. BM25's idf therefore stays as the
  * (monotone) rational argument of the standard log idf — ranking
  * semantics are preserved because per-term monotone transforms keep
  * rare terms weighted above common ones; swap `ln` back in on a real
  * cluster if absolute score calibration matters.
  */
object Lexical {

  /** Fixed-point scale: scores are (value × 10^6) truncated. */
  val Scale = 1000000L

  /** BM25 top-k lexical retrieval (k1 = 1.2, b = 0.75, exact rationals:
    * k1 = 6/5, b = 3/4).
    *
    * Per query term t and doc d:
    * {{{
    *   tfpart = tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen))
    *          = 44·tf·T / (20·tf·T + 6·T + 18·len·N)      (avglen = T/N)
    *   idf    = (2N − 2df + 1) / (2df + 1)                 (un-logged)
    *   score  = Σ_t (tfpart_fp · idf_fp) div Scale
    * }}}
    * where N = corpus docs, T = corpus tokens — both folded into the
    * integer formula so no floating point ever appears.
    *
    * 100 TB shape: the corpus-sized frames never broadcast and shuffle
    * at most once. Postings (doc, word, tf, len) are built in one
    * explode+aggregate pass with the doc length attached AT EXPLODE TIME
    * (len is functionally dependent on doc_id, so grouping by it adds no
    * cardinality — this avoids a postings⋈lengths self-join). The query
    * vocabulary — small by definition — broadcasts and PRUNES the
    * postings before anything else touches them, so df-counting and
    * scoring run over matched rows only; df over the pruned frame is
    * query-vocab-bounded and re-broadcasts. The final top-k window
    * partitions by query_id over docs that matched ≥1 term, the same
    * bounded-window argument as [[TextCorpus.distinctiveTerms]].
    *
    * Long-overflow bound: Scale·44·tf·T < 2^63 requires tf·T < 2.1e11
    * (sf0.1: tf·T ≈ 100·2.7e5 ≈ 2.7e7 — vast margin). At cluster scale
    * divide T out via a precomputed fixed-point avglen, or lift the
    * arithmetic to DECIMAL(38,0) — both stay engine-exact.
    *
    * Returns (query_id, rank, doc_id, score_fp), rank 1..k per query by
    * (score desc, doc_id asc).
    */
  def bm25TopK(
      docs: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", queryTextCol: String = "query_text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // ONE tokenize pass (r17, guide §1.2): postings and the corpus
    // stats previously each ran the full split+trim over every document
    // — two full-text scans. The tokenized frame is pinned and feeds
    // both; n_docs/total_len semantics are unchanged because the pin
    // keeps one row per document (token-less and NULL-text docs
    // included — size(NULL array) stays -1 exactly as before).
    val tok = docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("_ws"))
      .localCheckpoint()
    val postings = tok
      .select(col("doc_id"), size(col("_ws")).cast("long").as("len"),
        explode(col("_ws")).as("word"))
      .groupBy("doc_id", "len", "word")
      .agg(count(lit(1)).as("tf"))
    val stats = tok.agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("_ws")).cast("long")).as("total_len"))
    val qwords = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col(queryTextCol)))).as("word"))
    // prune the corpus-sized postings to the query vocabulary FIRST;
    // matched feeds both the df roll-up and the scoring join, so pin it
    // (the AQE/ReuseExchange lesson from dedupSpans)
    val matched = postings
      .join(broadcast(qwords.select("word").distinct()), Seq("word"))
      .localCheckpoint()
    val dfq = matched.groupBy("word").agg(count(lit(1)).as("df"))
    val scored = matched
      .join(broadcast(dfq), Seq("word"))
      .join(broadcast(qwords), Seq("word"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib_fp", expr(
        s"""(($Scale * 44 * tf * total_len)
              div (20 * tf * total_len + 6 * total_len + 18 * len * n_docs))
            * (($Scale * (2 * n_docs - 2 * df + 1)) div (2 * df + 1))
            div $Scale"""))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib_fp").as("score_fp"))
    val byScore = Window.partitionBy("query_id")
      .orderBy(col("score_fp").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(byScore).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_fp")
  }

  /** Bigram language-model quality score with stupid backoff (Brants et
    * al. 2007, α = 2/5): fit token statistics on `fitDocs`, score every
    * document of `scoreDocs` by the average fixed-point conditional
    * probability of its token transitions:
    * {{{
    *   p(w2|w1) = c2(w1,w2)/c1(w1)        if the bigram was seen
    *            = α · c1(w2)/U            otherwise (unseen w2 → 0)
    * }}}
    * This is the hash-gateable stand-in for perplexity filtering: the
    * score is monotone in the geometric-ish fluency signal a KenLM gate
    * uses (CCNet), and a threshold on `lm_avg_fp` separates natural
    * word-soup from shuffled/abnormal token streams. Documents with
    * fewer than two tokens have no transitions and are absent by
    * construction.
    *
    * 100 TB shape: two explode+aggregate passes over the fit corpus
    * (unigram and bigram counts — both partial-aggregate map-side), then
    * ONE pass over the score corpus probing the count tables. The count
    * tables are vocabulary-bounded (unigrams) and distinct-transition-
    * bounded (bigrams ≤ fit tokens); they broadcast below
    * [[maxBroadcastCounts]] rows and fall back to shuffle hash joins on
    * the probe keys above it — the corpus-sized pair frame shuffles at
    * most once either way. Transitions are built per-document from the
    * token array (slice + element_at), NOT via a lag window — no
    * corpus-wide sort exists anywhere.
    *
    * Returns (doc_id, n_bigrams, hit_bigrams, lm_sum_fp, lm_avg_fp).
    */
  def bigramLmScore(
      fitDocs: DataFrame, scoreDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      maxBroadcastCounts: Long = 2000000L): DataFrame = {
    val uni = fitDocs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c1"))
      .localCheckpoint() // read by the total, both probes, and the gate count
    val total = uni.agg(sum("c1").as("u_total"))
    val bi = pairs(fitDocs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val fits = uni.count() <= maxBroadcastCounts
    def gated(d: DataFrame): DataFrame = if (fits) broadcast(d) else d
    val scoredPairs = pairs(scoreDocs, idCol, textCol)
      .join(gated(bi), Seq("w1", "w2"), "left")
      .join(gated(uni.select(col("word").as("w1"), col("c1").as("c1_w1"))),
        Seq("w1"), "left")
      .join(gated(uni.select(col("word").as("w2"), col("c1").as("c1_w2"))),
        Seq("w2"), "left")
      .crossJoin(broadcast(total))
      .withColumn("p_fp",
        when(col("c2").isNotNull, expr(s"($Scale * c2) div c1_w1"))
          .otherwise(expr(s"(2 * $Scale * coalesce(c1_w2, 0L)) div (5 * u_total)")))
    scoredPairs.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("c2").isNotNull, 1L).otherwise(0L)).as("hit_bigrams"),
        sum("p_fp").as("lm_sum_fp"))
      .withColumn("lm_avg_fp", expr("lm_sum_fp div n_bigrams"))
  }

  /** Feature-hashing (hashing trick, Weinberger et al. ICML'09) sparse
    * TF vectors: each token hashes to one of `dim` buckets with a ±1
    * sign from an independent hash bit, and the per-(doc, bucket) signed
    * counts form the sparse vector — the vocabulary-free bridge from
    * text to the [[Similarity]] operators (no vocab fit, no broadcast
    * dictionary, fixed dimensionality at any corpus size).
    *
    * Both hashes are md5-derived (the [[TextCorpus.shardedShuffle]]
    * trick: first 8 hex chars → non-negative BIGINT, so `%` is
    * floor-consistent across engines) — the gate hash-matches exactly.
    * Sparse (doc_id, bucket, tf_signed) rows, not assembled arrays:
    * downstream dot products join on bucket, and 100 TB of vectors
    * never materialize |dim|-wide dense rows for mostly-empty buckets.
    * One explode + one aggregate — the only shuffle is the count's. */
  def hashedTfVectors(
      docs: DataFrame, dim: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val h = md5(col("word"))
    docs
      .select(col(idCol).as("doc_id"), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .withColumn("bucket",
        conv(substring(h, 1, 8), 16, 10).cast("long") % dim)
      .withColumn("sign",
        when(conv(substring(h, 9, 1), 16, 10).cast("long") % 2 === 0, 1L)
          .otherwise(-1L))
      .groupBy("doc_id", "bucket")
      .agg(sum("sign").as("tf_signed"))
  }

  /** Linear-classifier inference over hashed-TF features — the
    * fastText-style quality/topic filter every LLM corpus build runs at
    * full scale (Joulin et al. 2017; the CCNet/RedPajama quality-model
    * pass): `logit(d) = Σ_b tf_signed(d, b) · w_b` over the same
    * `dim`-bucket signed feature hashing as [[hashedTfVectors]], with
    * `keep = logit > 0`. Weights here are derived deterministically from
    * the bucket id (Knuth multiplicative hash mod 17, centered on 0) so
    * the gate is engine-exact; a TRAINED model substitutes its integer-
    * quantized weight vector as a `dim`-entry literal map — same plan.
    *
    * 100 TB shape: inference is a pure per-row computation — the weight
    * lives in the expression (a real model's vector broadcasts as
    * literals, k·1 values, the IVF/PQ idiom), so the ONLY shuffle is the
    * per-doc partial-aggregated sum, and nothing about the model adds
    * data movement. This is why linear-over-hashed-features is the only
    * classifier family that runs over a whole crawl: scoring cost ≡ one
    * scan. Per-token contribution `sign·w_bucket` folds at explode time,
    * so the (doc, bucket) intermediate never materializes. */
  def hashedLinearLogit(
      docs: DataFrame, dim: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val h = md5(col("word"))
    val bucket = conv(substring(h, 1, 8), 16, 10).cast("long") % dim
    val sign =
      when(conv(substring(h, 9, 1), 16, 10).cast("long") % 2 === 0, 1L)
        .otherwise(-1L)
    val weight = (bucket * lit(2654435761L)) % 17L - 8L
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .select(col("doc_id"), (sign * weight).as("contrib"))
      .groupBy("doc_id")
      .agg(sum("contrib").as("logit"))
      .withColumn("keep", col("logit") > 0L)
  }

  /** Adjacent token transitions of each document: (doc_id, w1, w2), one
    * row per position — from the token array, so the only shuffle a
    * caller pays is its own aggregation. */
  /** Interpolated Kneser–Ney smoothed bigram model (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated form — the production smoothing
    * behind KenLM-style quality filters) with absolute discount
    * D = 3/4:
    *
    *   p(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *            + D·N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)
    *
    * where N1+(w1·) counts distinct continuations of w1, N1+(·w2)
    * counts distinct left-contexts of w2 (the continuation probability
    * that makes KN beat plain backoff: "francisco" is frequent but
    * follows only "san"), and N1+(··) is the bigram type count.
    *
    * Emitted as an EXACT integer rational per observed bigram — scale
    * both sides by 4·c(w1·)·N1+(··) and D = 3/4 is the only
    * non-integer, cleared by the 4:
    *
    *   kn_num = max(4·c(w1w2) − 3, 0)·N1+(··) + 3·N1+(w1·)·N1+(·w2)
    *   kn_den = 4·c(w1·)·N1+(··)
    *
    * so the gate hash-compares digits, never engine floats; consumers
    * divide (or log) at render time. Accumulated in decimal(38,0):
    * c(w1·)·N1+(··) passes int64 on a 100 TB corpus.
    *
    * 100 TB shape: ONE data-sized pass (the bigram count, map-side
    * combined); everything after — left totals, continuation counts,
    * the one-row type total (broadcast), the three joins — runs on the
    * reduced |bigram types| frame. `minCount` bounds the OUTPUT, not
    * the model: counts below it still shape the smoothing. */
  def knBigramModel(
      fitDocs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minCount: Long = 1L): DataFrame = {
    val d = "decimal(38,0)"
    val bi = pairs(fitDocs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint() // feeds left totals, continuation counts, the type total, and the output
    val left = bi.groupBy("w1").agg(
      sum("c2").as("c1w1"), count(lit(1)).as("n_follow"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("n_prec"))
    val types = bi.agg(count(lit(1)).as("n_types"))
    bi.filter(col("c2") >= minCount)
      .join(left, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c2"),
        (greatest(col("c2") * 4 - 3, lit(0L)).cast(d) * col("n_types") +
          lit(3).cast(d) * col("n_follow") * col("n_prec")).cast(d).as("kn_num"),
        (lit(4).cast(d) * col("c1w1") * col("n_types")).cast(d).as("kn_den"))
  }

  /** LM-based quality scoring of documents against a fitted
    * [[knBigramModel]] — the filtering decision a CCNet-style pipeline
    * (Wenzek et al. 2020) makes from a language model, in EXACT integer
    * arithmetic: per document, its bigram count, how many bigrams the
    * model has NEVER seen (`n_unseen` — the OOV-transition rate), and
    * how many seen bigrams are RARE, i.e. have interpolated-KN
    * probability below `tNum/tDen` (cross-multiplied —
    * `kn_num·tDen < kn_den·tNum` in decimal(38,0) — so no division and
    * no float ever happens; both engines agree digit for digit). A
    * perplexity threshold is monotone in these counts on the seen set;
    * the float log-sum itself is deliberately NOT emitted — engine
    * float accumulation orders differ, and the filter DECISION is what
    * a pipeline acts on. Fit on held-out-clean data, score everything:
    * high `n_unseen + n_rare` share marks boilerplate, gibberish, or
    * out-of-domain text.
    *
    * 100 TB shape: scoring is ONE pass over the corpus bigrams joined
    * against the MODEL — a |bigram types| frame (broadcastable for
    * bounded vocabularies; a plain keyed shuffle join otherwise) — then
    * one map-side-combined groupBy(doc). Documents with fewer than two
    * tokens have no transitions and produce no row (same contract as
    * [[knBigramModel]]'s fit). */
  def knRareBigramRate(
      docs: DataFrame, model: DataFrame, tNum: Long, tDen: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(tNum >= 0 && tDen >= 1, s"need threshold tNum/tDen >= 0: $tNum/$tDen")
    val d = "decimal(38,0)"
    pairs(docs, idCol, textCol)
      .join(model.select(col("w1"), col("w2"), col("kn_num"), col("kn_den")),
        Seq("w1", "w2"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("kn_num").isNull, 1L).otherwise(0L)).as("n_unseen"),
        sum(when(col("kn_num").isNotNull &&
            col("kn_num") * lit(tDen).cast(d) < col("kn_den") * lit(tNum).cast(d),
          1L).otherwise(0L)).as("n_rare"))
  }

  private def pairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("ws"),
        posexplode(expr("slice(ws, 1, size(ws) - 1)")))
      .select(col("doc_id"), col("col").as("w1"),
        element_at(col("ws"), col("pos") + 2).as("w2"))
}
