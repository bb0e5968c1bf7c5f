package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text operators for training-data pipelines — the stages
  * that look at word statistics and cross-document structure rather than
  * one document at a time ([[TextAnalysis]] covers those):
  *
  *  - repetition stats (the Gopher/MassiveText-style quality signals:
  *    duplicate-word and top-word coverage, emitted as INTEGER counts so
  *    gates hash exactly and consumers derive whatever ratios they want),
  *  - corpus-wide top n-grams (the classic distributed word-count),
  *  - cross-source exact-overlap matrix (which sources copy each other),
  *  - deterministic sharded shuffle (reproducible training order without
  *    a global sort), and
  *  - text normalization (canonicalization before dedup).
  *
  * Everything is `org.apache.spark.sql.functions` + one explode/groupBy
  * tree per operator — partial aggregation does the heavy lifting, no
  * UDFs, no driver loops. Ref for the data model being served:
  * the reference's message log has no text ops at all; this family is the
  * pipeline layer SURVEY §2 marks "beyond the reference".
  */
object TextCorpus {

  /** Canonical form for dedup: lowercase, strip non-alphanumerics to
    * spaces, collapse space runs, trim. Identical regex semantics in
    * Spark and DuckDB (`[^a-z0-9 ]+` / `' +'` are dialect-neutral). */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]+", " "), " +", " "))

  /** (doc_id, norm_digest, n_words): the canonicalized-text digest that
    * exact dedup should group on (so `Foo, bar!` and `foo bar` collide),
    * plus the post-normalization word count. Pure projection — one pass
    * over the scan, no shuffle, codegen'd at any scale. */
  def normalizeDocs(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = normalized(col(textCol))
    docs.select(
      col("doc_id"),
      md5(norm).as("norm_digest"),
      size(split(norm, " ")).cast("long").as("n_words"))
  }

  /** Per-document word-repetition counters (Gopher rules §A1.3 use the
    * derived fractions): total words, distinct words, and the count of
    * the most frequent word. One explode + two-level aggregation — the
    * (doc_id, word) partial aggregate combines map-side, and the second
    * shuffle is on the already-partitioned doc_id, so at 100 TB this is
    * the word-count shape with its usual linear scaling. Counts, not
    * ratios, so the gate hash is exact (`dup_word_frac = 1 -
    * distinct/total`, `top_word_frac = top/total` downstream). */
  def repetitionStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum("cnt").as("total_words"),
        count(lit(1)).as("distinct_words"),
        max("cnt").as("top_word_count"))

  /** Word n-grams of an ALREADY-MATERIALIZED token-array attribute,
    * EMPTY below n words (unlike [[TextAnalysis.wordNgrams]], which
    * floors at one truncated gram — fine for shingling, wrong for
    * counting). Callers must project the token array to a column
    * first: HOF lambdas are interpreted, so a lambda body referencing
    * a raw split() expression re-tokenizes the document per element
    * (the collocations O(words²) finding, r16). */
  private def strictWordNgrams(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(
        sequence(lit(0), size(ts) - n),
        i => array_join(slice(ts, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Corpus-wide top-k word n-grams with occurrence counts, ties broken
    * by gram text so the result is deterministic. explode → partial-agg
    * count → global top-k (Spark turns the orderBy+limit into a
    * TakeOrderedAndProject — only k rows ever reach the driver side of
    * the final exchange). */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 20, textCol: String = "text"): DataFrame =
    docs
      .select(TextAnalysis.tokens(col(textCol)).as("_ts"))
      .select(explode(strictWordNgrams(col("_ts"), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(k)

  /** Collocation screen — adjacent-token pairs whose co-occurrence
    * beats independence by an integer-percent LIFT margin: keep
    * (w1, w2) when pair_n ≥ minCount and 100·pair_n·total ≥
    * minLiftPct·left_n·right_n, i.e. PMI ≥ log(minLiftPct/100), with
    * the PMI logarithm never evaluated — the cross-multiplied
    * comparison stays exact-integer (house rule), and the emitted
    * counts let consumers render the classic PMI/log-lift score. The
    * association-mining view of bigrams: [[topNgrams]] ranks by raw
    * frequency ("of the" wins), THIS finds pairs that are glued
    * together ("los angeles"), the phrase detector feeding tokenizer
    * vocab building and stop-phrase lists.
    *
    * Marginals are as-left/as-right counts over the SAME pair frame, so
    * the identity Σ_w1 left_n = Σ_w2 right_n = total holds exactly and
    * no second corpus pass exists: the explode+count reduces the corpus
    * to |pair-vocab| rows, and both marginals, the total, and the screen
    * run on that reduced frame (two reduced-frame joins + one broadcast
    * scalar). The lift products run in decimal(38,0) — at 100 TB,
    * pair_n·total reaches ~10²⁶, far past int64. */
  def collocations(
      docs: DataFrame, minCount: Long, minLiftPct: Long,
      textCol: String = "text"): DataFrame = {
    require(minCount >= 1 && minLiftPct >= 1)
    // the token array MUST be projected to an attribute before the
    // lambda uses it: higher-order functions are interpreted
    // (CodegenFallback), so a lambda body referencing the raw split
    // expression re-tokenizes the document PER ELEMENT — O(words²) per
    // document, measured 6.5 s vs 0.3 s at sf0.1 (r16, guide §1.2)
    val pairs = docs
      .select(TextAnalysis.tokens(lower(col(textCol))).as("_ts"))
      .select(
        explode(when(size(col("_ts")) >= 2,
          transform(sequence(lit(0), size(col("_ts")) - 2),
            i => struct(element_at(col("_ts"), i + 1).as("w1"),
              element_at(col("_ts"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val pc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("pair_n"))
      .localCheckpoint() // reduced |pair-vocab| frame; marginals + join + screen all reuse it
    val lm = pc.groupBy("w1").agg(sum("pair_n").as("left_n"))
    val rm = pc.groupBy("w2").agg(sum("pair_n").as("right_n"))
    val tot = pc.agg(sum("pair_n").as("total_pairs"))
    val d = "decimal(38,0)"
    pc.join(lm, "w1").join(rm, "w2").crossJoin(broadcast(tot))
      .filter(col("pair_n") >= minCount &&
        col("pair_n").cast(d) * col("total_pairs") * 100L >=
          lit(minLiftPct).cast(d) * col("left_n").cast(d) * col("right_n"))
      .select("w1", "w2", "pair_n", "left_n", "right_n", "total_pairs")
  }

  /** Which sources share byte-identical texts: (source_a, source_b,
    * shared_texts) for source pairs that contain at least one common
    * text digest — the provenance view of exact dedup (who copies
    * whom), and the cheap first look at benchmark cross-contamination
    * between corpus slices. Shuffles only DISTINCT 16-byte digests per
    * source; the self-join is digest-co-partitioned; output is at most
    * |sources|² rows. */
  def sourceOverlap(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val h = docs.select(md5(col(textCol)).as("digest"), col("source")).distinct()
    h.as("a").join(h.as("b"),
        col("a.digest") === col("b.digest") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_texts"))
  }

  /** End-to-end corpus quality filter: the cheap-pass verdict that
    * training pipelines run before expensive model-based scoring,
    * composing [[TextAnalysis.languageId]], [[TextAnalysis.qualityScore]]
    * and the [[repetitionStats]] repetition signal into per-doc flag bits
    * (1 = language not allowed, 2 = quality below threshold,
    * 4 = top-word coverage above threshold; keep ⇔ flags = 0).
    *
    * The repetition threshold compares with integer cross-multiplication
    * (`top_word_count * 100 > total_words * maxTopWordPct`) — no float
    * division, so the verdict is bit-exact across engines. The scalar
    * signals are one projection over the scan; repetition adds the
    * word-count aggregation tree and a doc_id join (both sides already
    * partitioned by doc_id after the aggregate). */
  def qualityFlags(
      docs: DataFrame,
      allowedLangs: Seq[String] = Seq("en", "de", "fr", "es", "zh"),
      minQuality: Double = 0.25,
      maxTopWordPct: Int = 12,
      textCol: String = "text"): DataFrame = {
    val rep = repetitionStats(docs, textCol)
    val scalar = docs.select(
      col("doc_id"),
      TextAnalysis.languageId(col(textCol)).as("lang_id"),
      TextAnalysis.qualityScore(col(textCol)).as("quality"))
    scalar.join(rep, "doc_id")
      .select(
        col("doc_id"),
        (when(col("lang_id").isin(allowedLangs: _*), 0).otherwise(1) +
          when(col("quality") >= minQuality, 0).otherwise(2) +
          when(col("top_word_count") * 100 <= col("total_words") * maxTopWordPct, 0)
            .otherwise(4)).as("flags"))
      .withColumn("keep", col("flags") === 0)
  }

  /** Exact-substring (span) dedup — the cross-document "deduplicating
    * training data" pass (Lee et al. 2021's ExactSubstr, re-expressed
    * relationally): any word n-gram span that occurs in `minDocs` or
    * more DISTINCT documents is duplicated content; the document with
    * the smallest id keeps its copy (the canonical occurrence, same
    * keep-min rule as [[Dedup.exactSurvivors]]) and every other
    * document has the covered words stripped. Catches the
    * copied-paragraph / shared-boilerplate duplication that
    * document-level dedup (exact or MinHash) misses when the rest of
    * the document differs.
    *
    * Output per input document: `doc_id`, `kept_text` (the surviving
    * words, space-joined — empty when the whole doc was duplicated
    * elsewhere-owned content), `removed_words`, `removed_spans`.
    *
    * Shape at 100 TB: the span explode is L−n+1 rows per L-word doc but
    * shuffles only (doc_id, pos, 8-byte span hash), and it is
    * materialized ONCE (`localCheckpoint`, the [[Dedup.nearDupPairs]]
    * pattern): both consumers — the span-stats aggregation and the
    * flagged-occurrence probe — read the executor-cached occurrence
    * blocks instead of re-running the explode scan (AQE's broadcast
    * conversions defeat ReuseExchange here, so without materialization
    * the corpus would be scanned once per consumer). Everything after is
    * keyed by doc_id: two co-partitioned aggregations and a left join
    * back to the token arrays (one further corpus scan). A
    * pathologically hot span (site-wide boilerplate) skews the probe
    * side only — AQE's skew-join split handles it, and the stats side
    * stays one row per span. No driver state, no UDFs — the strip itself
    * is a codegen'd higher-order `filter` over the token array.
    * `materialize = false` gives the fully-lazy plan for corpora too
    * large to spill their occurrence rows to executor disk. */
  def dedupSpans(
      docs: DataFrame, n: Int = 8, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      materialize: Boolean = true): DataFrame = {
    require(n >= 2, "span length must be at least 2 words")
    require(minDocs >= 2, "a span needs at least 2 documents to be a duplicate")
    val base = docs.select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("ws"))
    val spans = when(size(col("ws")) >= n,
      transform(
        sequence(lit(0), size(col("ws")) - n),
        i => array_join(slice(col("ws"), i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    // (doc_id, 0-based start pos, span hash) — one row per span occurrence
    val occ0 = base
      .select(col("doc_id"), posexplode(spans))
      .select(col("doc_id"), col("pos"), xxhash64(col("col")).as("h"))
    val occ = if (materialize) occ0.localCheckpoint() else occ0
    val dupStats = occ
      .groupBy("h")
      .agg(count_distinct(col("doc_id")).as("n_docs"), min("doc_id").as("owner"))
      .filter(col("n_docs") >= minDocs)
    // occurrences of duplicated spans OUTSIDE their owner document
    val flagged = occ.join(dupStats, "h")
      .filter(col("doc_id") =!= col("owner"))
      .select("doc_id", "pos")
    val perDoc = flagged.groupBy("doc_id").agg(count(lit(1)).as("removed_spans"))
    // the distinct word positions covered by any flagged span
    val covered = flagged
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .groupBy("doc_id").agg(collect_set("p").as("cps"))
    val kept = when(col("cps").isNull, col("ws"))
      .otherwise(filter(col("ws"), (_, i) => !array_contains(col("cps"), i)))
    base.join(covered, Seq("doc_id"), "left").join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        array_join(kept, " ").as("kept_text"),
        coalesce(size(col("cps")).cast("long"), lit(0L)).as("removed_words"),
        coalesce(col("removed_spans"), lit(0L)).as("removed_spans"))
  }

  /** Intra-document paragraph dedup — the CCNet-style cleaning pass
    * that removes REPEATED paragraphs within one document (navigation
    * boilerplate, duplicated footers, scraper stutter) while keeping
    * the first occurrence in order. Cross-document duplication is
    * [[dedupSpans]]' job; this one never looks outside the row.
    *
    * Pure projection: split on the literal separator, keep elements
    * whose first occurrence is their own position (a codegen'd
    * higher-order `filter` — quadratic in paragraphs-per-doc, which is
    * dozens, not thousands), re-join. ZERO shuffle at any corpus size —
    * the whole operator rides the scan, unlike a groupBy(doc, para)
    * formulation that would shuffle every paragraph of 100 TB twice.
    * Output: (id, kept_text, removed_paras). */
  def dedupParagraphs(
      docs: DataFrame, sep: String = "\n",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    val ps = split(col(textCol), java.util.regex.Pattern.quote(sep))
    def firstOccurrences(c: Column): Column =
      filter(c, (x, i) => array_position(slice(c, lit(1), i), x) === 0)
    docs.select(
      col(idCol),
      array_join(firstOccurrences(ps), sep).as("kept_text"),
      (size(ps) - size(firstOccurrences(ps))).cast("long").as("removed_paras"))
  }

  /** Per-source corpus datacard — the summary a pipeline publishes with a
    * training mix: document/token/char volumes, how many documents share
    * their exact text with ANY other document corpus-wide (the
    * cross-source copying signal `sourceOverlap` details), language
    * spread, and the dominant language (ties to the lexicographically
    * first). All counts INTEGER and the mode string-ordered, so the gate
    * hashes exactly.
    *
    * TWO corpus scans, not one per column family: volumes and the
    * language mode share a single (source, lang) aggregation tree
    * (partial-aggregated map-side, re-grouped to |sources| rows); only
    * the dup count needs its own pass, because its shuffle key is the
    * 16-byte content digest. The per-source frames that meet at the end
    * are |sources|-sized, so the final joins are broadcasts at any
    * corpus size. */
  def corpusReport(
      docs: DataFrame, sourceCol: String = "source", langCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(
      col(sourceCol).as("source"), col(langCol).as("lang"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
      length(col(textCol)).cast("long").as("n_chars"),
      md5(col(textCol)).as("digest"))
    val langRank = Window.partitionBy("source")
      .orderBy(col("cnt").desc, col("lang").asc)
    val volumesAndLangs = base
      .groupBy("source", "lang").agg(
        count(lit(1)).as("cnt"),
        sum("n_tokens").as("lang_tokens"),
        sum("n_chars").as("lang_chars"))
      .withColumn("rn", row_number().over(langRank))
      .groupBy("source").agg(
        sum("cnt").as("n_docs"),
        sum("lang_tokens").as("total_tokens"),
        sum("lang_chars").as("total_chars"),
        count(lit(1)).as("n_langs"),
        max(when(col("rn") === 1, col("lang"))).as("top_lang"))
    val dupDocs = base
      .select(col("source"), col("digest"))
      .withColumn("copies", count(lit(1)).over(Window.partitionBy("digest")))
      .filter(col("copies") > 1)
      .groupBy("source").agg(count(lit(1)).as("n_dup_docs"))
    volumesAndLangs
      .join(dupDocs, Seq("source"), "left")
      .select(
        col("source"), col("n_docs"), col("total_tokens"), col("total_chars"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"),
        col("n_langs"), col("top_lang"))
  }

  /** Context-window chunking — the pretraining-example constructor: each
    * document's whitespace tokens are cut into windows of `windowSize`
    * tokens advancing by `stride` (overlapping when `stride <
    * windowSize`, the standard sliding-context recipe; also the RAG
    * chunker). Documents at or under `windowSize` tokens yield exactly
    * one chunk; otherwise the last window may be short but always starts
    * within the document, so no token is dropped.
    *
    * One `explode` over a computed chunk count, then `slice` on the
    * already-split token array — ZERO shuffle; the ~windowSize/stride
    * output amplification is the operator's inherent output size, and it
    * is produced partition-local, so at 100 TB this scales exactly like
    * the write of its own result. Chunk count is pure integer
    * arithmetic (`ceil((n-w)/s)+1` as a non-negative `div`), so the
    * cross-engine gate hashes exactly.
    * Output: (id, chunk_idx, chunk_text, n_tokens). */
  def chunkWindows(
      docs: DataFrame, windowSize: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(windowSize > 0, "windowSize must be positive")
    require(stride > 0 && stride <= windowSize, "stride must be in [1, windowSize]")
    val chunk = slice(col("ws"), col("chunk_idx") * stride + 1, lit(windowSize))
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("ws"))
      .withColumn("n_chunks",
        when(size(col("ws")) <= windowSize, lit(1)).otherwise(
          expr(s"((size(ws) - $windowSize + $stride - 1) div $stride) + 1").cast("int")))
      .select(col(idCol), col("ws"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(chunk, " ").as("chunk_text"),
        size(chunk).cast("long").as("n_tokens"))
  }

  /** Content-defined chunking (the FastCDC/rsync idea relationally): a
    * cut point opens wherever the `gramSize`-char gram STARTING there
    * hashes into bucket 0 of `avgChunk` — a pure function of local
    * content, so inserting or deleting text shifts only the chunks
    * around the edit while every later boundary re-aligns. Chunk-level
    * exact dedup over this output catches shifted/patched duplication
    * that whole-document hashing misses and that fixed-offset shingles
    * pay a 10× blowup to find.
    *
    * The gram hash is the salted-md5 bucket arithmetic every sampling
    * operator here uses (engine-portable); expected chunk length is
    * `avgChunk` chars. Whole pipeline is array HOFs over the row — ZERO
    * shuffle at any corpus size; the row's own `substr` calls are the
    * only cost (O(len·gramSize) hashing per doc, the same constant CDC
    * storage systems pay). Documents shorter than `gramSize` are one
    * chunk. Output: (id, chunk_idx, chunk_start, chunk_text). */
  def cdcChunks(
      docs: DataFrame, gramSize: Int = 8, avgChunk: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(gramSize > 0 && avgChunk > 1, "gramSize and avgChunk must be positive")
    val text = col(textCol)
    val n = length(text)
    // position 1 is always a start; later cut points follow in order.
    // Cut detection is the native one-loop-per-row expression
    // (graft.functions.TextHash.cdcCutStarts) — bit-identical to the HOF
    // filter(sequence(...), i -> conv(substring(md5(substr(text,i,g)),
    // 1,8),16,10) % avg == 0) the oracle replays (pinned by
    // TextCorpusSpec), which evaluated |text| interpreted lambdas per doc
    val starts = graft.functions.TextHash.cdcCutStarts(text, gramSize, avgChunk)
    val chunks = transform(col("starts"), (s, j) =>
      struct(
        s.as("start"),
        text.substr(s, coalesce(try_element_at(col("starts"), j + 2), n + 1) - s).as("chunk")))
    docs
      .select(col(idCol), text, starts.as("starts"))
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.start").cast("long").as("chunk_start"),
        col("c.chunk").as("chunk_text"))
  }

  /** Per-source distinctive terms: the top-`k` words of each source
    * ranked by (count in source DESC, corpus document-frequency ASC,
    * word ASC) — "frequent here, rare everywhere" as a pure INTEGER
    * ordering, the tf-idf idea without the float logarithm whose
    * cross-engine ulp differences would make top-k selection
    * nondeterministic. Output: (source, word, cnt, doc_freq, rank).
    *
    * One corpus scan: the (word, source) aggregate counts occurrences
    * AND distinct documents; since each document has exactly one source,
    * corpus document-frequency is the SUM of per-source distinct-doc
    * counts — recovered from the first aggregate's (tiny,
    * |vocab|×|sources|-bounded) output instead of a second corpus pass.
    * The rank window partitions by source over its vocabulary — the
    * per-key top-k sort-run shape, same argument as
    * [[Sampling.stratifiedSample]]. */
  def distinctiveTerms(
      docs: DataFrame, k: Int,
      sourceCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0)
    // materialized ONCE: both the doc-frequency roll-up and the final
    // join consume it, and without the checkpoint AQE re-runs the whole
    // corpus explode+aggregate per consumer (the [[dedupSpans]] lesson);
    // the frame is |vocab|×|sources| rows — executor-cache-sized
    val perSource = docs
      .select(col(sourceCol).as("source"), col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word", "source")
      .agg(count(lit(1)).as("cnt"), count_distinct(col("doc_id")).as("docs_in_source"))
      .localCheckpoint()
    val docFreq = perSource.groupBy("word")
      .agg(sum("docs_in_source").as("doc_freq"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("doc_freq").asc, col("word").asc)
    perSource.join(docFreq, "word")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("source", "word", "cnt", "doc_freq", "rank")
  }

  /** Per-document keywords: each doc's top-`k` tokens ranked by the
    * TF-IDF ordering WITHOUT the floats — (tf desc, corpus df asc,
    * token asc) is a total order that agrees with tf·idf's intent
    * (frequent here, rare everywhere) while every emitted column stays
    * an exact integer (house determinism rule; consumers who want the
    * classic tf·ln(N/df) score have both ingredients). The per-DOC
    * counterpart of [[distinctiveTerms]] (per-source) — the "what is
    * this document about" tag extractor for corpus browsing, topic
    * routing, and keyword-match retrieval fallback.
    *
    * Shape: one (doc, token) aggregation (map-side combined — the only
    * corpus-sized shuffle), a |vocab|-sized df roll-up joined back on
    * the token key, and the rank window partitioned by doc — per-doc
    * state is bounded by document length, so no partition outgrows an
    * executor at 100 TB. The tf frame is pinned (`localCheckpoint`):
    * both the df roll-up and the final join consume it (the
    * [[distinctiveTerms]] lesson). */
  def docKeywords(
      docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0)
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(df, "token")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "token", "tf", "df")
  }

  /** Frequency vocabulary: the top-`vocabSize` words by corpus count,
    * with dense ids in (count desc, word asc) order — the deterministic
    * "tokenizer fit" step. The word count partial-aggregates map-side
    * and the top-k is a TakeOrderedAndProject (k rows cross the final
    * exchange, never the full word table); the id-assigning window runs
    * over those k rows only — bounded by construction, like the IVF
    * centroid matrix. */
  def buildVocab(docs: DataFrame, vocabSize: Int, textCol: String = "text"): DataFrame = {
    require(vocabSize > 0)
    val byFreq = Seq(col("n_occurrences").desc, col("word").asc)
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(byFreq: _*)
      .limit(vocabSize)
      .withColumn("token_id",
        (row_number().over(Window.orderBy(byFreq: _*)) - 1).cast("long"))
      .select("token_id", "word", "n_occurrences")
  }

  /** Encode documents against a [[buildVocab]] vocabulary — the
    * "tokenizer transform" step: each document becomes its id sequence
    * (out-of-vocabulary → -1), plus token/OOV counts. The vocabulary is
    * broadcast (it is small by construction) so the probe is a map-side
    * hash lookup; the only shuffle is the doc_id re-assembly, and the
    * id sequence is rebuilt in word order with an `array_sort` over
    * (pos, id) structs — per-document bounded, no global sort. */
  def encodeDocs(
      docs: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = docs
      .select(col(idCol).as("doc_id"), posexplode(TextAnalysis.tokens(col(textCol))))
      .select(col("doc_id"), col("pos"), col("col").as("word"))
    words.join(broadcast(vocab.select("word", "token_id")), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"),
              coalesce(col("token_id"), lit(-1L)).as("id")))),
            x => x.getField("id").cast("string")),
          " ").as("ids_text"))
  }

  /** Deterministic sharded shuffle: a reproducible training order
    * WITHOUT a global sort. Each doc gets a shard from a salted hash and
    * a position within its shard from a second salted hash — consumers
    * read shards in any order and rows within a shard by `pos`. The
    * window partitions by shard (corpus/shards rows each, bounded by
    * choosing `shards` ∝ corpus size), never by the whole corpus, so no
    * single-partition global row_number — the thing that serializes
    * naive shuffle implementations at 100 TB. Salting the hash re-deals
    * the whole corpus per epoch (`salt = s"epoch-$i"`). md5-based so the
    * assignment is engine-portable and stable across re-sharding of the
    * input files. */
  def shardedShuffle(docs: DataFrame, shards: Int, salt: String): DataFrame = {
    require(shards > 0)
    // first 8 md5 hex chars → BIGINT in [0, 2^32): non-negative, so % is
    // floor-division-consistent across engines
    val shard = (conv(substring(md5(concat(lit(salt), col("doc_id"))), 1, 8), 16, 10)
      .cast("long") % shards).as("shard")
    val orderKey = md5(concat(lit(salt), lit("#"), col("doc_id")))
    docs.select(col("doc_id"), shard, orderKey.as("ok"))
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("shard")).orderBy(col("ok"), col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Snapshot delta between two corpus versions — the dataset-versioning
    * primitive: which documents were `added`, `removed`, or `changed`
    * from `oldDocs` to `newDocs`. Change detection is by md5 content
    * hash (engine-portable, and at 100 TB the hashes can be precomputed
    * and stored with each snapshot so the diff never re-reads text).
    *
    * 100 TB shape: ONE full-outer join co-partitioned on doc_id over
    * hash-only projections (16-byte digests, never the text), and only
    * the delta is emitted — output is |changes|, not |corpus|, so
    * downstream incremental reprocessing (e.g. [[graft.streaming.OnlineDedup]]
    * on the `added`+`changed` slice) touches changed data only. */
  def corpusDiff(
      oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val o = oldDocs.select(col(idCol).as("doc_id"), md5(col(textCol)).as("old_hash"))
    val n = newDocs.select(col(idCol).as("doc_id"), md5(col(textCol)).as("new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select("doc_id", "status", "old_hash", "new_hash")
  }

  /** The first merge round of BPE tokenizer training: count every
    * adjacent character pair inside alphabetic words, weighted by word
    * frequency, and emit the top `topN` merge candidates. A tokenizer
    * trained on the corpus starts by folding the corpus to its word
    * frequency table (tiny relative to the text) and then iterating
    * exactly this pair count — this operator is that inner step, the one
    * that touches data at corpus scale.
    *
    * 100 TB shape: the text collapses to the word-frequency table in one
    * explode + partial-agg shuffle (|vocab| rows, ~10⁶ regardless of
    * corpus size — the Heaps'-law plateau); pair expansion then runs on
    * the VOCAB, not the corpus, so subsequent BPE merge rounds on the
    * same table are corpus-free. Top-N is TakeOrderedAndProject with a
    * total order (count desc, pair asc) — no ties at the cut. */
  def bpePairCounts(docs: DataFrame, textCol: String = "text",
      topN: Int = 30): DataFrame = {
    val wordFreq = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    wordFreq
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"))
      .groupBy("pair").agg(sum("cnt").as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topN)
  }

  /** REAL BPE merge training, `nMerges` rounds (Sennrich et al. 2016):
    * collapse the corpus to the word-frequency table once, then per
    * round (a) count adjacent SYMBOL pairs weighted by word frequency,
    * (b) pick the most frequent (ties → lexicographic), (c) apply the
    * merge to every word with the standard greedy LEFTMOST-first,
    * non-overlapping scan — "aaaa" under merge (a,a) becomes
    * ["aa","aa"], not ["aa","a","a"]. Returns the learned merge table
    * (rank, sym_a, sym_b, merged, pair_count) — rounds 2+ count pairs
    * over the REBUILT symbol sequences, so any drift in merge
    * application shows up in the next round's counts (which is what the
    * cross-engine oracle leans on).
    *
    * The merge application is one `aggregate` HOF fold per word
    * (accumulator = built prefix + pending symbol), evaluated on the
    * VOCAB table — after the one corpus collapse, every round is
    * corpus-free: an aggregation over |vocab| rows plus a projection,
    * with `localCheckpoint` pinning the rebuilt vocab between rounds
    * (the [[graft.operators.Graph.pageRank]] iteration discipline).
    * Driver state per round is ONE (pair, count) row. */
  def bpeTrainMerges(docs: DataFrame, textCol: String = "text",
      nMerges: Int = 3): DataFrame = {
    require(nMerges >= 1 && nMerges <= 64, "nMerges out of range")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(expr("filter(split(word, ''), s -> s <> '')").as("syms"), col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      // filter before the pair expansion: sequence(1, 0) DESCENDS in
      // Spark, so a single-symbol word would fabricate junk pairs
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
             i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"""))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        val c = top(0).getLong(2)
        val ab = a + b
        merges += ((r.toLong, a, b, ab, c))
        // Greedy leftmost fold: see [[mergeFoldExpr]].
        vocab = vocab.select(expr(mergeFoldExpr(a, b, ab)).as("syms"), col("cnt"))
          .localCheckpoint()
        r += 1
      }
    }
    merges.result().toDF("rank", "sym_a", "sym_b", "merged", "pair_count")
  }

  /** Greedy leftmost merge application as an `aggregate` HOF fold
    * (symbols are [a-z]+, safe to inline): append each symbol, but when
    * the last built symbol is `a` and the incoming one is `b`, replace
    * the last with the merged symbol. Equivalent to the textbook scan:
    * a merged symbol can never re-match as `a` of the same pair
    * (merged = a+b ≠ a), so runs resolve leftmost-first — "aaaa" →
    * [aa, aa]. Shared by [[bpeTrainMerges]] (training) and
    * [[bpeEncode]] (serving) so the two paths can never drift. */
  private def mergeFoldExpr(a: String, b: String, ab: String): String =
    s"""aggregate(syms,
          named_struct('res', cast(array() as array<string>)),
          (acc, x) -> CASE
            WHEN size(acc.res) > 0 AND element_at(acc.res, -1) = '$a' AND x = '$b'
              THEN named_struct('res',
                concat(slice(acc.res, 1, size(acc.res) - 1), array('$ab')))
            ELSE named_struct('res', concat(acc.res, array(x))) END,
          acc -> acc.res)"""

  /** The tokenizer's SERVING path — encode documents with a TRAINED
    * merge table ([[bpeTrainMerges]]' output, or any (rank, sym_a,
    * sym_b, merged) frame): per word, start from characters and apply
    * every merge in rank order with the same greedy leftmost fold
    * training used (Sennrich et al. 2016 apply merges "in the order
    * they were learned"). Output per document: `n_words`, `n_tokens`
    * (total symbols after merging), and `tokens_text` (the symbol
    * sequence in word order, space-joined) — all exact.
    *
    * 100 TB shape: the corpus collapses to its DISTINCT-word table
    * once (the Heaps'-law plateau — ~10⁶–10⁷ rows regardless of corpus
    * size); every merge round is then corpus-free (a projection over
    * the word table, localCheckpoint-pinned like training). The only
    * corpus-sized work is the final (word → symbols) equi-join and the
    * per-doc rebuild — one keyed shuffle each, with the word table
    * small enough that AQE broadcasts it in practice. The merge table
    * itself is ≤64 rows by the training cap and collects to the
    * driver (bounded by construction). */
  def bpeEncode(
      docs: DataFrame, merges: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = bpeDocWords(docs, idCol, textCol)
    val vocab = bpeWordSyms(words, merges)
    val encoded = vocab.select(
      col("word"),
      size(col("syms")).cast("long").as("n_syms"),
      array_join(col("syms"), " ").as("syms_text"))
    words.join(encoded, Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum("n_syms").as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("syms_text").as("t")))),
            x => x.getField("t")),
          " ").as("tokens_text"))
  }

  /** `(doc_id, pos, word)` of every [a-z]+ word — the shared front of
    * the encode/decode serving paths. */
  private def bpeDocWords(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), "[^a-z]+")))
      .select(col("doc_id"), col("pos"), col("col").as("word"))
      .filter(length(col("word")) >= 1)

  /** word → merged-symbol sequence: the DISTINCT-word table folded
    * through every merge in rank order (the corpus-free serving loop —
    * see [[bpeEncode]]'s 100 TB note). Shared by [[bpeEncode]] and
    * [[bpeEncodeIds]] so the two serving outputs can never drift. */
  private def bpeWordSyms(words: DataFrame, merges: DataFrame): DataFrame = {
    var vocab = words.select("word").distinct()
      .select(col("word"), expr("filter(split(word, ''), s -> s <> '')").as("syms"))
      .localCheckpoint()
    val ms = merges.orderBy("rank")
      .select("sym_a", "sym_b", "merged").collect()
    ms.foreach { row =>
      val (a, b, ab) = (row.getString(0), row.getString(1), row.getString(2))
      // the fold inlines these into SQL text — enforce the alphabet the
      // training path guarantees rather than trust the caller's frame
      require(Seq(a, b, ab).forall(_.matches("[a-z]+")),
        s"merge symbols must be [a-z]+, got ($a, $b, $ab)")
      require(ab == a + b, s"merged symbol $ab != $a + $b")
      vocab = vocab.select(col("word"), expr(mergeFoldExpr(a, b, ab)).as("syms"))
        .localCheckpoint()
    }
    vocab
  }

  /** The token-id vocabulary a trained merge table induces — the real
    * BPE convention (vocab = base alphabet, then one entry per merge in
    * learned order): ids 1–26 for `a`–`z`, `26 + rank` for each merged
    * symbol; id 0 is RESERVED as the word separator
    * ([[bpeEncodeIds]]/[[bpeDecode]]'s boundary token). Bounded by
    * construction (26 + ≤64 merges), so callers may collect it. */
  def bpeVocabIds(merges: DataFrame): DataFrame = {
    val spark = merges.sparkSession
    import spark.implicits._
    val alphabet = ('a' to 'z')
      .map(c => ((c - 'a' + 1).toLong, c.toString)).toDF("token_id", "symbol")
    alphabet.unionByName(
      merges.select((col("rank").cast("long") + 26L).as("token_id"),
        col("merged").as("symbol")))
  }

  /** Encode to TOKEN IDS — the serving output a trainer consumes:
    * per document `(n_words, n_tokens, token_ids)` where `token_ids`
    * is every word's merged-symbol ids in order with the reserved
    * separator id 0 between words (no leading/trailing separator) and
    * `n_tokens` counts REAL tokens only (separators excluded; equals
    * [[bpeEncode]]'s `n_tokens` by construction).
    *
    * Same 100 TB shape as [[bpeEncode]]: one corpus collapse to the
    * distinct-word table, corpus-free merge folds, one keyed join back.
    * The symbol→id map is the bounded [[bpeVocabIds]] frame collected
    * into a LITERAL map column, so id assignment is a pure projection —
    * no extra join, nothing data-sized at the driver. */
  def bpeEncodeIds(
      docs: DataFrame, merges: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = bpeDocWords(docs, idCol, textCol)
    val vocab = bpeWordSyms(words, merges)
    val idOf: Map[String, Long] = bpeVocabIds(merges).collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val m = typedLit(idOf)
    val encoded = vocab.select(
      col("word"),
      size(col("syms")).cast("long").as("n_syms"),
      transform(col("syms"), s => element_at(m, s)).as("ids"))
    val flat = flatten(transform(
      array_sort(collect_list(struct(col("pos"), col("ids").as("ids")))),
      x => concat(x.getField("ids"), array(lit(0L)))))
    words.join(encoded, Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum("n_syms").as("n_tokens"),
        slice(flat, lit(1), size(flat) - 1).as("token_ids"))
  }

  /** Decode a token-id sequence back to text — the inverse serving
    * path that closes the tokenizer: each id maps to its
    * [[bpeVocabIds]] symbol (the reserved 0 to a single space), symbols
    * concatenate with no separator (word-internal ids abut; the 0s
    * carry the spaces). Satisfies the round-trip law
    * `decode(encode(x)) == normalize(x)` where `normalize` is
    * [[bpeEncode]]'s word extraction re-joined with single spaces —
    * over the FULL input domain, because the base alphabet makes every
    * [a-z]+ word encodable (no OOV). An id outside the vocab decodes
    * to NULL text, loudly (never silently skipped).
    *
    * Pure projection: the bounded vocab collects into a literal map;
    * no join, no shuffle — decode rides the scan at 100 TB. */
  def bpeDecode(
      df: DataFrame, merges: DataFrame,
      idsCol: String = "token_ids", outCol: String = "decoded_text"): DataFrame = {
    val symOf: Map[Long, String] = bpeVocabIds(merges).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap + (0L -> " ")
    val m = typedLit(symOf)
    val syms = transform(col(idsCol), id => element_at(m, id))
    // array_join would silently SKIP null elements — an unknown id must
    // null the whole text instead, so the corruption is visible
    df.withColumn(outCol,
      when(forall(syms, s => s.isNotNull), array_join(syms, ""))
        .otherwise(lit(null)))
  }

  /** Distinct (doc, line) pairs with an md5 line digest — the shared
    * front of the boilerplate pass. Lines are trimmed; empty lines are
    * structure, not content, and never count. The digest (not the line
    * text) is the shuffle key everywhere downstream, so the bytes moved
    * per line are 32 hex chars regardless of line length. */
  private def docLines(
      docs: DataFrame, sep: String, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("line"))
      .select(col("doc_id"), trim(col("line")).as("line"))
      .filter(length(col("line")) > 0)
      .select(col("doc_id"), md5(col("line")).as("line_hash"))
      .distinct()

  /** Cross-document line-level boilerplate detection — the C4-style
    * cleaning rule (Raffel et al. 2020 §2.2 deduplicate any three-
    * sentence span appearing more than once; CCNet per-line hashing,
    * Wenzek et al. 2020): a LINE whose exact text appears in ≥ `minDocs`
    * DISTINCT documents is navigation chrome / footers / cookie banners,
    * not content. Returns per-document
    * `(doc_id, n_lines, n_boilerplate)` where `n_lines` counts distinct
    * non-empty trimmed lines and `n_boilerplate` the subset that crossed
    * the document-frequency bar corpus-wide.
    *
    * 100 TB shape: two shuffles of digest-sized rows — one to count each
    * line's document frequency (partial aggregation collapses per-map
    * duplicates first), one equi-join of the distinct (doc, digest) frame
    * against the df table on the digest. The df table is NOT broadcast:
    * boilerplate candidates are few, but the full df frame is
    * corpus-sized and the join runs digest-co-partitioned either way.
    * The line TEXT never crosses an exchange — only 16-byte digests do
    * (the [[Dedup.exactGroups]] argument). Intra-document repeats are
    * [[dedupParagraphs]]' job; this operator counts each (doc, line)
    * once, so a footer stuttered 50× in one page still contributes one
    * df unit — df is "how many documents", the C4 rule's unit. */
  def boilerplateStats(
      docs: DataFrame, minDocs: Long = 2L, sep: String = "\n",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docLines(docs, sep, idCol, textCol)
    val df = lines.groupBy("line_hash")
      .agg(count(lit(1)).as("line_df"))
    lines.join(df, Seq("line_hash"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("line_df") >= minDocs, 1L).otherwise(0L)).as("n_boilerplate"))
  }

  /** The removal twin of [[boilerplateStats]]: each document with its
    * boilerplate lines (df ≥ `minDocs` corpus-wide) stripped, remaining
    * lines re-joined IN ORIGINAL ORDER. Output
    * `(doc_id, kept_text, removed_lines)`; removed_lines counts removed
    * POSITIONS (a footer repeated twice in one doc removes two lines —
    * unlike the stats frame, position identity matters here).
    *
    * Cost: the corpus pays one posexplode + digest-join + re-aggregation
    * — i.e. the text itself crosses the line-df join and the rebuild
    * shuffle, unavoidable for a rewrite (vs the stats pass, which moves
    * only digests). The rebuild groups by doc and sorts each doc's
    * surviving (pos, line) structs with `array_sort` AFTER collect —
    * per-doc memory, no corpus-wide sort. At 100 TB run the stats pass
    * first and rewrite only documents with n_boilerplate > 0 (the join
    * prunes the rebuild to touched docs); clean docs stream through
    * untouched via the left join's null branch. */
  def stripBoilerplate(
      docs: DataFrame, minDocs: Long = 2L, sep: String = "\n",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val bad = docLines(docs, sep, idCol, textCol)
      .groupBy("line_hash")
      .agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") >= minDocs)
      .select("line_hash")
    val positioned = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .withColumnRenamed("col", "line")
      .withColumn("line_hash", md5(trim(col("line"))))
    positioned
      .join(bad.withColumn("is_bad", lit(true)), Seq("line_hash"), "left")
      .withColumn("drop",
        coalesce(col("is_bad"), lit(false)) && length(trim(col("line"))) > 0)
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("drop"), struct(col("pos"), col("line"))))),
            x => x("line")),
          sep).as("kept_text"),
        sum(when(col("drop"), 1L).otherwise(0L)).as("removed_lines"))
  }

  /** First-occurrence novelty per document: of each doc's distinct
    * n-gram shingles, how many were ALREADY introduced by an earlier
    * document (smaller id under the ingestion order) — the measured
    * form of the "keep the first occurrence" dedup policy (Lee et al.
    * 2022's survivor rule): the originator of a span is never penalized
    * for its copies, every later repeat is. Distinct from the unordered
    * repeat screens (line boilerplate, span dedup): those count df ≥ 2
    * symmetrically; this ATTRIBUTES the duplication to the later
    * arrivals, which is what an incremental ingest actually filters on.
    *
    * Shape: explode to (id, shingle) postings, min(id) per shingle (one
    * keyed shuffle, map-side combined), join the postings back on the
    * shingle (co-partitioned by the same key), re-aggregate per doc —
    * three data-sized shuffles, nothing broadcast, the BM25/containment
    * postings layout shared once more. At 100 TB the ingestion order is
    * the log position, so the same plan runs incrementally: new batch
    * shingles probe the accumulated first-occurrence index. */
  def noveltyScores(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 8): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
        explode(graft.functions.TextHash.shingleHashes(col(textCol), shingleSize))
          .as("tok"))
    val first = sh.groupBy("tok").agg(min(col("id")).as("first_id"))
    sh.join(first, Seq("tok"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") < col("id"), 1L).otherwise(0L)).as("n_recycled"))
  }

  /** Blocked-term hits (the C4 §2.2 "bad words" screen — Raffel et al.
    * 2020 filter any page containing a listed word/phrase): per doc, the
    * number of word-boundary matches of ANY listed term, via ONE
    * combined alternation regex over the lowered text — one codegen'd
    * `regexp_count` per row regardless of list size, no explode, no
    * join, no shuffle. Terms may be multi-word phrases. For blocklists
    * beyond regex-compilation size (tens of thousands of entries) the
    * token-join formulation ([[graft.operators.Web.blocklistFilter]]'s
    * shape over exploded tokens) is the fallback; published lists are
    * hundreds of entries, comfortably literal. */
  def blockedTermHits(
      docs: DataFrame, terms: Seq[String], textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "term list must not be empty")
    // single spaces BETWEEN words only: a leading/trailing/doubled space
    // (a sloppily-edited list file) would compile into a regex that can
    // never match the intended phrase — a silent no-op screen
    val termRe = "[a-z0-9]+( [a-z0-9]+)*"
    require(terms.forall(_.matches(termRe)),
      s"terms must be lowercase word/phrase literals (single spaces between " +
        s"words): ${terms.filterNot(_.matches(termRe))}")
    val re = terms.map(_.replace(" ", "\\s+")).mkString("\\b(", "|", ")\\b")
    docs.select(
      col("doc_id"),
      regexp_count(lower(col(textCol)), lit(re)).cast("long").as("n_hits"))
  }

  /** Distinct-n diversity (Li et al. 2016's distinct-1/distinct-2
    * metrics, the standard repetitiveness signal for generated or
    * scraped corpora): per `byCol`, total and distinct word n-grams —
    * `distinct/total` downstream is the diversity ratio. Counts, not
    * ratios, so the gate hash is exact (the [[repetitionStats]]
    * discipline). n-grams are built inside the row with a codegen'd
    * `transform(sequence(...))` over the token array (no window, no
    * per-position shuffle); the only exchange is the (byCol, ngram)
    * distinct-aggregate — word-count shaped, map-side combined, linear
    * at 100 TB. */
  def distinctNgramStats(
      docs: DataFrame, n: Int, textCol: String = "text",
      byCol: String = "source"): DataFrame = {
    require(n >= 1, s"n-gram size $n must be >= 1")
    val grams =
      s"""transform(sequence(1, size(toks) - ${n - 1}),
         |  i -> ${if (n == 1) "element_at(toks, i)"
                  else (0 until n).map(k => s"element_at(toks, i + $k)")
                    .mkString("concat_ws(' ', ", ", ", ")")})""".stripMargin
    docs
      .select(col(byCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(byCol), explode(expr(grams)).as("ngram"))
      .groupBy(byCol)
      .agg(
        count(lit(1)).as("total_ngrams"),
        countDistinct(col("ngram")).as("distinct_ngrams"))
  }

  /** Chao1 vocabulary-richness estimate (Chao 1984; the standard
    * species-richness estimator applied to corpus vocabulary): from
    * the word-frequency spectrum alone — S_obs distinct words, f1
    * singletons, f2 doubletons — the total vocabulary including
    * never-seen words is estimated as
    * {{{
    *   chao1 = S_obs + f1² / (2·f2)
    * }}}
    * Emitted as exact integers (`s_obs`, `f1`, `f2`, plus the
    * cross-multiplied `chao1_num = 2·f2·S_obs + f1²`, `chao1_den =
    * 2·f2`) so the gate never divides; f2 = 0 ⇒ den 0, the caller's
    * signal to fall back to the bias-corrected form. Use: decide
    * whether a corpus slice's vocabulary has SATURATED (chao1 ≈ s_obs
    * — more data adds few new words) or is still growing — the
    * data-acquisition signal behind "do we need more of this source".
    *
    * 100 TB shape: ONE map-side-combined word count, then a
    * |vocab|-sized aggregate over the frequency spectrum. Counts are
    * longs; the cross-products sit far inside decimal(38,0). */
  def vocabRichness(
      docs: DataFrame, textCol: String = "text"): DataFrame = {
    val d = "decimal(38,0)"
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .agg(
        count(lit(1)).as("s_obs"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(
        col("s_obs"), col("f1"), col("f2"),
        (lit(2).cast(d) * col("f2") * col("s_obs") + col("f1").cast(d) * col("f1"))
          .cast(d).as("chao1_num"),
        (lit(2).cast(d) * col("f2")).cast(d).as("chao1_den"))
  }
}
