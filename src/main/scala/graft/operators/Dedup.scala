package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape of the problem:
  *
  * - exact: hash-groupBy (one shuffle on a 16-byte key, not on the text);
  * - MinHash + LSH: per-row signatures are pure column expressions (no
  *   shuffle), candidate generation shuffles only (band, bandHash) pairs,
  *   and verification touches only candidate pairs — the classic
  *   shingle → minhash → band → bucket-join pipeline;
  * - SimHash: 64-bit near-dup code per row, one pass, codegen'd;
  * - n-gram Jaccard: exact verification used on LSH survivors (or brute
  *   force within small blocks);
  * - embedding cosine near-dup: see [[Similarity]].
  */
object Dedup {

  // ------------------------------------------------------------------
  // Exact dedup
  // ------------------------------------------------------------------

  /** Exact duplicate groups by content hash: (hash, keepId, dupCount).
    * Shuffles the 16-byte md5, not the document text. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep one row per distinct content (the minimum id wins —
    * deterministic, unlike dropDuplicates). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactGroups(df, textCol, idCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** Sorted distinct 64-bit hashes of character shingles — one native
    * expression pass per document ([[graft.functions.ShingleHashes]]);
    * equals array_sort(transform(array_distinct(charShingles(text)),
    * xxhash64)). This array is the document's set representation: the
    * signature derives from it AND the verify stage intersects it, so
    * shingling runs once per doc, never per candidate pair. */
  def shingleHashes(text: Column, shingleSize: Int): Column =
    graft.functions.TextHash.shingleHashes(text, shingleSize)

  /** MinHash signature: array of k minima over seed-mixed shingle hashes
    * (hash family j = xxhash64(shingleHash, j)). A native Catalyst
    * expression ([[graft.functions.MinHashSig]]): the identical math is
    * expressible with `transform`/`array_min` HOFs, but those interpret
    * one lambda per (seed × shingle) — ~10^4 invocations per document —
    * while the native expression is one JIT'd loop per row inside
    * whole-stage codegen. Computed in the scan projection, zero shuffle. */
  def minHashSignature(text: Column, k: Int = 32, shingleSize: Int = 5): Column =
    graft.functions.TextHash.minHashSignature(text, k, shingleSize)

  /** LSH band hashes: the signature split into `bands` groups of
    * `k/bands` values, each group hashed to one bucket key. */
  def lshBandHashes(signature: Column, bands: Int, k: Int): Column = {
    val rows = k / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws("|", slice(signature, b * rows + 1, lit(rows)))))
  }

  /** All C(n,2) ordered pairs from a sorted id array (id_a < id_b). */
  def pairCombos(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, greatest(size(ids) - i - 1, lit(0))),
        y => struct(x.as("id_a"), y.as("id_b")))))

  /** Candidate pairs from a (id, sh) frame of precomputed shingle-hash
    * arrays: docs sharing any band bucket. One signature pass; only
    * (band, bucket, id) tuples shuffle — never text or hash arrays —
    * then pairs are expanded inside each bucket group (no self-join, so
    * the signature projection is executed once, not once per join side).
    * Buckets larger than `maxBucketSize` are skipped: a mega-bucket is
    * exact-dup- or boilerplate-shaped (C(n,2) candidate blow-up at scale)
    * and belongs to [[exactDedup]]; the cap bounds per-bucket work. */
  def lshCandidatePairsFromHashes(
      withSh: DataFrame, k: Int, bands: Int,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val sig = withSh.select(
      col("id"),
      posexplode(lshBandHashes(graft.functions.TextHash.minHashFromHashes(col("sh"), k), bands, k))
        .as(Seq("band", "bucket")))
    sig.groupBy("band", "bucket")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)
      .select(explode(pairCombos(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Candidate near-duplicate pairs via LSH over raw text columns. */
  def lshCandidatePairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 32, bands: Int = 8, shingleSize: Int = 5): DataFrame =
    lshCandidatePairsFromHashes(
      df.select(col(idCol).as("id"), shingleHashes(col(textCol), shingleSize).as("sh")),
      k, bands)

  /** EXACT all-pairs Jaccard self-join via rare-first prefix filtering
    * (AllPairs, Bayardo et al. WWW'07; PPJoin, Xiao et al. 2008) — the
    * third design point beside the LSH candidates (probabilistic recall)
    * and the bounded-block exact join (needs a blocking key): every pair
    * with J ≥ tNum/tDen is emitted, deterministically, with no blocking
    * assumption.
    *
    * Each doc's distinct shingle hashes are ordered by ascending GLOBAL
    * document frequency (ties by hash value) — one shared total order.
    * If J(x,y) ≥ t then |x∩y| ≥ ⌈t·max(|x|,|y|)⌉ =: α, and the FIRST
    * common token under the shared order has at most α−1 common tokens
    * after it in EACH doc, so it sits inside both prefixes of length
    * |·| − α + 1 ≤ |·| − ⌈t·|·|⌉ + 1. Only docs sharing a PREFIX token
    * are candidates; the rare-first order makes prefix buckets the
    * smallest possible (frequent boilerplate tokens sink to suffixes and
    * never generate candidates). Prefix lengths use integer ceil
    * ((tNum·sz + tDen − 1) div tDen) so soundness never rests on float
    * rounding; the final jaccard is the same double division the oracle
    * computes. The size filter tDen·|y| ≥ tNum·|x| (both ways) prunes
    * before pairing — also exact-integer.
    *
    * 100 TB shape: three data shuffles (token df count, per-doc
    * sort-agg, candidate join on prefix tokens) plus two id-keyed hash
    * joins for the verify — nothing broadcast, nothing quadratic in the
    * corpus. Candidate volume is Σ_tok C(prefix-df(tok), 2), exactly the
    * quantity the rare-first order minimizes; the per-pair verify is a
    * sorted-long-array intersect, the same kernel as [[nearDupPairs]].
    */
  def prefixFilterPairs(
      df: DataFrame, textCol: String, idCol: String,
      tNum: Int = 7, tDen: Int = 10, shingleSize: Int = 3): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"need 0 < $tNum/$tDen <= 1")
    val withSh = df
      .select(col(idCol).as("id"), shingleHashes(col(textCol), shingleSize).as("sh"))
      .localCheckpoint() // feeds df-count, prefix agg, and both verify sides
    val toks = withSh.select(col("id"), explode(col("sh")).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("dfreq"))
    val prefixes = toks.join(dfreq, Seq("tok"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("dfreq"), col("tok")))).as("ord"))
      .select(col("id"),
        transform(col("ord"), _.getField("tok")).as("toks"),
        size(col("ord")).cast("long").as("sz"))
      .withColumn("plen",
        (col("sz") - expr(s"(${tNum}L * sz + ${tDen - 1}L) div ${tDen}L") + 1L)
          .cast("int"))
      .select(col("id"), col("sz"), explode(slice(col("toks"), lit(1), col("plen"))).as("tok"))
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          lit(tDen.toLong) * col("b.sz") >= lit(tNum.toLong) * col("a.sz") &&
          lit(tDen.toLong) * col("a.sz") >= lit(tNum.toLong) * col("b.sz"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardFromHashSets(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= lit(tNum.toDouble / tDen))
      .select("id_a", "id_b", "jaccard")
  }

  /** EXACT directional containment self-join: all ORDERED pairs (a, b),
    * a ≠ b, with C(a→b) = |Sₐ∩S_b| / |Sₐ| ≥ tNum/tDen over distinct
    * shingle sets — the subset-duplication detector. Symmetric Jaccard
    * misses a short document embedded verbatim in a much longer one (the
    * union term drowns the overlap at ANY Jaccard threshold); containment
    * is the right primitive for quote inclusion, boilerplate-wrapped
    * copies, and excerpt reposts.
    *
    * Candidate scheme (index-prefix asymmetric SSJoin, cf. Chaudhuri et
    * al. ICDE'06; same family as [[prefixFilterPairs]]): C(a→b) ≥ t
    * means |a∩b| ≥ α := ⌈t·|a|⌉, so under ANY shared total order the
    * first common token sits within a's prefix of length |a| − α + 1
    * (≥ α−1 common tokens follow it inside a). The probe side therefore
    * explodes only that prefix — rare-first (ascending global df, the
    * order that makes prefix hits cheapest) — while the index side keeps
    * ALL tokens: unlike the Jaccard case there is NO size filter and no
    * prefix on b (a 50-shingle quote can be contained in a 50,000-shingle
    * page), which is inherent to containment, not a shortcut. Lossless by
    * the argument above; the verify recomputes exact containment with the
    * same sorted-merge intersect kernel as [[jaccardFromHashSets]].
    *
    * 100 TB shape: three data shuffles (df count, per-doc rare-first
    * sort-agg, probe-prefix ⋈ inverted-index candidate join) + two
    * id-keyed verify joins. Candidate volume is Σ_tok pdf(tok)·df(tok)
    * — prefix hits × postings — minimized by the rare-first order; the
    * index side is the SAME postings layout BM25 builds, so a real
    * pipeline shares it. Nothing broadcast, nothing quadratic in the
    * corpus. `probeFilter` optionally restricts the PROBE side (the `a`
    * of C(a→b)) — the usual production shape, where each new ingest
    * batch is scored against the whole corpus index (cf.
    * [[incrementalDedup]]); df statistics stay corpus-global either
    * way, so restricted and full runs agree on the pairs they share. */
  def containmentPairs(
      df: DataFrame, textCol: String, idCol: String,
      tNum: Int = 9, tDen: Int = 10, shingleSize: Int = 5,
      probeFilter: Column = lit(true)): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"need 0 < $tNum/$tDen <= 1")
    val withSh = df
      .select(col(idCol).as("id"), shingleHashes(col(textCol), shingleSize).as("sh"),
        probeFilter.as("is_probe"))
      .localCheckpoint() // feeds df-count, prefix agg, index, and verify
    val toks = withSh.select(col("id"), explode(col("sh")).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("dfreq"))
    // probe side (the `a` of C(a→b)) optionally restricted — the
    // incremental shape: score a new-batch slice against the WHOLE
    // corpus index; df stats stay corpus-global either way
    val probe = withSh.filter(col("is_probe"))
      .select(col("id"), explode(col("sh")).as("tok"))
      .join(dfreq, Seq("tok"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("dfreq"), col("tok")))).as("ord"))
      .select(col("id"),
        transform(col("ord"), _.getField("tok")).as("toks"),
        size(col("ord")).cast("long").as("sz"))
      .withColumn("plen",
        (col("sz") - expr(s"(${tNum}L * sz + ${tDen - 1}L) div ${tDen}L") + 1L)
          .cast("int"))
      .select(col("id").as("id_a"),
        explode(slice(col("toks"), lit(1), col("plen"))).as("tok"))
    val cand = probe.join(toks.select(col("id").as("id_b"), col("tok")),
        Seq("tok"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("containment",
        graft.functions.TextHash.sortedIntersectCount(col("sh_a"), col("sh_b"))
          .cast("double") / size(col("sh_a")).cast("double"))
      .filter(col("containment") >= lit(tNum.toDouble / tDen))
      .select("id_a", "id_b", "containment")
  }

  /** Exact n-gram Jaccard similarity between two texts' distinct shingle
    * sets — the string-set reference formulation. The scale path is
    * [[jaccardFromHashSets]] over precomputed arrays; values are equal
    * (64-bit shingle hashing is collision-free at any realistic corpus). */
  def jaccard(textA: Column, textB: Column, shingleSize: Int): Column = {
    val sa = array_distinct(TextAnalysis.charShingles(textA, shingleSize))
    val sb = array_distinct(TextAnalysis.charShingles(textB, shingleSize))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** Jaccard similarity of two precomputed distinct shingle-hash arrays:
    * |∩| / (|A| + |B| − |∩|). Arrays must be SORTED — [[shingleHashes]]
    * sorts at construction, so every caller holds the invariant — which
    * lets the intersect run as a native linear merge
    * ([[graft.functions.TextHash.sortedIntersectCount]]) instead of
    * `array_intersect`'s per-row hash set: at millions of verify pairs
    * (prefix_jaccard_pairs' 13M on the dense bench fixture) the hash-set
    * allocation was the dominant term. */
  def jaccardFromHashSets(sa: Column, sb: Column): Column = {
    val inter = graft.functions.TextHash.sortedIntersectCount(sa, sb).cast("double")
    inter / (size(sa).cast("double") + size(sb).cast("double") - inter)
  }

  /** Skip LSH buckets above this size by default: a mega-bucket is
    * exact-dup- or boilerplate-shaped (C(n,2) candidate blow-up) and
    * belongs to [[exactDedup]]. Finite by default so an adversarial corpus
    * cannot explode the candidate set ([[nearDupPairs]] additionally
    * gates its broadcast on the measured candidate count). */
  val DefaultMaxBucketSize: Int = 4096

  /** Candidate pairs above this count skip the broadcast-hash verify join
    * in favor of a shuffled join: ~3 longs/row, so 2M pairs ≈ 50 MB —
    * comfortably under broadcast limits; beyond it the corpus-side
    * shuffle is the safer plan. */
  val MaxBroadcastCandidates: Long = 2000000L

  /** Full MinHash-LSH near-dup pipeline: candidates from LSH buckets,
    * verified with exact shingle-set Jaccard ≥ threshold. Returns
    * (id_a, id_b, jaccard).
    *
    * Scale shape: each doc is shingle-hashed ONCE — the (id, hashes)
    * frame is materialized via `localCheckpoint` (executor
    * memory-and-disk blocks, reclaimed when the plan is GC'd), because
    * three downstream consumers read it (signature pass, both verify
    * sides); without materialization Spark re-executes the scan+hash
    * per consumer, which measured 1.7× slower at sf0.1 and re-reads the
    * corpus 3× at scale. Candidates are also materialized (they are
    * small — bucket-capped pair ids) so their count can gate the verify
    * join: candidate ids broadcast only when the measured count is under
    * [[MaxBroadcastCandidates]], else the join falls back to a shuffle
    * (the round-2 advice: never unconditionally broadcast a candidate
    * set whose size an adversarial corpus controls). Verification then
    * touches only candidate rows and intersects long arrays
    * ([[jaccardFromHashSets]]) — round 1 re-shingled text per candidate
    * pair, which was 60% of the whole bench.
    *
    * `materialize = false` gives the fully-lazy plan (no checkpoint, no
    * count job, broadcast decided by the bucket cap): use it when the
    * corpus is too large to spill its shingle arrays to executor disk. */
  def nearDupPairs(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, k: Int = 32, bands: Int = 8,
      shingleSize: Int = 5, maxBucketSize: Int = DefaultMaxBucketSize,
      materialize: Boolean = true): DataFrame = {
    val docs = df.select(col(idCol).as("id"), col(textCol).as("txt"))
    val withSh0 = docs.select(col("id"), shingleHashes(col("txt"), shingleSize).as("sh"))
    val withSh = if (materialize) withSh0.localCheckpoint() else withSh0
    val cands0 = lshCandidatePairsFromHashes(withSh, k, bands, maxBucketSize)
    val (cands, broadcastOk) =
      if (materialize) {
        val c = cands0.localCheckpoint()
        (c, c.count() <= MaxBroadcastCandidates)
      } else (cands0, true) // lazy mode: the bucket cap is the only bound
    val sides = cands.select(
      col("id_a"), col("id_b"),
      explode(array(col("id_a"), col("id_b"))).as("id"))
    withSh.join(if (broadcastOk) broadcast(sides) else sides, Seq("id"))
      .groupBy("id_a", "id_b")
      .agg(collect_list(col("sh")).as("shs"))
      // exactly two rows per pair (ids unique; pairs distinct); jaccard is
      // symmetric, so collect_list order does not matter
      .withColumn("jaccard", jaccardFromHashSets(element_at(col("shs"), 1), element_at(col("shs"), 2)))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------------
  // Incremental near-dup (corpus growth without recompute)
  // ------------------------------------------------------------------

  /** The persistable LSH index of a corpus, for [[incrementalNearDupPairs]]:
    * `buckets` (band, bucket, id) — the exploded band hashes — and
    * `shingles` (id, sh) — each document's distinct shingle-hash set for
    * the verify stage. In production both land in parquet (buckets
    * partitioned by band, or bucketed on (band, bucket)) and a daily
    * increment appends its own rows after deduping: the 100 TB corpus is
    * indexed ONCE and never re-shingled. */
  def nearDupIndex(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 32, bands: Int = 8, shingleSize: Int = 5): (DataFrame, DataFrame) = {
    val sh = df.select(col(idCol).as("id"), shingleHashes(col(textCol), shingleSize).as("sh"))
    (bucketsFromHashes(sh, k, bands), sh)
  }

  /** The LSH bucket rows of an `(id, sh)` shingle-hash frame — the
    * bucket half of [[nearDupIndex]] computed WITHOUT re-shingling, so
    * callers holding a pinned hash frame (the incremental/online path)
    * derive buckets from the materialized arrays. */
  private[graft] def bucketsFromHashes(
      sh: DataFrame, k: Int, bands: Int): DataFrame =
    sh.select(
      col("id"),
      posexplode(lshBandHashes(graft.functions.TextHash.minHashFromHashes(col("sh"), k), bands, k))
        .as(Seq("band", "bucket")))
      .select("band", "bucket", "id")

  /** Near-dup pairs of a NEW batch against an indexed corpus plus
    * itself — the operational shape of dedup at 100 TB: a daily crawl
    * increment dedups against the standing corpus without recomputing
    * it. Returns (new_id, match_id, jaccard) where `match_id` is an
    * indexed id or a smaller id from the same batch.
    *
    * Scale shape: the increment is small relative to the corpus, so its
    * bucket rows BROADCAST and the index is probed with a map-side hash
    * join — the corpus never shuffles and only index rows in buckets the
    * batch actually hits are touched. Matched buckets are capped at
    * `maxBucketSize` old rows (same mega-bucket reasoning as
    * [[lshCandidatePairsFromHashes]]; the count window runs over matched
    * rows only). Verification intersects precomputed shingle-hash arrays:
    * the match-side arrays are fetched by streaming the shingle index
    * through a broadcast semi-probe of the candidate ids — again no
    * corpus shuffle. Contract: ids are unique across index ∪ batch (the
    * id-inequality guard assumes an id never denotes two documents). */
  def incrementalNearDupPairs(
      newDocs: DataFrame, buckets: DataFrame, shingles: DataFrame,
      textCol: String, idCol: String,
      threshold: Double = 0.8, k: Int = 32, bands: Int = 8,
      shingleSize: Int = 5, maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    incrementalPairsFromHashes(
      newDocs.select(col(idCol).as("id"), shingleHashes(col(textCol), shingleSize).as("sh"))
        .localCheckpoint(), // ONE shingle pass; see incrementalPairsFromHashes
      buckets, shingles, threshold, k, bands, maxBucketSize)

  /** [[incrementalNearDupPairs]] over a PINNED precomputed `(id, sh)`
    * frame — the batch is shingled exactly once: the bucket branch, the
    * within-batch candidate pass, and both verify sides all read the
    * materialized hashes (r16 — the old shape re-ran the native
    * shingler for the bucket broadcast because it derived from the
    * un-checkpointed frame). `nsh` MUST be pinned by the caller. */
  private[graft] def incrementalPairsFromHashes(
      nsh: DataFrame, buckets: DataFrame, shingles: DataFrame,
      threshold: Double, k: Int, bands: Int,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val nb = bucketsFromHashes(nsh, k, bands)
    // new-vs-old: stream the index past the broadcast batch buckets
    val matched = buckets
      .join(broadcast(nb.withColumnRenamed("id", "new_id")), Seq("band", "bucket"))
      .filter(col("id") =!= col("new_id"))
    val bsz = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
    val newVsOld = matched
      .withColumn("bsz", count(lit(1)).over(bsz))
      .filter(col("bsz") <= maxBucketSize)
      .select(col("new_id"), col("id").as("match_id"))
      .distinct()
    // new-vs-new within the batch: the batch pipeline, smaller id wins
    val newVsNew = lshCandidatePairsFromHashes(nsh, k, bands, maxBucketSize)
      .select(col("id_b").as("new_id"), col("id_a").as("match_id"))
    val cands = newVsOld.unionAll(newVsNew).localCheckpoint()
    // verify: match-side sh from the union of index + batch (streamed
    // past the broadcast candidate ids), new-side sh from the batch
    val matchSh = shingles.select("id", "sh").unionAll(nsh)
      .join(broadcast(cands), col("id") === col("match_id"))
      .select(col("new_id"), col("match_id"), col("sh").as("match_sh"))
    matchSh
      .join(broadcast(nsh.select(col("id").as("new_id"), col("sh").as("new_sh"))), "new_id")
      .withColumn("jaccard", jaccardFromHashSets(col("new_sh"), col("match_sh")))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "match_id", "jaccard")
  }

  /** The rows of a new batch that SURVIVE incremental dedup: documents
    * near-duplicating neither the indexed corpus nor a smaller-id batch
    * row (the standing corpus is canonical; within the batch the keep-min
    * policy applies, matching [[nearDupGroups]]' survivor rule). The
    * anti-join keys on [[incrementalNearDupPairs]]' `new_id` — by its
    * convention every pair's new_id is the non-survivor. */
  def incrementalSurvivors(
      newDocs: DataFrame, buckets: DataFrame, shingles: DataFrame,
      textCol: String, idCol: String,
      threshold: Double = 0.8, k: Int = 32, bands: Int = 8,
      shingleSize: Int = 5): DataFrame = {
    val dups = incrementalNearDupPairs(newDocs, buckets, shingles,
      textCol, idCol, threshold, k, bands, shingleSize)
      .select(col("new_id").as(idCol)).distinct()
    newDocs.join(dups, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------------
  // Pair-set audit (dedup recall ladder)
  // ------------------------------------------------------------------

  /** Side-by-side audit of two undirected pair sets over the same id
    * space — the dedup twin of the ANN recall ladder
    * ([[graft.operators.Retrieval.rankingOverlap]]): `exact` is the
    * ground truth (brute-force Jaccard pairs), `approx` the candidate
    * path under audit (MinHash-LSH, SimHash, prefix filter, ...).
    * Output: one row per pair in EITHER set, with `in_exact`/`in_approx`
    * flags — recall = avg(in_approx where in_exact=1), precision the
    * transpose, and every miss is a named pair, not just a rate. Both
    * inputs are normalized to id_a < id_b first, so orientation never
    * fabricates a diff.
    *
    * 100 TB shape: pair sets are output-sized (the heavy work lives in
    * the operators that produced them); this is one full-outer
    * co-partitioned equi-join on (id_a, id_b). */
  def pairAudit(exact: DataFrame, approx: DataFrame): DataFrame = {
    def norm(df: DataFrame, flag: String) = df.select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
      .withColumn(flag, lit(1L))
    norm(exact, "in_exact")
      .join(norm(approx, "in_approx"), Seq("id_a", "id_b"), "full")
      .na.fill(0L, Seq("in_exact", "in_approx"))
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash of the token set: each token's hash votes ±1 per bit;
    * the sign vector is packed into one long. Native Catalyst expression
    * ([[graft.functions.SimHash64]]) — one JIT'd pass per row instead of
    * 64 interpreted lambda evaluations per token. No shuffle. */
  def simHash(text: Column): Column = graft.functions.TextHash.simHash64(text)

  /** Hamming distance between two 64-bit SimHash codes. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: the standard multi-band blocking scheme —
    * the 64-bit code is split into 4 disjoint 16-bit bands and pairs are
    * candidates when ANY band matches. By pigeonhole, a pair within
    * Hamming distance 3 differs in at most 3 bands, so at least one band
    * matches: recall is exactly 1.0 for maxDist ≤ 3 (asserted in
    * OperatorsSpec), at the cost of 4 block keys per row. Candidates are
    * verified with the full Hamming distance; only (band, block, id,
    * code) tuples shuffle. */
  def simHashNearDups(df: DataFrame, textCol: String, idCol: String, maxDist: Int = 3): DataFrame = {
    val codes = df.select(col(idCol).as("id"), simHash(col(textCol)).as("code"))
    val banded = codes.select(
      col("id"), col("code"),
      posexplode(array((0 until 4).map(q =>
        shiftrightunsigned(col("code"), q * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "block")))
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.block") === col("r.block") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.code").as("ca"), col("r.code").as("cb"))
      .distinct() // a close pair can share several bands
      .withColumn("dist", hammingDistance(col("ca"), col("cb")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  // ------------------------------------------------------------------
  // Benchmark contamination (decontamination pass)
  // ------------------------------------------------------------------

  /** Corpus documents sharing at least `minOverlap` distinct character
    * n-gram shingles with a benchmark document — the decontamination
    * check a training pipeline runs against its eval sets before
    * training. Output: (corpus_id, bench_id, overlap).
    *
    * Scale shape: eval sets are small by nature, so the benchmark side
    * shingles once and BROADCASTS (an explicit hint); the corpus side is
    * one shingle pass in the scan projection and a broadcast hash join —
    * the 100 TB corpus never shuffles. Overlap counting groups on
    * (corpus_id, bench_id), bounded by matched shingles only. A
    * benchmark too large to broadcast splits into broadcast-sized slices
    * unioned afterwards — overlap counts are per (corpus, bench) pair,
    * so slicing never changes results. */
  def contamination(
      corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String,
      shingleSize: Int = 8, minOverlap: Int = 10): DataFrame = {
    // shingleHashes is DISTINCT per document, so the join-match count per
    // (corpus_id, bench_id) IS the distinct-shingle intersection size
    val c = corpus.select(col(idCol).as("corpus_id"),
      explode(shingleHashes(col(textCol), shingleSize)).as("h"))
    val b = bench.select(col(idCol).as("bench_id"),
      explode(shingleHashes(col(textCol), shingleSize)).as("h"))
    c.join(broadcast(b), "h")
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** [[contamination]]'s scale path for eval sets too large to broadcast
    * even sliced: identical output (same minOverlap semantics), different
    * plan. The benchmark's distinct shingle hashes are folded into a
    * Bloom filter (a distributed treeAggregate — the driver holds only
    * the final bitmap, ~1.2 GB at 10^9 shingles / 1% fpp, vs ~10+ GB for
    * the exact hash set), the corpus side probes it MAP-SIDE with a
    * codegen'd expression ([[graft.functions.BloomProbe]]) dropping
    * ~(1-fpp) of its shingle rows before any exchange, and only the
    * survivors take the shuffle hash join against the benchmark shingles
    * — deliberately NOT broadcast here. Bloom filters have no false
    * negatives, so the join sees every true match and the exact join
    * erases the false positives: output ≡ [[contamination]], which is
    * how the gate checks it (same oracle). */
  def bloomContamination(
      corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String,
      shingleSize: Int = 8, minOverlap: Int = 10, fpp: Double = 0.01): DataFrame = {
    val b = bench.select(col(idCol).as("bench_id"),
      explode(shingleHashes(col(textCol), shingleSize)).as("h"))
    val bh = b.select("h").distinct()
    val filter = bh.stat.bloomFilter("h", math.max(bh.count(), 1L), fpp)
    val c = corpus.select(col(idCol).as("corpus_id"),
        explode(shingleHashes(col(textCol), shingleSize)).as("h"))
      .filter(graft.functions.BloomProbe.mightContainLong(filter, col("h")))
    c.join(b, "h")
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  // ------------------------------------------------------------------
  // Near-dup GROUPS: pairs → connected components
  // ------------------------------------------------------------------

  /** Connected components of an undirected edge list `(id_a, id_b)` →
    * `(id, component)` with `component` = the minimum id reachable, for
    * every vertex that appears in an edge. Pair detection (LSH) gives
    * EDGES; dedup survivors need COMPONENTS (doc A ~ B ~ C must keep one
    * survivor even when (A, C) was never emitted as a pair).
    *
    * Algorithm: per round, (1) min-label propagation — every vertex takes
    * the min of its own and its neighbors' labels (one hash join +
    * partial-min aggregation, both sides co-partitioned on the join key
    * after round 1) — then (2) POINTER JUMPING: each vertex re-reads its
    * label's own label (`component(component(v))`, one self-join; every
    * label is a vertex id, so the lookup always resolves). Jumping halves
    * the distance to the component minimum each round, so convergence is
    * O(log diameter) — ~20 rounds covers a million-hop chain — while dup
    * clusters (near-cliques, diameter ≲ 3) converge in 2-3. Equivalent
    * round complexity to large-star/small-star contraction (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SOCC'14) with
    * the same 2-joins-per-round cost. Lineage is cut per round with
    * `localCheckpoint`; the loop stops the first round nothing changes
    * (one O(V) existence check per round, dwarfed by the joins it gates)
    * and FAILS rather than returning half-merged labels if `maxIter`
    * rounds weren't enough. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialize the edge list ONCE: `sym` is scanned every round, and
    // without the checkpoint each round would re-execute the whole
    // upstream pipeline that produced the pairs (for nearDupGroups, the
    // full LSH candidate generation — rounds × that cost)
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (round < maxIter && !converged) {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("component")), "dst")
        .groupBy(col("src").as("id")).agg(min("component").as("neighbor_min"))
      val propagated = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component").as("_old"),
          least(col("component"), coalesce(col("neighbor_min"), col("component")))
            .as("component"))
      val jumped = propagated.as("x")
        .join(propagated.select(col("id").as("cid"), col("component").as("ccomp")),
          col("x.component") === col("cid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("ccomp"), col("x.component")).as("component"),
          col("x._old").as("_old"))
        .localCheckpoint()
      // round 0 always changes labels when edges exist (every component
      // has ≥2 vertices, so every non-minimum vertex updates) — skip the
      // O(V) convergence scan there. The previous label rides through
      // the checkpoint as a column, so the change test is a SCAN of the
      // just-materialized frame, not a join back to the old labels
      // (r16, guide §2.4 — one join + its two exchanges saved per round)
      converged = round > 0 &&
        jumped.filter(col("component") =!= col("_old")).isEmpty
      labels = jumped.select("id", "component")
      round += 1
    }
    require(converged,
      s"connected components did not converge in $maxIter rounds — raise maxIter")
    labels
  }

  /** Near-duplicate GROUPS over a corpus: LSH pair detection
    * ([[nearDupPairs]]) followed by [[connectedComponents]] —
    * `(doc_id, group_id)` for every document in at least one near-dup
    * pair, `group_id` = min doc_id of its cluster (the survivor under
    * the keep-min policy). */
  def nearDupGroups(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, k: Int = 32, bands: Int = 8,
      shingleSize: Int = 5): DataFrame =
    connectedComponents(
      nearDupPairs(df, textCol, idCol, threshold, k, bands, shingleSize)
        .select("id_a", "id_b"))
      .select(col("id").as("doc_id"), col("component").as("group_id"))
}
