package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication via distributed suffix ranking — the
  * Lee et al. 2021 "Deduplicating Training Data Makes Language Models
  * Better" ExactSubstr pass: find every VARIABLE-LENGTH substring of
  * length ≥ L that occurs more than once anywhere in the corpus. The
  * fixed-n `span_dedup` catches n-gram spans; this is the true
  * suffix-array formulation, built on prefix doubling (Manber–Myers),
  * generalized to tuple fan-in: rank every corpus position's k-prefix,
  * then per round rank TUPLES `(rank@k(i), rank@k(i+k), …,
  * rank@k(i+target−k))` — the pairwise `rank@2k(i) = rank of
  * (rank@k(i), rank@k(i+k))` recurrence with up to [[Fanin]] components
  * per round (the final offset overlaps, `target−k ≤ (m−1)k + k`, the
  * standard trick), so k multiplies by Fanin per round. Two
  * positions share a rank@L class iff their L-character prefixes are
  * EQUAL — and the ranks are ORDER-preserving (each round assigns dense
  * ranks in (ra, rb) sort order), so the final table is a genuine
  * partial suffix array: the primitive longest-common-prefix and
  * suffix-ordering queries build on, not just an equality partition.
  *
  * A position i is duplicated when its rank@L class has ≥ 2 members;
  * maximal RUNS of duplicated positions within a document merge into
  * spans (run start .. last start + L − 1) — which is how variable
  * length falls out of fixed-L ranking: a 180-char repeat is 131
  * consecutive duplicated 50-prefixes, one span.
  *
  * 100 TB shape: O(log L) rounds, each a constant number of KEYED
  * shuffles over the n-position frame — a per-document `lead(rank,
  * off)` window (partitions bounded by document length), then a
  * distributed dense rank computed DIRECTLY on the tuple frame
  * ([[Stats.rangePrefixSum]]'s slice idiom: range-repartition on the
  * tuple keys, per-slice `dense_rank`, a |partitions|-row distinct-
  * count offset frame broadcast back — no global-order window
  * anywhere, and since r16 no distinct pass and no join-back either:
  * two data-sized exchanges per round instead of five). Total work
  * O(n log L) shuffle bytes — the suffix-array bound — with
  * `localCheckpoint` pinning each round (the pageRank iteration
  * discipline: lineage would otherwise double per round AND the rank
  * branch/offset branch must see one range-boundary draw). Driver
  * state per round: nothing data-sized (the offsets frame is
  * |partitions| rows). */
object SuffixDedup {

  /** Order-preserving dense rank of every position's `prefixLen`-prefix:
    * `(doc_id, pos, len, rank)` — pos is 1-based; positions within
    * `prefixLen−1` of the end rank by their (shorter) actual suffix,
    * padded with a sentinel that sorts before every real rank, so equal
    * ranks always mean equal prefixes (never the converse trap). */
  /** Seed width of the direct substring bucket rank — the standard SA
    * "initial radix pass": ranking the raw W-char substring in ONE
    * dense-rank pass replaces log2(W) doubling rounds. Order-safe
    * because Spark compares strings byte-wise and UTF-8 byte order IS
    * code-point order, and a short end-of-document substring sorts
    * BEFORE every extension — exactly the −1 sentinel's semantics. */
  private val SeedWidth = 8

  def suffixRanks(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      prefixLen: Int = 50): DataFrame = {
    require(prefixLen >= 2 && prefixLen <= 4096,
      s"prefixLen out of range: $prefixLen")
    val w = math.min(SeedWidth, prefixLen)
    val positions = docs
      .select(col(idCol).as("doc_id"),
        length(col(textCol)).cast("long").as("len"),
        // per-position gram extraction must NOT use substring(_t, pos):
        // UTF8String.substring walks from the string START to find the
        // character offset — O(pos) per call, O(n²) per document, which
        // the 1 MB-document stress probe measured as CPU-hours in one
        // task (scaling batch 10). Splitting to a char array once is
        // O(n); slice() then indexes in O(1) and copies w chars.
        expr(s"filter(split($textCol, ''), c -> c <> '')").as("_cs"))
      // Spark's sequence(1, 0) DESCENDS ([1, 0]): an empty or NULL
      // document would emit bogus pos=1/pos=0 rows at nonexistent
      // positions from this public surface (r15 advice —
      // OnlineSuffixDedup guards the same trap with its short-doc
      // filter; the span/removal consumers happened to filter the
      // rows back out, direct callers did not)
      .filter(col("len") >= 1L)
      .select(col("doc_id"), col("len"),
        explode(expr("sequence(1L, len)")).as("pos"), col("_cs"))
      .select(col("doc_id"), col("len"), col("pos"),
        array_join(slice(col("_cs"), col("pos").cast("int"), lit(w)), "").as("g"))
      // pinned: the rank pass below consumes the frame twice (the range
      // exchange's sampling job plus the shuffle itself) and the gram
      // explode is the most expensive projection of the whole chain
      .localCheckpoint()
    var ranks = denseRankOver(positions, Seq("g"))
    var k = w
    while (k < prefixLen) {
      // generalized doubling with fan-in: one round ranks TUPLES of up
      // to [[Fanin]] current ranks at offsets (k, 2k, …, target−k), so
      // each round multiplies k by up to Fanin instead of 2 — L=50 from
      // an 8-char seed is ONE tuple round, not three pair rounds. Order
      // preservation is the pair argument componentwise: adjacent
      // offsets differ by ≤ k, so with components 0..i−1 tied, chars
      // [0, j_{i−1}+k) are equal and component i (rank at offset j_i ≤
      // j_{i−1}+k) decides exactly the next chunk. All lead()s evaluate
      // in ONE blocked per-document window sort. −1 (below every dense
      // rank) where the document ends first — shorter sorts before
      // extension.
      val target = math.min(prefixLen, k * Fanin)
      val offs = ((k until (target - k) by k) :+ (target - k))
        .distinct.filter(_ > 0)
      // r17 skew fix (guide §2.5): a Window.partitionBy("doc_id") lead
      // pass serializes EVERY position of a document in one task — a
      // multi-MB document is a single million-row sort partition (the
      // suffix_big_doc stress shape; at 100 TB one multi-GB document
      // would serialize the whole round). Instead the positions are cut
      // into fixed [[LeadBlock]]-position blocks keyed (doc_id, _blk),
      // with the first maxOff positions of each block COPIED to the
      // previous block (boundary-overlap ghosts, maxOff < LeadBlock by
      // the prefixLen ≤ 4096 bound), so every lead(rank, o ≤ maxOff)
      // still sees its target row inside its own block partition.
      // Window partitions are bounded by LeadBlock + maxOff rows no
      // matter how large the document; ghost copies add maxOff/LeadBlock
      // (< 0.5%) shuffle rows. Positions are contiguous 1..len, one row
      // each, so lead-by-rows ≡ lead-by-position within a block exactly
      // as it did per document.
      val maxOff = offs.max.toLong
      // exact integer division (never Spark's double `/`, which loses
      // exactness past 2^53): LeadBlock is a power of two
      val ownBlkI = shiftright(col("pos") - 1L, LeadBlockShift)
      val blocked = ranks.withColumn("_blk", explode(
        when(ownBlkI > 0L && pmod(col("pos") - 1L, lit(LeadBlock.toLong)) < maxOff,
          array(ownBlkI, ownBlkI - 1L))
          .otherwise(array(ownBlkI))))
      val wBlk = Window.partitionBy("doc_id", "_blk").orderBy("pos")
      val leadCols = offs.zipWithIndex.map { case (o, i) =>
        coalesce(lead(col("rank"), o).over(wBlk), lit(-1L)).as(s"_r${i + 1}")
      }
      val paired = blocked.select(
        (Seq(col("doc_id"), col("len"), col("pos"), col("rank"),
          col("_blk")) ++ leadCols): _*)
        // ghost rows exist only to FEED leads across the block boundary;
        // their own lead values are truncated (the window ends at the
        // ghost range) and must not survive
        .filter(col("_blk") === ownBlkI)
        .drop("_blk")
        // pinned per round (the discipline the old shape applied to the
        // rank frame): the rank pass's range sampling would otherwise
        // re-execute the blocked lead() window — exchange + sort —
        // a second time, and lineage must not double per round
        .localCheckpoint()
      val keyCols = "rank" +: offs.indices.map(i => s"_r${i + 1}")
      ranks = denseRankOver(paired, keyCols)
      k = target
    }
    ranks
  }

  /** Block length (in positions) of the doubling rounds' lead windows:
    * bounds any window sort partition at LeadBlock + maxOff rows
    * regardless of document size. Must exceed the largest lead offset
    * (maxOff < prefixLen ≤ 4096), so one ghost block suffices. A fixed
    * bound, not a local-core-count tune: block COUNT grows with the
    * data, so parallelism scales while per-task state stays constant. */
  private val LeadBlockShift = 15
  private val LeadBlock = 1 << LeadBlockShift

  /** Tuple fan-in per generalized-doubling round: each round covers up
    * to Fanin·k characters with one rank pass (8-long keys keep the
    * range-partition sort cheap while collapsing L=50 to one round). */
  private val Fanin = 8

  /** Order-preserving global dense rank of `keyCols` computed DIRECTLY on
    * the (non-distinct) position frame, without a global-order window:
    * range-repartition on the keys (identical keys land in one range
    * partition by contract), `dense_rank` locally per partition slice,
    * broadcast back the |partitions|-row offsets frame carrying each
    * slice's distinct-key count (the [[Stats.rangePrefixSum]] idiom) —
    * local dense rank + earlier slices' distinct counts IS the global
    * dense rank. Returns `(doc_id, len, pos, rank)`.
    *
    * r16 optimization (guide §2.4): the previous shape ranked the
    * DISTINCT key frame and sort-merge-joined it back — per rank pass
    * that cost a distinct exchange, a row_number window exchange, and a
    * TWO-sided join-back exchange over data-sized frames (5 exchanges +
    * 2 extra sorts). Ranking in place costs exactly TWO data-sized
    * exchanges (range + the slice window's hash-by-_pid) and no join.
    * Worst-case skew is unchanged: a giant rank class used to serialize
    * in the join-back's merge partition; now it serializes in the range
    * slice — both bounded by the class size, never the corpus. */
  private def denseRankOver(frame: DataFrame, keyCols: Seq[String]): DataFrame = {
    val parts =
      math.max(frame.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val lw = Window.partitionBy("_pid").orderBy(keyCols.map(col): _*)
    // r17 (guide §1.2): the local dense rank rides INSIDE the pinned
    // pass. The r16 shape pinned the raw range-sliced frame and then
    // paid a full count_distinct aggregate pass over it for the offsets
    // — but max(local dense rank) per slice IS the slice's distinct-key
    // count, available for free once the window has run. One window
    // pass instead of window + count_distinct, and the pin narrows to
    // (doc_id, len, pos, _pid, _ldr) — the slice keys (the widest
    // columns: the seed gram / the rank tuple) are dropped before
    // materialization. The single localCheckpoint still fixes ONE
    // range-boundary draw for both consumers. Also null-safe where the
    // old offsets were not: dense_rank ranks a NULL key as a real
    // value and max(_ldr) counts it, while count_distinct skipped
    // NULL-keyed rows (unreachable from current callers, but the
    // helper no longer has the precondition).
    val ranked = frame
      .repartitionByRange(parts, keyCols.map(col): _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_ldr", dense_rank().over(lw).cast("long"))
      .select("doc_id", "len", "pos", "_pid", "_ldr")
      .localCheckpoint()
    val offsets = ranked.groupBy("_pid").agg(max("_ldr").as("_ptot"))
      .withColumn("_off", coalesce(sum("_ptot").over(
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_pid", "_off")
    ranked
      .join(broadcast(offsets), Seq("_pid"))
      .select(col("doc_id"), col("len"), col("pos"),
        (col("_off") + col("_ldr")).as("rank"))
  }

  /** One row per rank CLASS of [[suffixRanks]] with the (≤ prefixLen)
    * window text every member shares: `(rank, n_occ, window)`. Members
    * of a class have identical windows by the rank invariant (equal
    * ranks ⇔ equal truncated suffixes, including the shorter-at-end
    * semantics), so one representative — the min (doc_id, pos) — is
    * joined back to its document to extract the text.
    *
    * 100 TB shape: one keyed aggregate over the rank frame (map-side
    * combined min/count), one equi-join back to the documents on
    * doc_id, one bounded substring projection. Output is |classes| ≤ n
    * rows; nothing driver-sized. */
  def classWindows(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      prefixLen: Int = 50): DataFrame = {
    val reps = suffixRanks(docs, idCol, textCol, prefixLen)
      .groupBy("rank")
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("doc_id"), col("pos"))).as("_rep"))
      .select(col("rank"), col("n_occ"),
        col("_rep.doc_id").as("doc_id"), col("_rep.pos").as("pos"))
    // char-array slice, not substring(_t, pos): UTF8String.substring is
    // O(pos) per call (see suffixRanks) and there can be ~n classes
    reps.join(
        docs.select(col(idCol).as("doc_id"),
          expr(s"filter(split($textCol, ''), c -> c <> '')").as("_cs")),
        "doc_id")
      .select(col("rank"), col("n_occ"),
        array_join(slice(col("_cs"), col("pos").cast("int"), lit(prefixLen)), "")
          .as("window"))
  }

  /** Length of the common prefix of two strings, as a codegen'd HOF
    * projection bounded by the window length: the prefix-equality run
    * is contiguous from position 1, so `acc` advances exactly while
    * every earlier character matched. Guarded for the zero-length
    * side (Spark's sequence(1, 0) DESCENDS). */
  private[graft] def lcpCol(a: Column, b: Column): Column = {
    val n = least(length(a), length(b))
    when(n < 1, lit(0)).otherwise(
      aggregate(sequence(lit(1), n), lit(0),
        (acc, i) => when(acc === i - lit(1) &&
          a.substr(i, lit(1)) === b.substr(i, lit(1)), i).otherwise(acc)))
  }

  /** The longest repeated substring of the corpus, bounded at
    * `prefixLen` — the first consumer of the rank ORDER itself, not
    * just its equality classes (r15 verdict #3): the classic
    * suffix-array theorem says the maximum LCP over ALL suffix pairs
    * is attained by a RANK-ADJACENT pair, so deriving the answer from
    * neighbor LCPs alone is correct ONLY if [[suffixRanks]]' dense
    * ranks really are the lexicographic suffix order — the Kasai
    * adjacency, hash-checked end-to-end by the `suffix_lrs` gate
    * against a brute-force per-length oracle.
    *
    * Candidates: a class with ≥ 2 occurrences repeats its whole window
    * (two distinct positions share it, overlap allowed — standard LRS
    * semantics); a rank-adjacent class pair (r, r+1) repeats their
    * common prefix. The maximum over both families, tie-broken to the
    * lexicographically smallest substring, is returned as ONE row
    * `(lrs_len, lrs)` — `(0, '')` for a repeat-free corpus.
    *
    * 100 TB shape: [[classWindows]] (keyed), a self equi-join on
    * rank+1 (dense ranks — no global-order window), the bounded-L LCP
    * projection, and a `TakeOrderedAndProject` limit 1 — nothing
    * data-sized on the driver. */
  def longestRepeatedSubstring(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      prefixLen: Int = 50): DataFrame = {
    val classes = classWindows(docs, idCol, textCol, prefixLen)
      .localCheckpoint() // consumed twice (within-class + self-join)
    val within = classes.filter(col("n_occ") >= 2L)
      .select(length(col("window")).cast("long").as("len"),
        col("window").as("sub"))
    val left = classes.select(col("rank"), col("window").as("_wa"))
    val right = classes.select((col("rank") - 1L).as("rank"),
      col("window").as("_wb"))
    val lcp = lcpCol(col("_wa"), col("_wb"))
    val adjacent = left.join(right, "rank")
      .select(lcp.cast("long").as("len"),
        col("_wa").substr(lit(1), lcp).as("sub"))
      .filter(col("len") >= 1L)
    val empty = docs.sparkSession.range(1)
      .select(lit(0L).as("len"), lit("").as("sub"))
    within.unionByName(adjacent).unionByName(empty)
      .orderBy(col("len").desc, col("sub").asc)
      .limit(1)
      .select(col("len").as("lrs_len"), col("sub").as("lrs"))
  }

  /** The cleaning half of ExactSubstr — Lee et al. actually CUT the
    * duplicated text: remove, from every document except the owning
    * one, the characters covered by any cross-document duplicated
    * `minLen`-window ([[TextCorpus.dedupSpans]]' convention at the
    * character level: a class must span ≥ 2 DISTINCT documents, the
    * smallest doc_id owns the text and keeps it intact). Returns
    * `(doc_id, kept_text, removed_chars, removed_spans)` where
    * `removed_spans` counts flagged window occurrences and
    * `removed_chars` the distinct characters cut.
    *
    * Same O(n log L) ranking chain; the removal tail is two keyed
    * aggregates + a per-document covered-positions rebuild (the
    * dedupSpans HOF-filter idiom — the covered list is bounded by
    * document length, never corpus-sized). */
  def removeDuplicatedSpans(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minLen: Int = 50): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("_t"))
    val ranks = suffixRanks(docs, idCol, textCol, minLen)
      .filter(col("pos") <= col("len") - lit(minLen.toLong) + 1L)
    // cross-document test + owner in ONE rank-keyed window pass (r16,
    // guide §2.4 — the old groupBy(rank)+join-back re-exchanged the
    // whole rank frame a second time): a class spans ≥ 2 distinct
    // documents iff its min and max doc_id differ, and the min IS the
    // owner — same predicate, one exchange instead of three
    val wRank = Window.partitionBy("rank")
    val flagged = ranks
      .withColumn("_own", min("doc_id").over(wRank))
      .withColumn("_mxd", max("doc_id").over(wRank))
      .filter(col("_mxd") =!= col("_own") && col("doc_id") =!= col("_own"))
      .select("doc_id", "pos")
    cutCovered(base, flagged, minLen)
  }

  /** The removal tail shared with [[graft.streaming.OnlineSuffixDedup]]:
    * cut each flagged `minLen`-window's characters from `base`
    * (`(doc_id, _t)`) given the flagged `(doc_id, pos)` occurrences.
    *
    * r16 rewrite (guide §2.4 + asymptotics): the old shape exploded
    * every covered position into a per-document `collect_set` and
    * rebuilt the text by probing `array_contains` PER CHARACTER —
    * O(doclen × covered) per document, quadratic on a heavily-covered
    * document (the regime ExactSubstr exists for). This shape merges
    * the flagged windows into disjoint covered INTERVALS with the
    * running-max gaps-and-islands sweep (overlap or abutment chains an
    * island) and rebuilds the kept text as the complement slices —
    * O(doclen + islands) per document, and the whole tail is ONE
    * doc-keyed exchange (window, island agg, and per-doc agg all share
    * the hash(doc_id) clustering) instead of two. */
  private[graft] def cutCovered(
      base: DataFrame, flagged: DataFrame, minLen: Int): DataFrame = {
    val w1 = Window.partitionBy("doc_id").orderBy("pos")
    val iv = flagged
      .withColumn("_e", col("pos") + lit(minLen - 1).cast("long"))
      .withColumn("_pmax",
        max("_e").over(w1.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_pmax").isNull || col("pos") > col("_pmax") + 1L, 1L)
          .otherwise(0L))
      .withColumn("_isl", sum("_new").over(w1))
    val merged = iv.groupBy("doc_id", "_isl")
      .agg(min("pos").as("s"), max("_e").as("e"),
        count(lit(1)).as("_n_spans"))
    val covered = merged.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"),
        sum(col("e") - col("s") + 1L).as("removed_chars"),
        sum(col("_n_spans")).as("removed_spans"))
    // char-array slice, not substring(_t, ...): UTF8String.substring is
    // O(pos) per call (see suffixRanks); interval lists are bounded by
    // |islands| ≤ doclen/1, in practice tiny
    val chars = expr("filter(split(_t, ''), c -> c <> '')")
    val n = size(col("ivs"))
    val kept = when(col("ivs").isNull, col("_t"))
      .otherwise(array_join(flatten(transform(
        sequence(lit(0), n),
        i => {
          val start = when(i === 0, lit(1L))
            .otherwise(element_at(col("ivs"), i).getField("e") + 1L)
          val end = when(i === n, length(col("_t")).cast("long"))
            .otherwise(element_at(col("ivs"), i + 1).getField("s") - 1L)
          slice(chars, start.cast("int"),
            greatest(end - start + 1L, lit(0L)).cast("int"))
        })), ""))
    base.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), kept.as("kept_text"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        coalesce(col("removed_spans"), lit(0L)).as("removed_spans"))
  }

  /** The ExactSubstr pass: maximal spans of length ≥ `minLen` whose
    * every `minLen`-prefix occurs ≥ 2 times in the corpus —
    * `(doc_id, span_start, span_end, span_len)`, 1-based inclusive
    * character offsets. Output is |duplicated spans|, not |corpus|. */
  def duplicatedSpans(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      minLen: Int = 50): DataFrame = {
    val ranks = suffixRanks(docs, idCol, textCol, minLen)
      // only positions with a full minLen-prefix can witness a
      // duplicate of length >= minLen (a shared shorter tail is not one)
      .filter(col("pos") <= col("len") - lit(minLen.toLong) + 1L)
    // class size in ONE rank-keyed window pass (r16, guide §2.4 — the
    // old groupBy(rank)+join-back re-exchanged the rank frame twice)
    val marked = ranks
      .withColumn("_n_occ", count(lit(1)).over(Window.partitionBy("rank")))
      .filter(col("_n_occ") >= 2L)
      .select("doc_id", "pos")
    // marked positions -> maximal runs per document (the islands trick:
    // consecutive positions share pos - row_number; keyed window only)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    marked
      .withColumn("_grp", col("pos") - row_number().over(w).cast("long"))
      .groupBy("doc_id", "_grp")
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(minLen.toLong) - 1L).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_len"))
  }
}
