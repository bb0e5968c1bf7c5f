package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (HyperLogLog, Flajolet et al. 2007;
  * the practical corrections follow Heule et al. 2013 §4's small-range
  * branch). The register state is EXACT integer arithmetic end to end —
  * md5-derived 60-bit hash, integer bucket split, `55 − bitlen(suffix)`
  * rank — so unlike the usual float-summed implementations the sketch is
  * bit-reproducible across engines and therefore hash-gateable: a DuckDB
  * oracle recomputes the identical registers and scaled harmonic sum.
  * Only the final cardinality estimate touches floating point, and that
  * is derived from the exact scaled sum in one driver-free expression.
  *
  * Why this shape at 100 TB: the register table IS the partial-aggregate
  * state. `groupBy(bucket).agg(max(rho))` combines map-side, so each of
  * 1000 executors ships at most 2^p rows regardless of input size, and
  * sketch union ([[hllMerge]]) is the same max — the classic mergeable-
  * summary contract (one sketch per day/source, roll up for any range
  * without rescanning, the pattern Bench's sketch-rollup scenario
  * measures). The reference has no sketches; this is part of the
  * SURVEY §2 "beyond the reference" analytics mandate.
  */
object Sketches {

  /** Hash bits drawn from md5 (15 hex chars = 60 bits keeps the value
    * comfortably inside a signed long for cross-engine `conv`). */
  val HashBits = 60

  /** HLL register table for `c` at precision `p` (m = 2^p registers):
    * one row per OCCUPIED bucket, `(bucket, rho)` with
    * `rho = max over values of (leading zeros of the (60−p)-bit suffix)
    * + 1` — integer-exact via `bitlen` (`length(bin(x))`), never a float
    * log. Absent buckets mean register 0, kept implicit so the state
    * stays ≤ m rows. One partial-agg shuffle of ≤ m rows per partition. */
  def hllRegisters(df: DataFrame, c: Column, p: Int): DataFrame =
    hllRegistersBy(df, Seq.empty, c, p)

  /** Grouped register tables: one HLL per key of `by` — the
    * approx-distinct-per-group building block (daily/per-source sketch
    * tables that roll up to any range by [[hllMerge]]-style max without
    * rescanning; the Bench sketch-rollup scenario's economics). Same
    * single partial-agg shuffle; state is ≤ |groups|·2^p rows. */
  def hllRegistersBy(df: DataFrame, by: Seq[String], c: Column, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"precision p=$p outside [4,16]")
    val suffixBits = HashBits - p
    val h = conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    val bucket = shiftright(h, suffixBits).as("bucket")
    val suffix = h.bitwiseAND(lit((1L << suffixBits) - 1))
    val rho = when(suffix === 0, lit(suffixBits + 1))
      .otherwise(lit(suffixBits + 1) - length(bin(suffix)))
    df.select(by.map(col) :+ bucket :+ rho.as("rho"): _*)
      .groupBy((by :+ "bucket").map(col): _*).agg(max("rho").as("rho"))
  }

  /** Per-group exact sketch state (the grouped twin of [[hllState]]):
    * one row per `by` key with m, v_zero, and the scaled harmonic sum —
    * hash-gateable like the global state. */
  def hllStateBy(registers: DataFrame, by: Seq[String], p: Int): DataFrame = {
    val suffixBits = HashBits - p
    val m = 1L << p
    val scale = lit(1L << (suffixBits + 1))
    registers
      .groupBy(by.map(col): _*)
      .agg(
        count(lit(1)).as("occupied"),
        sum(expr(s"shiftleft(cast(1 as bigint), ${suffixBits + 1} - rho)")
          .cast("decimal(38,0)")).as("s_occ"))
      .select(by.map(col) ++ Seq(
        lit(m).as("m"),
        (lit(m) - col("occupied")).as("v_zero"),
        (coalesce(col("s_occ"), lit(0).cast("decimal(38,0)")) +
          (lit(m) - col("occupied")).cast("decimal(38,0)") * scale)
          .cast("decimal(38,0)").as("s_scaled")): _*)
  }

  /** Sketch union: register-wise max. Two (or n, via repeated union)
    * sketches over disjoint or overlapping data merge into exactly the
    * sketch of the combined data — the property [[graft.SketchesSpec]]
    * pins and the `hll_merge_registers` gate hash-checks. GLOBAL
    * sketches only: merging [[hllRegistersBy]] tables through this
    * would max-merge ACROSS groups; use [[hllMergeBy]] with the same
    * key set instead. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    hllMergeBy(a, b, Seq.empty)

  /** Grouped sketch union — the rollup step for [[hllRegistersBy]]
    * tables (daily/per-source registers → any range): register-wise
    * max WITHIN each `by` key. The merge law holds per group because
    * it holds per register. */
  def hllMergeBy(a: DataFrame, b: DataFrame, by: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((by :+ "bucket").map(col): _*)
      .agg(max("rho").as("rho"))

  /** Exact integer sketch state, one row: `m`, `v_zero` (empty
    * registers), and `s_scaled` = 2^(suffixBits+1) × Σ_j 2^−rho_j over
    * all m registers (empty register ⇒ rho=0 ⇒ term 2^0). Every term
    * `2^(suffixBits+1−rho)` is an exact long; the sum is carried as
    * decimal(38,0) (worst case m·2^55 = 2^71 at p=16 — far inside 38
    * digits). This row is the entire serialization of the sketch's
    * harmonic core, and it is what the cross-engine gate hashes. */
  def hllState(registers: DataFrame, p: Int): DataFrame =
    hllStateBy(registers, Seq.empty, p)

  // ------------------------------------------------------------------
  // Count-min sketch (Cormode & Muthukrishnan 2005): d×w counter matrix,
  // point estimate = min over the d row counters. Everything — counters
  // AND estimates — is integer arithmetic over salted md5 hashes, so
  // unlike most sketches even the ESTIMATE is hash-gateable cross-engine
  // (HLL above gates its registers but its estimate is float). Counters
  // are additive, so the merge law is a register-wise SUM.
  // ------------------------------------------------------------------

  /** CMS counter table for `c` with `d` rows (salted hash functions) and
    * `w` columns: one output row per occupied (hash_row, col) cell,
    * `cnt` = number of input rows landing there (weights = 1). Absent
    * cells are implicit zeros. The (row, col) aggregate partial-combines
    * map-side, so each executor ships at most d·w cells regardless of
    * input size — the same mergeable-summary contract as [[hllRegisters]].
    * Column index comes from the first 15 hex chars of
    * `md5("cms<row>:" || value)` mod w — exact integers, no float. */
  def cmsCounters(df: DataFrame, c: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 8, s"cms depth d=$d outside [1,8]")
    require(w >= 2, s"cms width w=$w must be >= 2")
    // one scan: the d column indexes ride a per-row array, posexplode
    // yields (hash_row, col) — not d unioned passes over the data
    df.select(posexplode(array((0 until d).map(r => cmsCol(c, r, w)): _*))
        .as(Seq("hash_row", "col")))
      .groupBy("hash_row", "col").agg(count(lit(1)).as("cnt"))
  }

  /** Column index of value `c` under hash row `r`: first 60 bits of the
    * salted md5, mod w — exact integers, no float, engine-portable. */
  private def cmsCol(c: Column, r: Int, w: Int): Column =
    pmod(
      conv(substring(md5(concat(lit(s"cms$r:"), c.cast("string"))), 1, 15), 16, 10)
        .cast("long"),
      lit(w.toLong))

  /** CMS merge: counter-wise sum (sketch of A ⊎ B ≡ merge of sketches —
    * the additive twin of [[hllMerge]]'s max). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("hash_row", "col").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates for `keys` (a one-column frame named
    * `key`) against a counter table: re-hash each key per row, look its
    * cell up, take the min over the d rows; a key whose cell is absent
    * has count 0. The COUNTER side broadcasts — it is ≤ d·w rows by
    * construction, so the keys side can be arbitrarily large and never
    * shuffles for the lookup. Guaranteed ≥ the true count, ≤ true + εN
    * with ε = e/w (the classic CMS bound
    * [[graft.operators.SketchesSpec]] checks). Integer end to end. */
  def cmsEstimate(counters: DataFrame, keys: DataFrame, d: Int, w: Int): DataFrame = {
    val hashed = keys.select(
      col("key"),
      posexplode(array((0 until d).map(r => cmsCol(col("key"), r, w)): _*))
        .as(Seq("hash_row", "col")))
    hashed
      .join(broadcast(counters), Seq("hash_row", "col"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Equi-join size estimate from two CMS counter tables over the join
    * key (Cormode & Muthukrishnan 2005 §4.2's inner-product estimator):
    * per hash row, Σ_col a_cnt·b_cnt; the estimate is the MIN over the d
    * rows. Never below the true join cardinality, ≤ true + εNaNb — the
    * cheap cardinality service a join planner wants before committing to
    * a shuffle strategy at 100 TB, computed from two ≤ d·w-row sketches
    * without touching the data again. Integer end to end (decimal(38,0)
    * sums: the products are N²-scaled), so it hash-gates cross-engine
    * like the counters themselves. */
  def cmsInnerProduct(a: DataFrame, b: DataFrame): DataFrame =
    a.alias("a")
      // LEFT join: a hash row with zero overlapping cells is a valid —
      // and binding — row of the min (its inner product is 0); an inner
      // join would drop it, overestimate, and return NULL instead of 0
      // for fully disjoint sketches
      .join(b.alias("b"), Seq("hash_row", "col"), "left")
      .groupBy("hash_row")
      // cast each side BEFORE multiplying: a long*long product of two
      // heavy-hitter counters (~4e9 each) wraps past 2^63 — the same
      // bug class fixed in giniImpurity's c-squared
      .agg(sum(col("a.cnt").cast("decimal(38,0)")
        * coalesce(col("b.cnt"), lit(0L)).cast("decimal(38,0)")).as("ip"))
      .agg(coalesce(min("ip"), lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("est_join_size"))

  /** Cardinality estimate from the exact state: the raw HLL estimator
    * `alpha_m · m² / Σ 2^−rho` with the small-range linear-counting
    * branch (`m · ln(m / v_zero)` when the raw estimate ≤ 2.5m and empty
    * registers remain — Flajolet et al. 2007 §4). The only floating
    * point in the sketch, applied to one row. */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame = {
    val suffixBits = HashBits - p
    val m = (1L << p).toDouble
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val scale = math.pow(2.0, suffixBits + 1)
    hllState(registers, p).select(
      col("m"), col("v_zero"),
      when(
        col("v_zero") > 0 &&
          lit(alpha) * lit(m * m) / (col("s_scaled").cast("double") / lit(scale))
            <= lit(2.5 * m),
        lit(m) * log(lit(m) / col("v_zero").cast("double")))
        .otherwise(
          lit(alpha) * lit(m * m) / (col("s_scaled").cast("double") / lit(scale)))
        .as("estimate"))
  }

  // ------------------------------------------------------------------
  // Q-digest: the mergeable QUANTILE sketch (Shrivastava et al.,
  // SenSys'04; mergeability per Agarwal et al., PODS'12) — completes
  // the sketch triad: distinct counts (HLL), frequencies (CMS), ranks/
  // quantiles (this). Unlike GK (sequential) or KLL/t-digest
  // (randomized / merge-order-dependent), a bottom-up level-synchronous
  // q-digest build is a DETERMINISTIC function of the value histogram,
  // so the node set is bit-reproducible across engines and hash-gateable
  // — DuckDB rebuilds the identical tree from the same unrolled
  // level-by-level compression.
  //
  // State: nodes (lvl, idx, cnt) of the dyadic tree over [0, 2^L);
  // node (lvl, idx) covers [idx·2^lvl, (idx+1)·2^lvl). Compression
  // merges a sibling pair into its parent whenever childSum + parentCnt
  // < thr = max(n/k, 1), level by level from the leaves — at most
  // O(k·L) nodes survive, and any rank query is answered within
  // n·log2(U)/k of the truth.
  //
  // 100 TB shape: the ONE data-sized operation is the leaf histogram
  // (groupBy(bucket).count(), map-side combined — each executor ships
  // at most 2^L partial rows); the L compression rounds run on the
  // reduced ≤2^L-row frame. Merge = nodewise count sum + one
  // recompression at the combined threshold — the mergeable-summary
  // contract (per-day/per-source quantile sketches roll up to any range
  // without rescanning).
  // ------------------------------------------------------------------

  /** One bottom-up compression pass: level by level, every sibling pair
    * whose combined count plus the current parent count stays under
    * `thr` folds into the parent. Deterministic: merge decisions within
    * a level are independent per parent, so iteration order is
    * immaterial — the loop is bit-identical to the SQL oracle's
    * unrolled level-by-level form.
    *
    * Plan shape: the input is already SUMMARY-sized, not data-sized
    * (≤ 2^L ≤ 1M rows at the L ≤ 20 cap — the data-sized reduction is
    * the caller's map-side-combined leaf aggregate), so the compression
    * runs in ONE narrow task after a `coalesce(1)` — the same
    * single-reducer assembly Spark's own sketch aggregates use. A
    * 16-round join formulation was measured at 79 s on the bench
    * fixture (per-level shuffle + compounding lineage); this is 0.3 s. */
  /** The level-synchronous compression loop over one digest's node
    * multiset, as plain Scala — shared by the global (one narrow task)
    * and grouped (one task per group) paths; bit-identical to the SQL
    * oracle's unrolled form. Throws on out-of-universe nodes: build
    * filters its leaves, but compact accepts arbitrary node frames
    * (streaming state, unions) and a bad node would silently poison
    * every rank. */
  private def compressNodes(
      it: Iterator[(Long, Long, Long)], logUniverse: Int,
      k: Int): Iterator[(Long, Long, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    it.foreach { case (l, i, c) =>
      if (l < 0L || l > logUniverse || i < 0L ||
          i >= (1L << (logUniverse - l))) {
        throw new IllegalArgumentException(
          s"q-digest node (lvl=$l, idx=$i) outside universe 2^$logUniverse")
      }
      // counts get the same loud treatment as coordinates: a negative
      // count is corrupt state (it would silently skew every rank bound),
      // and a zero count carries no information — the SQL oracle's
      // parent-emission filter (pcnt + csum > 0) drops empties, so the
      // Spark side must too or the two digests hash-diverge on
      // degenerate state handed to compact
      if (c < 0L) {
        throw new IllegalArgumentException(
          s"q-digest node (lvl=$l, idx=$i) has negative count $c")
      }
      if (c > 0L) {
        val key = (l, i); m(key) = m.getOrElse(key, 0L) + c
      }
    }
    // thr from the in-task total — the whole histogram is local, so no
    // separate driver-side count job is needed
    val n = m.valuesIterator.sum
    val thr = math.max(n / k, 1L)
    var l = 0L
    while (l < logUniverse) {
      val kids = m.keysIterator.filter(_._1 == l).toArray
      kids.groupBy(_._2 / 2).foreach { case (p, ks) =>
        val csum = ks.iterator.map(m).sum
        val pKey = (l + 1L, p)
        val pcnt = m.getOrElse(pKey, 0L)
        if (csum + pcnt < thr) {
          ks.foreach(m.remove)
          m(pKey) = pcnt + csum
        }
      }
      l += 1L
    }
    m.iterator.map { case ((lv, ix), c) => (lv, ix, c) }
  }

  private def qdigestCompress(
      nodes: DataFrame, logUniverse: Int, k: Int): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    nodes.select(
        col("lvl").cast("long").as("lvl"),
        col("idx").cast("long").as("idx"),
        col("cnt").cast("long").as("cnt"))
      .as[(Long, Long, Long)]
      .coalesce(1)
      .mapPartitions(it => compressNodes(it, logUniverse, k))
      .toDF("lvl", "idx", "cnt")
  }

  /** Build a q-digest over long column `c`. Values must lie in
    * [0, 2^logUniverse) — quantize/clamp upstream; rows outside the
    * universe are EXCLUDED from the sketch (documented contract, same
    * as a histogram's domain — callers who need them clamp first).
    * Returns the node frame (lvl, idx, cnt). The input is scanned
    * exactly ONCE (thr derives inside the compression task). */
  def qdigestBuild(
      df: DataFrame, c: Column, logUniverse: Int, k: Int): DataFrame =
    qdigestBuildWeighted(df, c, lit(1L), logUniverse, k)

  /** Weighted build: each row contributes `w` units of mass instead of
    * 1 — rank queries become WEIGHTED ranks (Σ weight of values < x),
    * the form behind quantity-weighted price percentiles, duration-
    * weighted latency percentiles, token-weighted length quantiles.
    * Non-positive weights are EXCLUDED like out-of-universe values
    * (same documented-domain contract). Identical compression — the
    * leaf histogram just sums weights instead of counting.
    *
    * L ≤ 20 keeps the leaf frame ≤ 2^20 rows — summary-sized for the
    * single-task compression. A finer grid buys nothing: the digest's
    * own n·L/k rank error dominates grid resolution long before 2^20
    * cells; quantize wider domains upstream (value → cell id). */
  def qdigestBuildWeighted(
      df: DataFrame, c: Column, w: Column,
      logUniverse: Int, k: Int): DataFrame = {
    require(logUniverse >= 1 && logUniverse <= 20, "logUniverse in [1,20]")
    require(k >= 1, "compression k >= 1")
    val hi = 1L << logUniverse
    val leaves = df.select(c.cast("long").as("v"), w.cast("long").as("w"))
      .filter(col("v") >= 0L && col("v") < hi && col("w") > 0L)
      .groupBy(col("v").as("idx"))
      .agg(sum("w").as("cnt"))
      .select(lit(0L).as("lvl"), col("idx"), col("cnt"))
    qdigestCompress(leaves, logUniverse, k)
  }

  /** One q-digest PER GROUP — the quantile rollup-table shape next to
    * [[hllRegistersBy]]: per-day/per-source digests that
    * [[qdigestMerge]] rolls up to any range without rescanning. Same
    * contract as [[qdigestBuild]] (string group column `byCol`, values
    * in [0, 2^logUniverse), per-group thr = max(n_g/k, 1)). The leaf
    * histogram is ONE map-side-combined (group, bucket) aggregate;
    * compression then runs per group in its own task
    * (`groupByKey.flatMapGroups`) — parallel across groups, each over a
    * ≤ 2^L summary. Output: (grp, lvl, idx, cnt). */
  def qdigestBuildBy(
      df: DataFrame, byCol: String, c: Column,
      logUniverse: Int, k: Int): DataFrame = {
    require(logUniverse >= 1 && logUniverse <= 20, "logUniverse in [1,20]")
    require(k >= 1, "compression k >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val hi = 1L << logUniverse
    df.select(col(byCol).cast("string").as("grp"), c.cast("long").as("v"))
      .filter(col("v") >= 0L && col("v") < hi)
      .groupBy(col("grp"), col("v").as("idx"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("grp"), lit(0L).as("lvl"), col("idx"), col("cnt"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, rows) =>
        compressNodes(rows.map(r => (r._2, r._3, r._4)), logUniverse, k)
          .map { case (l, i, cnt) => (g, l, i, cnt) }
      }
      .toDF("grp", "lvl", "idx", "cnt")
  }

  /** Recompress an arbitrary (lvl, idx, cnt) node multiset into a valid
    * q-digest at the multiset's own total-count threshold — duplicate
    * (lvl, idx) rows sum inside the compression task. This is the read
    * path for INCREMENTAL maintenance: keep the leaf histogram as
    * streaming/aggregate state (bounded by 2^L rows, sums merge
    * trivially) and compact into a digest on demand; [[qdigestMerge]]
    * is compact ∘ union. Nodes outside the universe fail LOUDLY (the
    * build path filters its own leaves; state handed to compact must
    * already be valid). */
  def qdigestCompact(
      nodes: DataFrame, logUniverse: Int, k: Int): DataFrame = {
    require(logUniverse >= 1 && logUniverse <= 20, "logUniverse in [1,20]")
    require(k >= 1, "compression k >= 1")
    qdigestCompress(nodes, logUniverse, k)
  }

  /** Union two q-digests over the same universe: nodewise count sums,
    * then one recompression at the combined threshold. The result is a
    * valid q-digest of the concatenated inputs (PODS'12 Thm 1) —
    * deterministic, so the merge law is hash-gateable too. */
  def qdigestMerge(
      a: DataFrame, b: DataFrame, logUniverse: Int, k: Int): DataFrame =
    qdigestCompact(a.unionByName(b), logUniverse, k)

  /** Rank bounds from a q-digest for each probe value `x` (column `x`
    * in `probes`): `rank_lo` counts nodes entirely below x, `rank_hi`
    * adds the straddling nodes — the true rank(x) (# values < x) lies
    * in [rank_lo, rank_hi], with rank_hi − rank_lo ≤ log2(U)·thr (the
    * q-digest error bound; spec-pinned). Exact integers — the gate
    * never divides. The sketch is O(k·L) rows, so it broadcasts and the
    * probe side never shuffles. */
  def qdigestRanks(sketch: DataFrame, probes: DataFrame): DataFrame = {
    // a GROUPED digest (qdigestBuildBy's (grp, lvl, idx, cnt) frame)
    // would cross-join fine and the groupBy("x") below would sum counts
    // ACROSS groups — per-group rank probes silently answering
    // merged-corpus numbers. Fail loudly instead (the hllMergeBy
    // discipline): this rank query is defined for ONE digest's
    // (lvl, idx, cnt) nodes; filter a grouped frame to one group and
    // drop the key column first.
    val extra = sketch.columns.toSet -- Set("lvl", "idx", "cnt")
    require(extra.isEmpty,
      s"qdigestRanks takes one digest's (lvl, idx, cnt) nodes; extra " +
        s"column(s) ${extra.mkString(", ")} suggest a GROUPED digest — " +
        "use qdigestRanksBy for per-group probes, or filter to a single " +
        "group and drop its key column first")
    val lo = expr("idx * shiftleft(CAST(1 AS BIGINT), CAST(lvl AS INT))")
    val hiX = expr("(idx + 1) * shiftleft(CAST(1 AS BIGINT), CAST(lvl AS INT))")
    // one row per DISTINCT probe: a duplicated x would otherwise sum
    // each sketch node once per duplicate (bounds 2x the truth) AND
    // emit duplicate output rows through the join below
    val p = probes.select(col("x").cast("long").as("x")).distinct()
    val agg = p
      .crossJoin(broadcast(sketch))
      .groupBy("x")
      .agg(
        sum(when(hiX <= col("x"), col("cnt")).otherwise(0L)).as("rank_lo"),
        sum(when(lo < col("x"), col("cnt")).otherwise(0L)).as("rank_hi"))
    // an EMPTY sketch must answer rank 0 for every probe, not drop the
    // probe rows (the cross join would erase them)
    p.join(agg, Seq("x"), "left")
      .na.fill(0L, Seq("rank_lo", "rank_hi"))
  }

  // ---- KMV (k minimum values) — set-operation sketches -----------------

  /** KMV distinct-count sketch (Bar-Yossef et al. 2002; unbiased
    * estimator Beyer et al., SIGMOD 2007): the k SMALLEST distinct
    * 60-bit hashes of the value column, as a `(rank, h)` frame —
    * 1-based rank in hash order. What HLL cannot do and KMV can: SET
    * OPERATIONS. Union is exact-by-law ([[kmvMerge]]: k smallest of a
    * union == k smallest of the concatenation — gate-checkable as
    * literal frame equality), and intersection has an unbiased
    * estimator ([[kmvIntersect]]) — the audience-overlap /
    * segment-intersection query a distinct-counting rollup cannot
    * answer. Same md5-60-bit hash discipline as [[hllRegisters]]
    * (bit-reproducible in DuckDB), so every gate hashes exactly.
    *
    * 100 TB shape: one map-side-combined DISTINCT of hashes, then a
    * distributed top-K (`orderBy(h).limit(k)` plans
    * `TakeOrderedAndProject`: per-partition k-heads + one bounded
    * reduce — never a global sort). The final rank window is keyless
    * but runs over ≤ k rows (post-limit), bounded by construction.
    * The sketch is k rows — one per day/segment, merge for any range. */
  def kmvSketch(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2, s"kmv k must be >= 2: $k")
    val h = conv(substring(md5(value.cast("string")), 1, 15), 16, 10)
      .cast("long")
    // NULLs are not set members (the DISTINCT-count convention
    // hllRegisters assumes implicitly): a NULL value hashes to a NULL
    // h, which an ascending sort places FIRST — it would occupy rank 1
    // and inflate the sub-k exact count by one (r14 advice)
    df.select(h.as("h")).filter(col("h").isNotNull).distinct()
      .orderBy("h").limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy("h")).cast("long"))
      .select("rank", "h")
  }

  /** Grouped KMV: one k-row sketch per key of `by` — the per-day /
    * per-segment sketch TABLE (the [[hllRegistersBy]] rollup shape,
    * with set operations). One keyed distinct, then a rank-filtered
    * keyed window — Spark plans `WindowGroupLimit`, so each partition
    * keeps only k candidates per group BEFORE the exchange; state is
    * ≤ |groups|·k rows. */
  def kmvSketchBy(
      df: DataFrame, by: Seq[String], value: Column, k: Int): DataFrame = {
    require(k >= 2, s"kmv k must be >= 2: $k")
    require(by.nonEmpty, "kmvSketchBy needs group columns; use kmvSketch")
    val h = conv(substring(md5(value.cast("string")), 1, 15), 16, 10)
      .cast("long")
    // same NULL-exclusion as kmvSketch: a group's NULL values are not
    // distinct members and must not claim its rank-1 slot
    df.select(by.map(col) :+ h.as("h"): _*)
      .filter(col("h").isNotNull).distinct()
      .withColumn("rank", row_number()
        .over(Window.partitionBy(by.map(col): _*).orderBy("h")).cast("long"))
      .filter(col("rank") <= k)
      .select(by.map(col) ++ Seq(col("rank"), col("h")): _*)
  }

  /** Per-group union of two grouped KMV sketch tables — the same merge
    * law as [[kmvMerge]], per key: a group's merged sketch is EXACTLY
    * the from-scratch sketch of its combined values. Groups absent
    * from one side pass through (a day with no rows merges as
    * identity). */
  def kmvMergeBy(
      a: DataFrame, b: DataFrame, by: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"kmv k must be >= 2: $k")
    require(by.nonEmpty, "kmvMergeBy needs group columns; use kmvMerge")
    val cols = by.map(col) :+ col("h")
    a.select(cols: _*).unionByName(b.select(cols: _*)).distinct()
      .withColumn("rank", row_number()
        .over(Window.partitionBy(by.map(col): _*).orderBy("h")).cast("long"))
      .filter(col("rank") <= k)
      .select(by.map(col) ++ Seq(col("rank"), col("h")): _*)
  }

  /** Union of two KMV sketches over the same hash domain: the k
    * smallest of the combined hash sets — EXACTLY the sketch of the
    * concatenated inputs (the KMV merge law; the union gate checks
    * frame equality against a from-scratch build, not an estimate). */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"kmv k must be >= 2: $k")
    a.select("h").unionByName(b.select("h")).distinct()
      .orderBy("h").limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy("h")).cast("long"))
      .select("rank", "h")
  }

  /** Distinct-count estimate off a KMV sketch — exact integers only:
    * `(n, theta, est_fp)` where `n` is the sketch's row count, `theta`
    * its largest (k-th smallest) hash, and
    * `est_fp = (n−1)·2^60 div theta` (the classic k−1/θ estimator,
    * decimal(38,0) so the product never overflows). A sketch with
    * FEWER than k rows saw every distinct value — `est_fp` is then the
    * exact count (the estimator is skipped, not misapplied). Callers
    * pass the k the sketch was built with. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"kmv k must be >= 2: $k")
    // (n−1)·2^60 needs 38-digit headroom; `div` floors and returns LONG
    // (the decimal↔HUGEINT gate discipline — never a rounding cast)
    sketch.agg(count(lit(1)).as("n"), max("h").as("theta"))
      .select(col("n"), col("theta"),
        when(col("n") < k, col("n"))
          .otherwise(expr(
            "CAST(CAST(n - 1 AS DECIMAL(38,0)) * " +
              "CAST('1152921504606846976' AS DECIMAL(38,0)) div theta AS BIGINT)"))
          .as("est_fp"))
  }

  /** Intersection estimate from two KMV sketches (Beyer et al. 2007):
    * with `theta = min(theta_a, theta_b)`, every hash below theta is a
    * uniform sample of BOTH sets' hash space, so the intersection
    * estimate is `|common hashes < theta| · 2^60 div theta`. Returns
    * one exact-integer row `(n_common, theta, est_fp)`. Joins two
    * k-row frames — driver-free, broadcast-sized by construction. */
  def kmvIntersect(a: DataFrame, b: DataFrame): DataFrame = {
    val theta = a.agg(max("h").as("ta"))
      .crossJoin(b.agg(max("h").as("tb")))
      .select(least(col("ta"), col("tb")).as("theta"))
    val common = a.select("h").join(b.select("h"), "h")
    // a GLOBAL count aggregates to one 0-row even on an empty
    // intersection, so the zero case needs no special handling
    val counted = common.crossJoin(broadcast(theta))
      .filter(col("h") < col("theta"))
      .agg(count(lit(1)).as("n_common"))
    theta.crossJoin(counted)
      .select(col("n_common"), col("theta"),
        expr("CAST(CAST(n_common AS DECIMAL(38,0)) * " +
          "CAST('1152921504606846976' AS DECIMAL(38,0)) div theta AS BIGINT)")
          .as("est_fp"))
  }

  /** PER-GROUP rank bounds — the grouped twin of [[qdigestRanks]] and
    * the query a quantile rollup table actually serves (per-source /
    * per-day latency percentiles): `sketch` is [[qdigestBuildBy]]'s
    * `(grp, lvl, idx, cnt)` frame, `probes` carries `(grp, x)`, and
    * each probe answers against ITS group's digest only — the
    * cross-group count bleed [[qdigestRanks]]' guard exists to prevent
    * cannot happen here because the digest join is an equi-join on the
    * group key. Same bound: true per-group rank(x) ∈ [rank_lo,
    * rank_hi]. A probe whose group has no digest answers rank 0 (the
    * empty-digest convention). The grouped sketch is |groups|·O(k·L)
    * rows — summary-sized state, broadcast; the probe side never
    * shuffles for it. */
  def qdigestRanksBy(sketch: DataFrame, probes: DataFrame): DataFrame = {
    val cols = sketch.columns.toSet
    require(cols == Set("grp", "lvl", "idx", "cnt"),
      s"qdigestRanksBy takes a grouped (grp, lvl, idx, cnt) digest " +
        s"frame (qdigestBuildBy's shape), got ${sketch.columns.mkString(", ")}")
    val lo = expr("idx * shiftleft(CAST(1 AS BIGINT), CAST(lvl AS INT))")
    val hiX = expr("(idx + 1) * shiftleft(CAST(1 AS BIGINT), CAST(lvl AS INT))")
    val p = probes.select(col("grp"), col("x").cast("long").as("x")).distinct()
    val agg = p
      .join(broadcast(sketch), Seq("grp"))
      .groupBy("grp", "x")
      .agg(
        sum(when(hiX <= col("x"), col("cnt")).otherwise(0L)).as("rank_lo"),
        sum(when(lo < col("x"), col("cnt")).otherwise(0L)).as("rank_hi"))
    p.join(agg, Seq("grp", "x"), "left")
      .na.fill(0L, Seq("rank_lo", "rank_hi"))
  }
}
