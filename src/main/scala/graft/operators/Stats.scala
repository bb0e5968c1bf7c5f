package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics for corpus analysis — the numbers a pipeline
  * reads before setting its filter thresholds (length cutoffs, quality
  * bands, packing budgets). */
object Stats {

  /** Exact per-group quantiles by SORT RANK (lower discrete quantile:
    * the element at `floor(p·(n−1)) + 1` in ascending order), one output
    * row per (group, p). Rank selection instead of interpolation makes
    * the result an actual data element and the arithmetic engine-exact:
    * `p·(n−1)` is one IEEE multiply both engines evaluate identically,
    * and everything else is integer — no quantile-algorithm variation
    * (R-7 vs t-digest vs GK) can leak into the values.
    *
    * Cost shape: one shuffle on the group key for the ranking window
    * (sort runs bounded by group size, the stratifiedSample shape); the
    * per-group counts reduce to |groups| rows and the (group, p, rank)
    * target table BROADCASTS back onto the ranked rows — no second
    * big-side shuffle and no |ps|× row multiplication. Ties need no
    * tiebreaker: any permutation of equal values yields the same element
    * at a given rank. For quantiles over ONE corpus-spanning group, use
    * `approx_percentile` instead and give up the exactness. */
  def groupedQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "ps must be in [0, 1]")
    val vals = df.select(col(groupCol), col(valueCol))
    val ranked = vals.withColumn("rn",
      row_number().over(Window.partitionBy(groupCol).orderBy(col(valueCol).asc)).cast("long"))
    val targets = vals.groupBy(groupCol).agg(count(lit(1)).as("n_rows"))
      .select(col(groupCol), col("n_rows"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("rn", floor(col("p") * (col("n_rows") - 1)) + 1)
    ranked.join(broadcast(targets), Seq(groupCol, "rn"))
      .select(col(groupCol), col("p"), col("n_rows"), col(valueCol).as("value"))
  }

  /** Robust per-group outlier detection by MEDIAN ABSOLUTE DEVIATION in
    * exact arithmetic — the filter a pipeline runs to drop pathological
    * documents (truncated crawls, concatenation blowups) without letting
    * the outliers themselves move the threshold, which is exactly what a
    * mean/stddev rule does. Medians are the LOWER discrete median (the
    * element at rank `(n+1) div 2`, an actual data value — no
    * interpolation, no engine-variant quantile algorithm), deviations
    * are integer, and the flag `dev > kNum·mad div kDen` is exact —
    * bit-identical across engines.
    *
    * Cost shape: two ranking windows partitioned by group (sort runs
    * bounded by group size, never corpus-wide) and two tiny per-group
    * (med, mad) frames broadcast back — the corpus shuffles twice on
    * the group key, nothing else moves. */
  def madOutliers(
      df: DataFrame, groupCol: String, idCol: String, valueCol: String,
      kNum: Long = 3L, kDen: Long = 1L): DataFrame = {
    require(kNum > 0 && kDen > 0, "need a positive outlier factor")
    val v = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(valueCol).cast("long").as("v"))
    val byGrp = Window.partitionBy("grp")
    def lowerMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val ranked = in
        .withColumn("rn", row_number().over(byGrp.orderBy(col(c))).cast("long"))
        .withColumn("n", count(lit(1)).over(byGrp))
      ranked.filter(col("rn") === expr("(n + 1L) div 2L"))
        .select(col("grp"), col(c).as(out))
    }
    val med = lowerMedian(v, "v", "med")
    val dev = v.join(broadcast(med), Seq("grp"))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = lowerMedian(dev.select("grp", "dev"), "dev", "mad")
    dev.join(broadcast(mad), Seq("grp"))
      .filter(col("dev") * kDen > col("mad") * kNum)
      .select(col("grp").as(groupCol), col("id").as(idCol),
        col("v").as(valueCol), col("med"), col("mad"))
  }

  /** Two-sample Kolmogorov–Smirnov drift of each group against the REST
    * of the corpus, in EXACT integer arithmetic — the detector a pipeline
    * runs when a new crawl lands ("did src18's length distribution move
    * away from everything else?") before re-fitting filter thresholds.
    *
    * The KS statistic `max_x |F_g(x) − F_rest(x)|` is a ratio of
    * integers: with group size `n_g`, rest size `n_r`, and cumulative
    * counts `c_g(x)`, `c_r(x)`, the supremum over the data points equals
    * `max_x |c_g(x)·n_r − c_r(x)·n_g| / (n_g·n_r)` — and the maximum of
    * an ECDF difference is always attained at a data point, so scanning
    * the corpus's distinct values is exhaustive, not approximate. The
    * result is reported as the exact pair (`ks_num`, `ks_den`) plus a
    * fixed-point `ks_fp = ks_num·10^6 div ks_den` — every operation
    * integer, bit-identical across engines.
    *
    * 100 TB shape: ONE data-sized shuffle — the (group, value) count
    * aggregation with map-side partial combine. Everything after runs on
    * the reduced frame of |groups|·|distinct values| rows: the per-group
    * cumulative windows partition by group, and the single global window
    * over value totals orders |distinct values| rows (value columns fed
    * here are discrete — lengths, scores, bucketed floats — so that
    * frame is thousands of rows, not data-sized; bin continuous values
    * first). Counts stay in BIGINT: the cross products are bounded by
    * `n_g·n_r`, so below ~3·10^9 rows per side this is exact; beyond
    * that, swap the two products to DECIMAL(38,0).
    */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol).as("grp"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt")) // the one big-data pass
    val groups = counts.groupBy("grp").agg(sum("cnt").as("n_grp"))
    val valTotals = counts.groupBy("v").agg(sum("cnt").as("v_cnt"))
    // grid: every group × every corpus-distinct value, so each group's
    // ECDF is evaluated at ALL candidate maxima, not just its own values
    val grid = groups.select("grp", "n_grp").crossJoin(valTotals.select("v"))
    val cumGrp = grid.join(counts, Seq("grp", "v"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("cum_grp",
        sum("cnt").over(Window.partitionBy("grp").orderBy("v")))
    // corpus ECDF: distributed prefix (r12) — a continuous value domain
    // no longer funnels |distinct v| rows into one task
    val cumAll = rangePrefixSum(valTotals, "v", col("v_cnt"), "cum_all")
    val total = counts.agg(sum("cnt").as("n_all"))
    cumGrp.join(cumAll.select("v", "cum_all"), Seq("v"))
      .crossJoin(broadcast(total))
      .withColumn("n_rest", col("n_all") - col("n_grp"))
      .withColumn("dev", abs(
        col("cum_grp") * col("n_rest") -
          (col("cum_all") - col("cum_grp")) * col("n_grp")))
      .groupBy(col("grp").as(groupCol))
      .agg(
        first("n_grp").as("n_group"),
        first("n_rest").as("n_rest"),
        max("dev").as("ks_num"),
        first(col("n_grp") * col("n_rest")).as("ks_den"))
      .withColumn("ks_fp", expr("ks_num * 1000000L div ks_den"))
  }

  /** Two-sample chi-square homogeneity over a CATEGORICAL column — the
    * categorical twin of [[ksDrift]] (which scans ordered value ECDFs):
    * did a new snapshot's category mix (source labels, languages, event
    * types) move away from a reference snapshot's? Pearson's statistic
    * Σ_i (O_ia·n_b − O_ib·n_a)² / (n_a·n_b·(O_ia+O_ib)) in EXACT
    * integer arithmetic: per category the exact term as a
    * decimal(38,0) rational (`chi2_num`, `chi2_den`) plus `term_ppm` —
    * the term in parts-per-million by two-part floor division
    * (`num div den·10⁶ + (num mod den)·10⁶ div den`, exact with no
    * intermediate overflow), so Σ term_ppm is the engine-identical
    * fixed-point χ². Categories absent from one side count 0 there
    * (full-outer union of categories). Exact while each side stays
    * below ~3·10⁹ rows — the squared cross-product reaches n⁴ —
    * which at 100 TB means feeding PRE-AGGREGATED category counts or
    * a deterministic sample, both standard for a drift check.
    *
    * Shape: two map-side-combined category counts, a full-outer join
    * on the |categories| frame, a one-row totals broadcast. Both
    * inputs must be non-empty (a zero side total zeroes `chi2_den`).
    */
  def chiSquareDrift(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val d = "decimal(38,0)"
    val ca = a.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).cast(d).as("o_a"))
    val cb = b.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).cast(d).as("o_b"))
    val cells = ca.join(cb, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("o_a"), lit(0).cast(d)).as("o_a"),
        coalesce(col("o_b"), lit(0).cast(d)).as("o_b"))
    val totals = cells.agg(sum("o_a").as("n_a"), sum("o_b").as("n_b"))
    cells.crossJoin(broadcast(totals))
      .withColumn("diff", col("o_a") * col("n_b") - col("o_b") * col("n_a"))
      .select(col("category"),
        col("o_a").cast("long").as("o_a"),
        col("o_b").cast("long").as("o_b"),
        (col("diff") * col("diff")).cast(d).as("chi2_num"),
        (col("n_a") * col("n_b") * (col("o_a") + col("o_b"))).cast(d).as("chi2_den"))
      .withColumn("term_ppm",
        (expr("chi2_num div chi2_den").cast("long") * 1000000L +
          expr("(chi2_num % chi2_den) * 1000000 div chi2_den").cast("long")))
  }

  /** Generic table profile — per-column (rows, nulls, distinct, min,
    * max) in ONE scan, the data-card / ingest-sanity report a pipeline
    * runs on every new drop before anything else touches it.
    *
    * Shape: a single aggregate computes every metric for every column;
    * the multi-`count(distinct)` plans via Spark's Expand (one duplicated
    * row-stream per distinct column — the textbook cost any engine pays
    * for k exact distincts in one pass; swap in `approx_count_distinct`
    * when ±2% is acceptable and the Expand disappears). The wide 1-row
    * result is then unpivoted driver-side into one row per column —
    * |cols| rows, nothing data-sized. Min/max are rendered as strings so
    * heterogeneous column types share one schema; integer and string
    * columns render identically in any engine (the gate profiles only
    * those — float formatting is engine-specific). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // One single-distinct aggregate PER COLUMN, unioned — not one agg
    // with k count_distincts: k distincts in one aggregate make Catalyst
    // Expand-replicate every input row (k+1)× through the full width of
    // the projection (6.3 s on the bench profile vs 0.7 s this way),
    // while each branch here is a column-pruned scan + two-phase
    // partial-distinct aggregate. The branches are independent stages of
    // one job, so they also parallelize across the cluster instead of
    // funneling through one Expand pipeline. Output stays one row per
    // profiled column, nothing collected.
    cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          count_distinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionAll _)
  }

  /** Exact-moment Pearson correlation matrix over k numeric columns in
    * ONE scan — the feature-redundancy screen before training (drop one
    * of a ±0.95-correlated pair). `corr()`/`covar_samp()` built-ins
    * accumulate FLOAT moments whose partial-merge order varies run to
    * run; here every moment (Σx, Σx², Σxy, n) is an EXACT INTEGER sum
    * over centi-unit values (`round(x·100)` — corr is scale-invariant),
    * order-independent and bit-identical across engines. The closed-form
    * numerators `cov = nΣxy − ΣxΣy`, `var = nΣx² − (Σx)²` stay exact
    * integers too; each pair's (cov, vx, vy) triple is then
    * truncating-divided by the SAME power of ten — the smallest that
    * brings the largest of the three under 16 decimal digits, i.e.
    * inside double's 2^53 exact-integer range — BEFORE any int→double
    * conversion (a decimal/int128 → double cast is off by an ulp
    * between engines beyond 2^53 — measured; int64→double is exact on
    * both). corr is invariant under common rescaling of (cov, vx, vy),
    * so the final `r = cov/(√vx·√vy)` is a fixed IEEE op sequence on
    * identical inputs with ~10⁻¹² absolute precision, deterministically
    * the same on both sides (the oracle replays shift = `greatest(0,
    * length(varchar(greatest(|cov|, vx, vy))) − 15)` and the divisor as
    * `'1' || repeat('0', shift)` — string-built, since 10²³ is not an
    * exact double).
    *
    * Shape: one aggregate with k + k(k+1)/2 decimal sums — map-side
    * partial aggregation collapses the corpus before the single-row
    * exchange, and the k² pair expansion runs on the 1-row result. At
    * 100 TB nothing but one row of moments moves. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val spark = df.sparkSession
    import spark.implicits._
    // centi-units: exact integers for 2-decimal source data; decimal(38,0)
    // is Spark's int128 stand-in, so products and sums never round
    def u(c: String) = round(col(c) * 100).cast("decimal(38,0)")
    val pairs = for { i <- cols.indices; j <- i until cols.size } yield (i, j)
    val aggs =
      cols.map(c => sum(u(c)).as(s"s__$c")) ++
      pairs.map { case (i, j) => sum(u(cols(i)) * u(cols(j))).as(s"p__${i}_$j") }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).collect().head
    val n = BigInt(row.getAs[Long]("__n"))
    def s(c: String) = BigInt(row.getAs[java.math.BigDecimal](s"s__$c").toBigInteger)
    def p(i: Int, j: Int) =
      BigInt(row.getAs[java.math.BigDecimal](s"p__${math.min(i, j)}_${math.max(i, j)}").toBigInteger)
    (for { i <- cols.indices; j <- (i + 1) until cols.size } yield {
      val cov = n * p(i, j) - s(cols(i)) * s(cols(j))
      val vx = n * p(i, i) - s(cols(i)) * s(cols(i))
      val vy = n * p(j, j) - s(cols(j)) * s(cols(j))
      val shift = math.max(0, cov.abs.max(vx).max(vy).toString.length - 15)
      val down = BigInt(10).pow(shift)
      // BigInt `/` truncates toward zero — same as DuckDB's `//`
      val (covD, vxD, vyD) = ((cov / down).toDouble, (vx / down).toDouble, (vy / down).toDouble)
      (cols(i), cols(j), covD / (math.sqrt(vxD) * math.sqrt(vyD)))
    }).toDF("col_a", "col_b", "corr")
  }

  /** Per-group winsorization: clip `valueCol` into the [pLo, pHi]
    * rank-quantile band of its OWN group — taming heavy tails before
    * mean-based statistics (the robust alternative to dropping rows).
    * Bounds are actual data elements selected by the [[groupedQuantiles]]
    * rank rule (`floor(p·(n−1))+1`), so clipping is pure integer
    * comparison — bit-exact vs the oracle.
    *
    * Shape: the bounds frame collapses to |groups|·2 rows and BROADCASTS
    * back onto the corpus — the corpus itself shuffles once (the ranking
    * window inside groupedQuantiles); the clip is a codegen'd projection. */
  def winsorize(
      df: DataFrame, groupCol: String, idCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo < pHi, "need pLo < pHi")
    val bounds = groupedQuantiles(df, groupCol, valueCol, Seq(pLo, pHi))
      .groupBy(groupCol)
      .agg(min(when(col("p") === pLo, col("value"))).as("lo"),
        max(when(col("p") === pHi, col("value"))).as("hi"))
    df.select(col(groupCol), col(idCol), col(valueCol))
      .join(broadcast(bounds), Seq(groupCol))
      .withColumn("clipped",
        when(col(valueCol) < col("lo"), col("lo"))
          .when(col(valueCol) > col("hi"), col("hi"))
          .otherwise(col(valueCol)))
      .select(col(groupCol), col(idCol), col(valueCol), col("lo"), col("hi"), col("clipped"))
  }

  /** Equi-width histogram over one numeric column: `bins` buckets between
    * the column's min and max (the last bucket closed above, so max lands
    * in bin bins−1), each with its count and observed value range — the
    * one-line distribution profile read before choosing filter cutoffs,
    * complementing [[profile]]'s scalar summary and
    * [[groupedQuantiles]]'s rank picks.
    *
    * The bucket index is `least(bins−1, floor((x−lo)·bins/(hi−lo)))` with
    * the multiply BEFORE the divide — one IEEE evaluation order, stated
    * identically in the oracle, so bucket edges are bit-deterministic.
    *
    * Shape: bounds pass reduces to ONE row and broadcasts back; bucket +
    * count is a codegen'd projection into a ≤|bins|-row partial-agg
    * shuffle. Two column scans, nothing corpus-sized moves. */
  def equiWidthHistogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 1, "need at least one bin")
    val v = col(valueCol)
    val bounds = df.agg(min(v).as("lo"), max(v).as("hi"))
    df.select(v).join(broadcast(bounds))
      .withColumn("bin",
        least(lit(bins - 1L), floor((v - col("lo")) * bins / (col("hi") - col("lo")))))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min(v).as("lo_v"), max(v).as("hi_v"))
  }

  /** Per-key trailing-window rolling sum over event time: for every row,
    * the exact sum (and count) of the key's values in the last
    * `windowMicros` of event time INCLUDING the row — the feature a
    * pipeline derives for "activity in the last 24 h at each event"
    * (continuous sliding semantics, unlike the tumbling `windowedStats`
    * buckets). Values sum as decimals (order-independent; scale 6 keeps
    * the unscaled window sum far inside 2^53, so the final double cast
    * is ONE correctly-rounded conversion in both engines); time ties are
    * RANGE-frame peers, so the result is independent of tie order.
    *
    * Shape: one shuffle on the key; the range-frame window runs inside
    * each key's sorted run (bounded by per-key history, the
    * [[ewmaLastN]] shape) with Spark's sliding-frame aggregation doing
    * O(1) amortized work per row — no self-join, no per-row rescans. */
  def rollingSumByTime(
      df: DataFrame, keyCol: String, idCol: String, tsMicrosCol: String,
      valueCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "need a positive window")
    val w = Window.partitionBy(keyCol).orderBy(col(tsMicrosCol).asc)
      .rangeBetween(-windowMicros, 0L)
    df.select(col(keyCol), col(idCol), col(tsMicrosCol), col(valueCol),
        sum(col(valueCol).cast("decimal(30,6)")).over(w).cast("double").as("rolling_sum"),
        count(lit(1)).over(w).as("n_in_window"))
  }

  /** Time-weighted average ingredients per key — the step-function time
    * integral (the TWAP / average-gauge statistic): observation v_i
    * holds over [t_i, t_{i+1}) (last-observation-carried-forward), the
    * final observation holds to the corpus horizon (global max ts, the
    * [[graft.operators.Behavioral.survivalTable]] horizon discipline).
    * This is the number an event-weighted mean gets WRONG whenever
    * observation density correlates with value (a gauge sampled twice
    * as often while high reads high) — monitoring averages and TWAP
    * exist precisely to undo that bias.
    *
    * Emits exact integers and never divides: per key,
    * `twap_num = Σ vᵢ·Δtᵢ` (decimal(38,0) — value-micros × duration-
    * micros passes int64 at month-long horizons), `twap_den = horizon −
    * t_first`, `n_obs`; TWAP = num/den at render time. Duplicate
    * timestamps are ordered by `tieCol` (zero-duration steps contribute
    * nothing; the tie-last observation carries the run), so the fold is
    * a total order and engines agree exactly.
    *
    * Shape: ONE shuffle on the key (the lead window's sort runs are
    * bounded per key), the one-row horizon broadcast onto it, one keyed
    * aggregate — the [[rollingSumByTime]] cost model. */
  def timeWeightedAvg(
      df: DataFrame, keyCol: String, tsMicrosCol: String, tieCol: String,
      valueMicrosCol: String): DataFrame = {
    val d = "decimal(38,0)"
    val horizon = df.agg(max(col(tsMicrosCol)).as("_horizon"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsMicrosCol).asc, col(tieCol).asc)
    df.select(col(keyCol), col(tsMicrosCol), col(tieCol), col(valueMicrosCol))
      .withColumn("_next", lead(col(tsMicrosCol), 1).over(w))
      .crossJoin(broadcast(horizon))
      .withColumn("_dt",
        coalesce(col("_next"), col("_horizon")) - col(tsMicrosCol))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_obs"),
        (max(col("_horizon")) - min(col(tsMicrosCol))).as("twap_den"),
        sum(col(valueMicrosCol).cast(d) * col("_dt")).cast(d).as("twap_num"))
  }

  /** Exponentially-weighted moving average of each key's last `nMax`
    * values (most recent first, weight 0.5^rank, normalized) — the decay
    * smoothing a feature pipeline applies to per-user activity before
    * thresholding. α = ½ is deliberate: every weight is an exact binary
    * power, so value·weight is ONE IEEE rounding, the decimal cast makes
    * the weighted sum order-independent, and the normalizer 1−2⁻ⁿ is
    * exact — the whole statistic is bit-deterministic across engines.
    *
    * Shape: one shuffle on the key for the ranking window (sort runs
    * bounded by per-key history), then a per-key partial agg — the
    * [[madOutliers]] shape minus the broadcast-back. */
  def ewmaLastN(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, nMax: Int = 8): DataFrame = {
    require(nMax >= 1 && nMax <= 32, "nMax out of range")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nMax)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_used"),
        sum((col(valueCol) * pow(lit(0.5), col("rn"))).cast("decimal(30,12)")).as("num"))
      .select(col(keyCol), col("n_used"),
        (col("num").cast("double") / (lit(1.0) - pow(lit(0.5), col("n_used")))).as("ewma"))
  }

  /** EXACT corpus-wide quantiles of an integral column WITHOUT a global
    * sort — distributed selection by histogram bisection. Per quantile:
    * bucket the candidate value range into ≤ 2^`bitsPerRound` equi-width
    * bins, count each bin (ONE partial-aggregated scan, ≤ 65 536 rows to
    * the driver), walk the cumulative counts to the bin holding the
    * target rank, recurse into that bin's sub-range; when the range fits
    * a single round, group by the value itself and pick the ranked one.
    * A span of 2^64 resolves in ⌈64/16⌉ = 4 rounds, and real domains
    * (timestamps, ids, sizes) in 2-3 — so the exact p99 of 100 TB costs
    * a few aggregation scans with O(2^bits) driver memory, where a
    * global `orderBy` would shuffle the corpus and a single-partition
    * window would break outright. This is the corpus-WIDE counterpart of
    * [[groupedQuantiles]] (whose per-group sort is bounded by group
    * size); `percentile_approx` remains the one-pass answer when ±ε
    * rank error is acceptable.
    *
    * Quantile semantics match `percentile_disc`: the smallest value
    * whose cumulative count reaches ⌈p·n⌉ (p ∈ (0, 1]). Multiple `ps`
    * run the bisection independently (rounds are cheap relative to a
    * scan; cache the input when the scan itself dominates). Returns one
    * row per quantile: `(p_ppm, value, n_rows)` — p as exact integer
    * ppm so the gate hashes. */
  def exactQuantilesBisect(
      df: DataFrame, valueCol: String, ps: Seq[Double],
      bitsPerRound: Int = 16): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0), "ps must be in (0, 1]")
    require(bitsPerRound >= 8 && bitsPerRound <= 20, "bitsPerRound out of range")
    val spark = df.sparkSession
    import spark.implicits._
    // pinned: every bisection round re-scans this frame (the docstring's
    // "cache the input when the scan itself dominates" — r16: at bench
    // scale ~10 rounds re-read the parquet and re-derived the value
    // projection; one materialization bounds that to a single scan)
    val vals = df.select(col(valueCol).cast("long").as("v")).where(col("v").isNotNull)
      .localCheckpoint()
    val bins = 1L << bitsPerRound
    val bounds = vals.agg(min("v"), max("v"), count(lit(1))).head()
    val n = bounds.getLong(2)
    require(n > 0, "exactQuantilesBisect needs at least one non-null row")
    val (vMin, vMax) = (bounds.getLong(0), bounds.getLong(1))

    def widthOf(lo: Long, hi: Long): Long = {
      // ceil(span / bins) without overflow: span may exceed Long.Max/2
      val span = math.subtractExact(hi, lo) // callers keep hi - lo < 2^63
      span / bins + (if (span % bins == 0L) 0L else 1L)
    }

    // per-invocation memo of the collected counts per [lo, hi] range:
    // the ps quantiles bisect independently but SHARE their first
    // round(s) exactly (identical range ⇒ identical bin counts), so the
    // p50/p90/p99 triple pays one first-round scan, not three (r16)
    val rangeMemo =
      scala.collection.mutable.HashMap.empty[(Long, Long), Array[(Long, Long)]]

    // one round: counts per bin over [lo, hi], narrowed bin + rank within
    @annotation.tailrec
    def select(lo: Long, hi: Long, rank: Long): Long = {
      if (lo == hi) lo
      else if (math.subtractExact(hi, lo) < bins) {
        // terminal: exact per-value counts, walk to the rank
        val counts = rangeMemo.getOrElseUpdate((lo, hi),
          vals.where(col("v") >= lo && col("v") <= hi)
            .groupBy("v").agg(count(lit(1)).as("c"))
            .orderBy("v").as[(Long, Long)].collect())
        var remaining = rank
        var i = 0
        while (remaining > counts(i)._2) { remaining -= counts(i)._2; i += 1 }
        counts(i)._1
      } else {
        val w = widthOf(lo, hi)
        // integer `div` (v - lo ≥ 0, w > 0 ⇒ div ≡ floor): a double `/`
        // could misbucket at the extremes of the long range
        val binned = rangeMemo.getOrElseUpdate((lo, hi),
          vals.where(col("v") >= lo && col("v") <= hi)
            .groupBy(expr(s"(v - ${lo}L) div ${w}L").as("bin"))
            .agg(count(lit(1)).as("c"))
            .orderBy("bin").as[(Long, Long)].collect())
        var remaining = rank
        var i = 0
        while (remaining > binned(i)._2) { remaining -= binned(i)._2; i += 1 }
        val b = binned(i)._1
        val newLo = lo + b * w
        val newHi = math.min(hi, newLo + w - 1)
        select(newLo, newHi, remaining)
      }
    }

    val rows = ps.map { p =>
      val rank = math.ceil(p * n).toLong
      (math.round(p * 1000000L), select(vMin, vMax, rank), n)
    }
    rows.toDF("p_ppm", "value", "n_rows")
  }

  /** Key-skew diagnostic: the per-key row-count distribution collapsed
    * to power-of-two buckets — the report that tells you BEFORE a join
    * whether a key needs salting ([[SkewJoin]]) or hot-key routing
    * ([[graft.operators.FuzzyJoin]]'s hybrid), and after one whether
    * the straggler was data or scheduling. Per bucket (⌊log₂ count⌋):
    * how many keys, how many rows they carry, and the largest key's
    * count. Two aggregations, both partial-aggregable: the first
    * shuffles (key, count) — the same exchange any join on the key
    * would pay — the second reduces |keys| rows to ≤64 buckets.
    * `width_bucket`-free: the bucket is integer bit-length, exact in
    * any engine as `floor(log2)` via repeated comparison-free shifts. */
  def keySkewReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val perKey = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n_rows"))
    // floor(log2(n)) for n ≥ 1 ≡ 63 - numberOfLeadingZeros ≡ bit_length - 1;
    // expressed portably as length of the binary string minus 1
    val bucket = (length(conv(col("n_rows").cast("string"), 10, 2)) - 1).cast("long")
    perKey.groupBy(bucket.as("log2_bucket"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("n_rows")).as("total_rows"),
        max(col("n_rows")).as("max_key_rows"))
  }

  /** Per-group z-score standardization with EXACT moments: mean and
    * variance come from decimal sum / sum-of-squares (no float
    * accumulation order to diverge between engines or between partial
    * and final aggregation), converted to double only at the final
    * `(x − mean) / sqrt(var)` — one fixed-shape IEEE expression both
    * engines evaluate identically. Population variance
    * (Σx² − (Σx)²/n) / n, guarded to 0 by `greatest` against negative
    * rounding residue. Values are taken at `scale` decimal digits
    * (inputs are expected at fixed precision — prices, ratios).
    *
    * Shape: one groupBy shuffle reducing to |groups| moment rows, which
    * BROADCAST back onto the data — the fact side shuffles zero times
    * beyond its scan, the standardization itself is a projection. */
  def standardize(
      df: DataFrame, groupCol: String, valueCol: String,
      scale: Int = 2): DataFrame = {
    // decimal(18): the product decimal(37) stays inside BOTH Spark's and
    // DuckDB's 38-digit ceiling (38×38 products overflow DuckDB outright)
    val v = col(valueCol).cast(s"decimal(18,$scale)")
    val moments = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"),
        sum(v).as("_s1"),
        sum(v * v).as("_s2"))
      .select(col(groupCol),
        (col("_s1").cast("double") / col("_n")).as("_mean"),
        greatest(
          (col("_s2").cast("double") -
            col("_s1").cast("double") * col("_s1").cast("double") / col("_n")) / col("_n"),
          lit(0.0)).as("_var"))
    df.join(broadcast(moments), Seq(groupCol))
      .withColumn("z",
        when(col("_var") > 0.0,
          (col(valueCol).cast("double") - col("_mean")) / sqrt(col("_var")))
          .otherwise(lit(0.0)))
      .drop("_mean", "_var")
  }

  /** Period-over-period growth in exact parts-per-million: per group,
    * each period's value next to the previous period's, with
    * `growth_ppm = (cur − prev) · 10⁶ div |prev|` in pure integer
    * arithmetic over micro-unit values (the week-over-week /
    * month-over-month revenue report, exact enough to hash-compare
    * across engines). One window pass over the ALREADY-AGGREGATED
    * per-(group, period) frame — |groups|·|periods| rows, never the
    * fact table; callers aggregate first, which is where the single
    * data-sized shuffle lives. */
  /** Streaming-shaped anomaly flags, batch-exact: each event is judged
    * against the running mean/variance of that key's PRIOR events (a
    * per-key Welford monitor replayed over history). The z² test runs
    * in EXACT integer arithmetic — with prior sums s1=Σv, s2=Σv² over
    * n micro-unit values, `(v−mean)² > z²·var` multiplied through by n²
    * becomes `(n·v − s1)² > z²·(n·s2 − s1²)` — so both engines flag
    * identical rows with zero float drift; values up to ~10⁹ micros and
    * thousands-per-key histories stay inside 38-digit decimals.
    *
    * Shape: ONE shuffle on the key; two running-frame window sums
    * (incremental O(history) per key, never the quadratic following
    * frame); flags are a projection. The streaming twin is a trivial
    * `mapGroupsWithState` carrying (n, s1, s2) per key — this batch
    * form IS its replay, which is what the oracle gates. */
  def runningAnomalies(
      df: DataFrame, keyCol: String, ordCols: Seq[String],
      valueMicrosCol: String, z: Int = 3, minPrior: Int = 5): DataFrame = {
    require(z > 0 && minPrior >= 2, s"bad z/minPrior: $z/$minPrior")
    val w = Window.partitionBy(keyCol).orderBy(ordCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val v = col(valueMicrosCol).cast("decimal(38,0)")
    df.withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("s1", sum(v).over(w))
      .withColumn("s2", sum(v * v).over(w))
      .withColumn("is_anomaly",
        col("n_prior") >= minPrior && {
          val n = col("n_prior").cast("decimal(38,0)")
          val dev = n * v - col("s1")
          dev * dev > lit(z * z) * (n * col("s2") - col("s1") * col("s1"))
        })
      .drop("s1", "s2")
  }

  /** Exact Gini concentration index per group, in integer ppm — the
    * inequality number behind "the top 1% of customers drive X% of
    * revenue", computed by the rank formula
    * `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)` over ascending non-negative
    * micro-unit values (ties totally ordered by the entity id, so both
    * engines rank identically). Every term is an exact decimal integer
    * and the numerator of a sorted sequence is non-negative, so the
    * final `·10⁶ div` agrees across engines (floor = truncate above
    * zero).
    *
    * Shape: one rank window per group (sort bounded by group size) and
    * one |groups|-row aggregate — no broadcast, no second pass. */
  def giniIndex(
      df: DataFrame, groupCol: String, idCol: String,
      valueMicrosCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(valueMicrosCol), col(idCol))
    val v = col(valueMicrosCol).cast("decimal(38,0)")
    df.withColumn("_rank", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(v).as("_s"),
        sum(col("_rank").cast("decimal(38,0)") * v).as("_si"))
      .withColumn("gini_ppm",
        expr("cast(((2 * _si - (n + 1) * _s) * 1000000) div (n * _s) as bigint)"))
      // the raw Σ can exceed double's 2^53 exact-integer range, where a
      // decimal→double cast differs by an ulp between engines — emit
      // only the exact integer outputs
      .select(col(groupCol), col("n"), col("gini_ppm"))
  }

  /** Contribution share (ratio-to-report): each row's integer-ppm share
    * of its partition's total — percent-of-total revenue, traffic mix,
    * corpus composition. Runs on an ALREADY-AGGREGATED frame (the
    * |groups|·|parts| rollup, never facts); one window sum per
    * partition key, then an exact `· 10⁶ div total` in decimal (the
    * blowup overflows a long at real revenue scales). Values must be
    * non-negative micro-units so floor (DuckDB) and truncate (Spark)
    * agree. */
  def contributionShare(
      agg: DataFrame, partCols: Seq[String], valueMicrosCol: String): DataFrame = {
    require(partCols.nonEmpty, "need at least one partition column")
    val w = Window.partitionBy(partCols.map(col): _*)
    agg.withColumn("part_total", sum(col(valueMicrosCol)).over(w))
      .withColumn("share_ppm",
        expr(s"(cast(`$valueMicrosCol` as decimal(38,0)) * 1000000) div part_total"))
  }

  def periodGrowth(
      agg: DataFrame, groupCol: String, periodCol: String,
      valueMicrosCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(periodCol))
    val diff = col(valueMicrosCol) - col("prev_micros")
    agg.withColumn("prev_micros", lag(col(valueMicrosCol), 1).over(w))
      .withColumn("growth_ppm",
        when(col("prev_micros").isNotNull && col("prev_micros") > 0L,
          // sign split keeps the integer division POSITIVE on both
          // engines (truncating ÷ of positives agrees everywhere;
          // negative `div` truncates in Spark but floors in DuckDB);
          // the ·10⁶ blowup runs in decimal(38) — |diff| can reach 10¹³
          // micros, ×10⁶ overflows a long (ANSI mode throws)
          signum(diff).cast("long") *
            expr(s"(cast(abs(`$valueMicrosCol` - prev_micros) as decimal(38,0))" +
              " * 1000000) div prev_micros")))
  }

  /** Theil–Sen robust trend per group: the MEDIAN of all C(n,2) pairwise
    * slopes (y_j−y_i)/(x_j−x_i) — the standard robust alternative to
    * least squares (up to 29% of the points can be arbitrary outliers
    * without moving the estimate; OLS breaks on one). Designed for
    * REDUCED per-group series (daily counts, weekly revenue): the pair
    * expansion is quadratic IN THE GROUP, so n must be series-sized
    * (≤ ~10⁴ points → ≤ ~10⁸ slopes per group), never corpus-sized.
    *
    * Exactness: each slope stays an integer FRACTION (num = Δy, den =
    * Δx > 0) — never divided. The median is the lower-median element
    * (rank ⌈m/2⌉, the [[groupedQuantiles]] convention) under the
    * fraction's value order; structs sort by (num/den double, num, den),
    * safe because distinct rationals with den ≤ series length differ by
    * ≥ 1/den² ≫ the double ulp at these magnitudes, and exact ties
    * break on the integer fields identically in any engine. Pairs with
    * equal x are excluded (slope undefined), per the standard estimator.
    *
    * Shape: ONE keyed aggregation collapses each group to its sorted
    * (x, y) array; the pair expansion and median selection run inside a
    * single projection over |groups| rows — array HOFs, no join, no
    * window, no second shuffle. */
  def theilSenSlope(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val pts = df.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y")))).as("pts"))
    // filter BEFORE building the struct: ANSI mode makes num/0 an error,
    // so equal-x partners must be dropped before the value division
    val slopes = flatten(transform(col("pts"), (a, i) =>
      transform(
        filter(slice(col("pts"), i + 2, greatest(size(col("pts")) - i - 1, lit(0))),
          b => b.getField("x") > a.getField("x")),
        b => struct(
          ((b.getField("y") - a.getField("y")).cast("double") /
            (b.getField("x") - a.getField("x")).cast("double")).as("v"),
          (b.getField("y") - a.getField("y")).as("num"),
          (b.getField("x") - a.getField("x")).as("den")))))
    val mid = floor((size(col("slopes")) + 1) / 2).cast("int")
    pts
      .withColumn("slopes", array_sort(slopes))
      .select(col(groupCol),
        size(col("pts")).cast("long").as("n_points"),
        size(col("slopes")).cast("long").as("n_slopes"),
        element_at(col("slopes"), mid).getField("num").as("slope_num"),
        element_at(col("slopes"), mid).getField("den").as("slope_den"))
      .filter(col("n_slopes") > 0)
  }

  /** Cohen's kappa inter-rater agreement per group, as exact integer
    * fractions — the "do these two labelers/screens agree beyond
    * chance?" statistic every labeling pipeline reports before trusting
    * a rater (or an LLM judge) at scale. With contingency counts:
    * observed agreement o = Σ_k c_kk, expected e = Σ_k row_k·col_k / n,
    * and κ = (o/n − e/n)/(1 − e/n) — multiplied through by n²:
    *
    *   kappa_num = n·o − Σ_k row_k·col_k,  kappa_den = n² − Σ_k row_k·col_k
    *
    * Both integers; consumers divide at render time (den = 0 iff chance
    * agreement is already total — κ undefined, surfaced as the raw
    * fraction, never a NaN). Works for any label cardinality.
    *
    * Shape: ONE data-sized shuffle builds the (group, a, b) contingency
    * cells; marginals and the Σ row·col cross term are aggregations and
    * an equi-join over the |groups|×|labels| reduced frame. At 100 TB
    * only the first groupBy touches the corpus. */
  def cohenKappa(
      df: DataFrame, groupCol: String, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol), col(aCol).cast("string").as("la"),
        col(bCol).cast("string").as("lb"))
      .agg(count(lit(1)).as("c"))
    val totals = cells.groupBy(col(groupCol))
      .agg(sum(col("c")).as("n"),
        sum(when(col("la") === col("lb"), col("c")).otherwise(0L)).as("o"))
    val rowsM = cells.groupBy(col(groupCol), col("la"))
      .agg(sum(col("c")).as("row_k"))
    val colsM = cells.groupBy(col(groupCol), col("lb"))
      .agg(sum(col("c")).as("col_k"))
    val cross = rowsM.join(colsM,
        rowsM(groupCol) === colsM(groupCol) && col("la") === col("lb"))
      .groupBy(rowsM(groupCol))
      .agg(sum(col("row_k") * col("col_k")).as("rc"))
    totals.join(cross, Seq(groupCol), "left")
      .select(col(groupCol), col("n"), col("o"),
        (col("n") * col("o") - coalesce(col("rc"), lit(0L))).as("kappa_num"),
        (col("n") * col("n") - coalesce(col("rc"), lit(0L))).as("kappa_den"))
  }

  /** Exact ROC-AUC per group via the Mann–Whitney rank identity — the
    * threshold-free "does this score rank positives above negatives?"
    * number every quality-classifier pipeline reports, computed without
    * a single ROC-curve sweep: AUC = (Σ midrank_pos − P(P+1)/2)/(P·N).
    * Ties take MIDRANKS (the trapezoidal-ROC convention), kept integer
    * by doubling: 2·midrank = 2·rank_min + ties − 1, so
    *
    *   auc_num = Σ_pos(2·rank_min + ties − 1) − P(P+1),  auc_den = 2·P·N
    *
    * Both exact integers; κ-style render-time division. Degenerate
    * groups (P = 0 or N = 0) emit auc_den = 0 rather than a NaN.
    *
    * Shape: two keyed windows (rank over (group, score order), tie
    * counts over (group, score)) + one aggregate — the rank-rule gate
    * cost, sort bounded per group, nothing corpus-global. */
  def exactAuc(
      df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val scored = df.select(col(groupCol), col(scoreCol).as("s"),
        col(labelCol).cast("boolean").as("pos"))
      .withColumn("rnk",
        rank().over(Window.partitionBy(col(groupCol)).orderBy(col("s"))).cast("long"))
      .withColumn("ties",
        count(lit(1)).over(Window.partitionBy(col(groupCol), col("s"))).cast("long"))
    scored.groupBy(col(groupCol))
      .agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("pos"), col("rnk") * 2L + col("ties") - 1L)
          .otherwise(0L)).as("r2"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        (col("r2") - col("n_pos") * (col("n_pos") + 1L)).as("auc_num"),
        (col("n_pos") * col("n_neg") * 2L).as("auc_den"))
  }

  /** Calibration reliability bins per group — equi-depth score bins
    * with observed positive counts, the third leg of the scorer-eval
    * triad (κ agreement, AUC discrimination, THIS calibration): bin b's
    * rendered point is (score_sum/n, n_pos/n), and a well-calibrated
    * scorer walks the diagonal. Bins are rank-based (ntile over a TOTAL
    * order — callers supply unique tie columns, the equi-depth-decile
    * convention) so every emitted value is an exact integer; no
    * engine-varying bin-edge float arithmetic exists anywhere.
    *
    * Shape: the tiling runs distributed via [[distributedNtile]] (no
    * group ever sorts in one task — a scorer eval's groups are few and
    * data-sized), then one aggregate to |groups|×bins rows. */
  def calibrationBins(
      df: DataFrame, groupCol: String, scoreCol: String, labelCol: String,
      tieCols: Seq[String], bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    distributedNtile(df, bins, Seq(groupCol),
      col(scoreCol) +: tieCols.map(col), "bin")
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("n_pos"),
        sum(col(scoreCol).cast("long")).as("score_sum"))
  }

  /** CUSUM mean-shift changepoint per series: the split point k that
    * maximizes the cumulative deviation from the series mean — argmax_k
    * |Σ_{i≤k} y_i − k·ȳ| — the standard "WHERE did the level change"
    * localizer (Page 1954's statistic, offline form). Kept integer-exact
    * by scaling through n: S_k = n·Σ_{i≤k} y_i − k·T (T = series total),
    * so no mean division ever happens; |S| ranks identically in any
    * engine and the magnitude divides back to deviation units at render
    * time (S_k / n). Interior splits only (k < n; S_n ≡ 0 by
    * construction); ties break to the earliest k.
    *
    * Shape: one keyed aggregation to the |keys|×|points| frame, a
    * running-sum window partitioned BY KEY, one (total, n) frame joined
    * back broadcast, and a per-key max — no self-join, nothing
    * quadratic (contrast [[theilSenSlope]], which pays pairs for
    * robustness; CUSUM is the O(n) screen you run first). */
  def cusumChangepoint(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val ordered = df.select(col(groupCol), col(xCol).as("x"),
      col(yCol).cast("long").as("y"))
    val totals = ordered.groupBy(col(groupCol))
      .agg(sum(col("y")).as("t_total"), count(lit(1)).as("n_points"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("x"))
    val scored = ordered
      .withColumn("cum", sum(col("y")).over(w))
      .withColumn("k", row_number().over(w).cast("long"))
      .join(broadcast(totals), Seq(groupCol))
      .filter(col("k") < col("n_points")) // S_n ≡ 0: interior splits only
      .withColumn("s_k",
        col("n_points") * col("cum") - col("k") * col("t_total"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(abs(col("s_k")).desc, col("k").asc)))
      .filter(col("rn") === 1)
      .select(col(groupCol), col("n_points"), col("t_total"),
        col("k").as("split_k"), col("x").as("split_x"),
        col("s_k").as("cusum_num"))
  }

  /** Spearman rank correlation per group as exact integer fractions —
    * the monotone-association twin of [[corrMatrix]]'s Pearson: rank
    * both columns (MIDRANKS for ties, kept integer by the AUC doubling
    * trick: 2·midrank = 2·rank_min + ties − 1), then emit the Pearson
    * moment components of the doubled ranks:
    *
    *   rho_num  = n·Σuv − Σu·Σv
    *   rho_denx = n·Σu² − (Σu)²,  rho_deny = n·Σv² − (Σv)²
    *
    * with ρ = rho_num / √(rho_denx·rho_deny) at render time — the √ is
    * the only non-rational step, so it never enters the gate. All sums
    * accumulate in decimal(38,0) (DuckDB's HUGEINT twin): doubled ranks
    * reach 2n, their squares n², and n·Σu² reaches n⁴ — past int64 at
    * ~50k-row groups. Constant columns surface den = 0, not NaN.
    *
    * Shape: two keyed rank windows + one tie-count window per column
    * (sort runs bounded per group, the [[exactAuc]] cost ×2) and one
    * aggregate to |groups| rows. Spearman over ranks is the robust
    * "does y rise with x" answer when the relationship is monotone but
    * not linear — the screen you run before trusting Pearson. */
  def spearmanCorr(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    // NOTE (r16): an asc/desc-rank reformulation (2r + t − 1 =
    // r_asc + n + 1 − r_desc) was tried and REVERTED — the before-plan
    // shows hashpartitioning(group) already satisfies the tie-count
    // window's (group, value) clustering, so this shape was a single
    // exchange all along, and the interleaved A/B read identical times
    // (2.4–2.6 s both ways at sf0.1). Keeping the canonical form.
    def doubledMidrank(c: String, out: String)(in: DataFrame): DataFrame = in
      .withColumn("_r",
        rank().over(Window.partitionBy(col(groupCol)).orderBy(col(c))).cast("long"))
      .withColumn("_t",
        count(lit(1)).over(Window.partitionBy(col(groupCol), col(c))).cast("long"))
      .withColumn(out, (col("_r") * 2L + col("_t") - 1L).cast("decimal(38,0)"))
      .drop("_r", "_t")
    val ranked = doubledMidrank(yCol, "v")(doubledMidrank(xCol, "u")(
      df.select(col(groupCol), col(xCol), col(yCol))))
    val d = "decimal(38,0)"
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).cast(d).as("n"),
        sum(col("u")).as("su"), sum(col("v")).as("sv"),
        sum(col("u") * col("u")).as("suu"),
        sum(col("v") * col("v")).as("svv"),
        sum(col("u") * col("v")).as("suv"))
      .select(col(groupCol), col("n").cast("long").as("n"),
        (col("n") * col("suv") - col("su") * col("sv")).cast(d).as("rho_num"),
        (col("n") * col("suu") - col("su") * col("su")).cast(d).as("rho_denx"),
        (col("n") * col("svv") - col("sv") * col("sv")).cast(d).as("rho_deny"))
  }

  /** Exact distributed prefix sum over a totally-ordered UNIQUE key —
    * the shared scale-safe form behind [[mannWhitneyU]]'s midranks and
    * [[ksDrift]]'s corpus ECDF (the windowed twin of
    * [[graft.store.BulkImport]]'s two-pass offset stamping). A global
    * `Window.orderBy` would funnel the whole frame into ONE task; this
    * instead range-repartitions on the key, runs the cumulative window
    * PER PARTITION (keyed by `spark_partition_id` — parallel), and
    * broadcasts back a |partitions|-row offsets frame whose own
    * single-partition window is bounded by configuration, not data.
    *
    * The range-partitioned frame is localCheckpoint'd: range boundaries
    * are SAMPLED, so the window branch and the offsets branch must see
    * the same draw (an independent recompute could re-draw them and
    * mis-align partition ids). Inclusive: `outCol` at row r =
    * Σ `sumExpr` over rows with key ≤ r's key. `orderCol` must be
    * unique (a grouped key) so the order is total. */
  private[graft] def rangePrefixSum(
      df: DataFrame, orderCol: String, sumExpr: Column,
      outCol: String): DataFrame = {
    val parts =
      math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val local = df
      .repartitionByRange(parts, col(orderCol))
      .withColumn("_pp_val", sumExpr)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val lw = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = local.withColumn("_cum", sum(col("_pp_val")).over(lw))
    val agg = local.groupBy("_pid").agg(sum("_pp_val").as("_ptot"))
    val zero = lit(0).cast(agg.schema("_ptot").dataType)
    val offsets = agg
      .withColumn("_off", coalesce(sum("_ptot").over(
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        zero))
      .select("_pid", "_off")
    cum.join(broadcast(offsets), Seq("_pid"))
      .withColumn(outCol, col("_off") + col("_cum"))
      .drop("_pp_val", "_pid", "_cum", "_off")
  }

  /** Exact `ntile(tiles)` over a (grouped) TOTAL order WITHOUT funneling
    * any group into one task — the distributed twin of
    * `ntile(k).over(Window.partitionBy(grp).orderBy(...))`, built on the
    * [[rangePrefixSum]] idiom: range-repartition on (group, order) so
    * each group's rows land in contiguous partitions, `row_number`
    * PER (physical partition × group) — parallel sort runs bounded by
    * partition size, not group size — then broadcast back a
    * |partitions|·|groups|-row offsets frame carrying each slice's
    * global rank offset and its group's total count. The rank→bucket
    * arithmetic is the SQL-standard ntile distribution (first n mod k
    * buckets get ⌈n/k⌉), all integer `div` — bit-identical to the
    * windowed form on both engines, so swapping a gate site onto this
    * path changes no hashes.
    *
    * This is the fallback the rfmScores/equi-depth/calibration docs
    * promised: a GLOBAL (or few-group) ntile window sorts the whole
    * frame in ONE task — fine on an |entities| reduced frame, a funnel
    * at 10⁹ entities. Here the only single-task work is the bounded
    * offsets frame (|partitions|·|groups| rows, configuration-sized).
    *
    * `partitionCols ++ orderCols` must be a UNIQUE total order per
    * group (callers tie-break by id — the equi-depth-decile convention);
    * the range-partitioned frame is localCheckpoint'd because range
    * boundaries are sampled and the rank branch and offsets branch must
    * see the same draw. */
  def distributedNtile(
      df: DataFrame, tiles: Int, partitionCols: Seq[String],
      orderCols: Seq[Column], outCol: String): DataFrame = {
    require(tiles >= 2, s"tiles must be >= 2: $tiles")
    require(orderCols.nonEmpty, "distributedNtile needs order columns")
    val parts =
      math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val local = df
      .repartitionByRange(parts, (partitionCols.map(col) ++ orderCols): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val slice = col("_pid") +: partitionCols.map(col)
    val lw = Window.partitionBy(slice: _*).orderBy(orderCols: _*)
    val cum = local.withColumn("_rn", row_number().over(lw).cast("long"))
    // offsets: per (partition, group) slice — its global rank offset is
    // the sum of EARLIER partitions' slice counts within the same group;
    // _n is the group total. Both windows run on the bounded frame.
    val agg = local.groupBy(slice: _*).agg(count(lit(1)).as("_ptot"))
    val offW = Window.partitionBy(partitionCols.map(col): _*).orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(partitionCols.map(col): _*)
    val offsets = agg
      .withColumn("_off", coalesce(sum("_ptot").over(offW), lit(0L)))
      .withColumn("_n", sum("_ptot").over(totW))
      .select(slice ++ Seq(col("_off"), col("_n")): _*)
    // NULL-SAFE join back to the offsets frame: the windowed ntile this
    // path claims bit-identity with keeps NULL as its own partition, so
    // a plain usingColumns equi-join would silently DROP null-group rows
    // (r13 advice). `<=>` on each key preserves them; offsets keys are
    // renamed first so the same-lineage self-join stays unambiguous.
    val joinKeys = "_pid" +: partitionCols
    // the rename prefix must not collide with any column of the cum
    // frame (a partition column named "ff" would make "_o"+"ff" ==
    // "_off" — an ambiguous-column AnalysisException; r14 advice).
    // The offsets frame's VALUE columns get the same fresh prefix (r15
    // review finding #7: bare "_off"/"_n" collide with partition
    // columns of those names); the freshness search covers keys AND
    // values, escalating underscores until everything is fresh.
    val prefix = Iterator.iterate("_ntile_o_")(_ + "_")
      .find { p =>
        (joinKeys.map(p + _) ++ Seq(p + "off", p + "n", p + "rank", p + "q", p + "r"))
          .forall(!cum.columns.contains(_))
      }
      .get
    val offC = prefix + "off"
    val nC = prefix + "n"
    val rankC = prefix + "rank"
    val qC = prefix + "q"
    val rC = prefix + "r"
    val offRenamed = offsets.toDF(joinKeys.map(prefix + _) ++ Seq(offC, nC): _*)
    val joinCond = joinKeys.map(k => col(k) <=> col(prefix + k)).reduce(_ && _)
    cum.join(broadcast(offRenamed), joinCond)
      .drop(joinKeys.map(prefix + _): _*)
      .withColumn(rankC, col(offC) + col("_rn"))
      .withColumn(qC, expr(s"`$nC` div $tiles"))
      .withColumn(rC, col(nC) % tiles)
      // standard ntile: ranks 1..r*(q+1) fill the big buckets, the
      // rest the small ones; greatest(q, 1) keeps the untaken branch
      // from dividing by zero when n < tiles (every row is then a big
      // bucket of size 1)
      .withColumn(outCol,
        when(col(rankC) <= col(rC) * (col(qC) + 1L),
          expr(s"(`$rankC` - 1) div (`$qC` + 1) + 1"))
          .otherwise(expr(
            s"`$rC` + (`$rankC` - `$rC` * (`$qC` + 1) - 1) div greatest(`$qC`, 1) + 1")))
      .drop("_pid", "_rn", offC, nC, rankC, qC, rC)
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) between two groups — the
    * nonparametric two-sample test an A/B eval reaches for when values
    * are skewed (latencies, spend) and a t-test's mean is the wrong
    * summary. Emitted as EXACT integers so the gate never divides or
    * approximates: `u2_a` = 2·U_A and `u2_b` = 2·U_B (doubled because
    * midranks of even tie runs are half-integers — the same doubled-rank
    * device as [[spearmanCorr]]), with `u2_a + u2_b = 2·n_a·n_b` by
    * construction (asserted in OperatorsSpec). Consumers compute
    * effect size (AUC-equivalent U/(n_a·n_b)) or the normal
    * approximation downstream.
    *
    * 100 TB shape: the ONE data-sized operation is the count-by-value
    * aggregate (map-side combined — ties collapse before any shuffle);
    * the "values strictly below v" prefix then runs DISTRIBUTED over the
    * reduced |distinct v| frame: range-repartition on v, a per-partition
    * cumulative window (parallel — partitioned by `spark_partition_id`),
    * and a |partitions|-row offset frame broadcast back (the
    * [[graft.store.BulkImport]] two-pass prefix-sum idiom). A continuous
    * value domain, where |distinct v| ≈ |rows|, therefore never funnels
    * into one task — the round-11 single-partition `Window.orderBy`
    * would have. Sums accumulate in decimal(38,0) END TO END (rank-sums
    * reach N², past int64 at N > ~3e9 rows); `u2_a`/`u2_b` are returned
    * as decimal(38,0) — rendering (string at a gate boundary, or a
    * checked long for small N) is the caller's choice, so no silent
    * non-ANSI decimal→long NULL can occur inside the operator. */
  def mannWhitneyU(
      df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB,
      s"mannWhitneyU needs two distinct groups, got '$groupA' twice")
    val d = "decimal(38,0)"
    val counts = df
      .filter(col(groupCol).isin(groupA, groupB))
      .groupBy(col(valueCol).as("v"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).cast(d).as("ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).cast(d).as("cb"))
    // distributed prefix of (ca+cb) in v-order (v is unique after the
    // groupBy); `below` = inclusive prefix − own tie-run size, and the
    // doubled midrank of the tie run at v = 2·below + (ca+cb) + 1
    val ranked = rangePrefixSum(counts, "v", col("ca") + col("cb"), "_cumall")
      .withColumn("below", col("_cumall") - (col("ca") + col("cb")))
    ranked
      .agg(
        sum("ca").as("na"), sum("cb").as("nb"),
        sum(col("ca") * (col("below") * 2 + col("ca") + col("cb") + 1)).as("r2a"),
        sum(col("cb") * (col("below") * 2 + col("ca") + col("cb") + 1)).as("r2b"))
      .select(
        col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        (col("r2a") - col("na") * (col("na") + 1)).cast(d).as("u2_a"),
        (col("r2b") - col("nb") * (col("nb") + 1)).cast(d).as("u2_b"))
  }

  /** Classical additive seasonal decomposition of a daily count series,
    * per series key: trend = centered 7-day moving window, seasonal =
    * the day-of-week deviation from trend. All arithmetic is integer-
    * exact — the trend is kept as the 7-day SUM (not the mean) and the
    * detrended value as `7·cnt − trend7_sum` (= 7× the deviation from
    * the centered mean), so no engine-varying division ever happens;
    * consumers divide at render time. A day only gets a trend when its
    * centered window is COMPLETE (7 rows spanning exactly 6 calendar
    * days) — edges and gap-adjacent days yield NULL rather than a
    * silently-biased partial mean.
    *
    * `dow` is engine-neutral epoch-day arithmetic (days since 1970-01-01
    * mod 7, so 0 = Thursday) rather than any locale-dependent
    * day-of-week function.
    *
    * 100 TB shape: the ONE data-sized operation is the keyed daily
    * count (map-side combined); the window then runs over the reduced
    * |keys|×|days| frame, partitioned BY KEY — parallel across series,
    * never a global sort. Returns the per-day frame (key, d, dow, cnt,
    * trend7_sum, detrended7); callers aggregate seasonal indices from
    * it (see the `seasonal_decompose` gate). */
  def seasonalDecompose(
      events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val win = Window.partitionBy(col(keyCol)).orderBy(col("d"))
      .rowsBetween(-3, 3)
    daily
      .withColumn("trend7_sum", sum(col("cnt")).over(win))
      .withColumn("w_n", count(lit(1)).over(win))
      .withColumn("w_span", datediff(max(col("d")).over(win), min(col("d")).over(win)))
      .withColumn("dow", pmod(datediff(col("d"), lit("1970-01-01")), lit(7)).cast("long"))
      .withColumn("complete", col("w_n") === 7 && col("w_span") === 6)
      .select(col(keyCol), col("d"), col("dow"), col("cnt"),
        when(col("complete"), col("trend7_sum")).as("trend7_sum"),
        when(col("complete"), col("cnt") * 7L - col("trend7_sum")).as("detrended7"))
  }

  /** Weighted lower median per group — the element at the first
    * position where cumulative weight reaches half the total
    * (2·cumw ≥ totw, cross-multiplied so no halving ever divides):
    * "the price at which half the UNITS sold" rather than half the
    * order lines, the volume-weighted robust center. Ties in the value
    * close through `tieCols` so the chosen element is a total-order
    * pick; weights must be nonnegative integers (quantities, counts —
    * the house integer contract).
    *
    * Shape: one keyed window (cumulative weight, sort bounded per
    * group) + the totals from the same aggregate the window rides;
    * the earliest qualifying row per group survives via one more
    * keyed row_number. */
  def weightedMedian(
      df: DataFrame, groupCol: String, valueCol: String, weightCol: String,
      tieCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy((col(valueCol) +: tieCols.map(col)): _*)
    val wt = Window.partitionBy(col(groupCol))
    df.withColumn("_cumw", sum(col(weightCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_totw", sum(col(weightCol)).over(wt))
      .filter(col("_cumw") * 2L >= col("_totw"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(groupCol), col(valueCol).as("w_median"),
        col("_cumw").as("cum_weight"), col("_totw").as("total_weight"))
  }

  /** Quantile alignment onto a reference source — the distribution-
    * normalization step (the bioinformatics quantile-normalization /
    * domain-adaptation CDF-matching idea): each source's k-th of n
    * values maps to the reference source's value at the proportional
    * rank ⌊(k−1)·n_ref/n⌋ + 1, so every source leaves with the
    * reference's exact value distribution and cross-source thresholds
    * mean the same thing everywhere. All-integer rank arithmetic (one
    * multiply + floor-div on ranks — no interpolation, the aligned
    * value is an actual reference element); `idCol` closes rank ties so
    * the per-row assignment is engine-deterministic (equal values get
    * equal aligned values regardless, since proportional positions of
    * adjacent ranks land on monotone reference positions).
    *
    * Shape: one keyed ranking window per source (sort runs bounded per
    * source), the reference source's own ranked frame (n_ref rows)
    * joined on the computed position — keyed shuffles only, NEVER a
    * pooled corpus-global sort (the pooled-reference variant needs one;
    * aligning onto a designated reference is the scale-correct
    * formulation, and any source can be the reference). */
  def quantileAlign(
      df: DataFrame, sourceCol: String, valueCol: String, idCol: String,
      refSource: String): DataFrame = {
    val ranked = df
      .withColumn("_r", row_number().over(
        Window.partitionBy(col(sourceCol)).orderBy(col(valueCol), col(idCol)))
        .cast("long"))
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(col(sourceCol))).cast("long"))
    val ref = ranked.filter(col(sourceCol) === refSource)
      .select(col("_r").as("_pos"), col(valueCol).as("aligned"),
        col("_n").as("_n_ref"))
    val nRef = ref.select(max(col("_n_ref")).as("_n_ref"))
    ranked.crossJoin(broadcast(nRef))
      // integer div (not `/`, which is a double divide): r·n_ref can
      // pass 2⁵³ long before it passes int64
      .withColumn("_pos", expr("(_r - 1) * _n_ref div _n") + 1L)
      .join(ref.drop("_n_ref"), Seq("_pos"))
      .select(col(sourceCol), col(idCol), col(valueCol), col("aligned"))
  }

  /** Seasonality-adjusted daily anomaly screen — the composition a
    * monitoring pipeline actually deploys: [[seasonalDecompose]] removes
    * trend, the per-(key, day-of-week) MEDIAN removes the seasonal
    * component, and a day is flagged when its residual exceeds
    * `madMultiple`× that cell's MAD — so Mondays are judged against
    * Monday's own spread and a weekly cycle never false-alarms. Both
    * the median and the MAD are LOWER medians (rank ⌈n/2⌉ — an actual
    * data element, no interpolation), keeping every emitted value an
    * exact integer in detrended-7ths; cells with MAD = 0 (degenerate
    * spread) are excluded rather than dividing by zero, and the
    * threshold compare is the cross-multiplied `|dev| ≥ k·MAD`.
    *
    * Shape: the corpus collapses to |keys|×|days| in [[seasonalDecompose]]'s
    * one data-sized aggregate; everything after — two ranking windows
    * partitioned by (key, dow) and two reduced-frame joins — runs on
    * that frame. Relative (MAD-multiple) thresholds are the point:
    * they survive a 100× traffic scale-up unchanged, where any
    * absolute count threshold would re-tune per deployment. */
  def seasonalOutliers(
      events: DataFrame, keyCol: String, tsCol: String,
      madMultiple: Long = 4L): DataFrame = {
    require(madMultiple >= 1)
    val det = seasonalDecompose(events, keyCol, tsCol)
      .filter(col("detrended7").isNotNull)
    def lowerMedian(in: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy(col(keyCol), col("dow")).orderBy(col(c))
      val wc = Window.partitionBy(col(keyCol), col("dow"))
      in.withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(wc))
        .filter(col("_rn") === floor((col("_n") + lit(1)) / lit(2)))
        .select(col(keyCol), col("dow"), col(c).as(out))
    }
    val med = lowerMedian(det, "detrended7", "med7")
    val dev = det.join(med, Seq(keyCol, "dow"))
      .withColumn("abs_dev7", abs(col("detrended7") - col("med7")))
    val mad = lowerMedian(dev, "abs_dev7", "mad7")
    dev.join(mad, Seq(keyCol, "dow"))
      .filter(col("mad7") > 0 && col("abs_dev7") >= lit(madMultiple) * col("mad7"))
      .select(col(keyCol), col("d"), col("dow"), col("cnt"),
        col("detrended7"), col("med7"), col("abs_dev7"), col("mad7"))
  }

  /** Per-group Gini impurity / Simpson diversity of a categorical mix,
    * as EXACT integer rationals: for group g with category counts c_i
    * and n = Σ c_i,
    * {{{
    *   gini = 1 − Σ (c_i/n)² = (n² − Σ c_i²) / n²
    * }}}
    * emitted as `gini_num = n² − Σc_i²` and `gini_den = n²` (and the
    * building blocks n, Σc_i², n_categories) — no division, so the
    * result hash-matches cross-engine at any magnitude; callers divide
    * at render time. The same fields give the Simpson index (Σ(c/n)² =
    * ssq/n²) and the "effective number of categories" (n²/Σc² =
    * den/ssq) — the diversity report a mixture/curation pass runs on
    * source, language, or label mixes.
    *
    * 100 TB shape: ONE map-side-combined (group, category) count, then
    * a |groups×categories|-sized aggregate. Sums are decimal(38,0) —
    * n² passes int64 at n > ~3e9 rows per group; gates render within
    * long or cast to string (the mann_whitney discipline). */
  def giniImpurity(
      df: DataFrame, groupCols: Seq[String], catCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val d = "decimal(38,0)"
    val counts = df
      .groupBy((groupCols :+ catCol).map(col): _*)
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("c")).cast(d).as("n"),
        // cast BEFORE multiplying: a long*long c² wraps past ~3e9 rows
        // per cell — the very regime the decimal contract is for
        sum(col("c").cast(d) * col("c").cast(d)).cast(d).as("ssq"),
        count(lit(1)).as("n_categories"))
      .select((groupCols.map(col) ++ Seq(
        col("n"), col("ssq"), col("n_categories"),
        (col("n") * col("n") - col("ssq")).cast(d).as("gini_num"),
        (col("n") * col("n")).cast(d).as("gini_den"))): _*)
  }
}
