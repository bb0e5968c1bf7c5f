package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the message log — the funnel / cohort
  * reports an OLAP user runs against the same events a store serves
  * (reference read model: `ReadonlyStreamStoreBase.cs` positions +
  * per-stream ordering; these operators consume that order).
  *
  * Both operators are pure integer/count pipelines (timestamps stay
  * micros-since-epoch longs end to end), so results are bit-exact and
  * DuckDB-oracle-checkable.
  */
object Behavioral {

  /** Ordered funnel: for each prefix of `steps`, how many entities
    * completed the whole prefix IN ORDER (first-touch semantics: step i
    * must occur strictly after the EARLIEST qualifying occurrence of
    * step i−1). Returns one row per step: (step, event_type, entities).
    *
    * Shape: one conditional-min aggregation per step, each a shuffle on
    * `idCol` over a monotonically SHRINKING frontier — the classic
    * warehouse funnel, not a per-entity sort. At 100 TB: the events scan
    * repeats per step but with `event_type = stepᵢ` pushed into the
    * parquet scan (a selective dictionary filter), and every join keys
    * on the same `idCol`, so a bucketed-by-id layout
    * ([[graft.sources.BucketedTables]]) makes all k passes exchange-free
    * on the frontier side. Frontiers only shrink, and broadcast once
    * under the AQE threshold. k is funnel length (3-6), not data-sized.
    *
    * First-touch (min-ts) funnels can under-count re-entrant paths
    * (an entity that aborts after step 1 and later re-runs the full
    * funnel still anchors at its first step-1 touch); that is the
    * standard trade for a deterministic single-anchor definition and
    * matches the oracle exactly.
    */
  def funnel(
      events: DataFrame, idCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    funnelFrontiers(events, idCol, typeCol, tsCol, steps)
      .zip(steps).zipWithIndex.map { case ((f, step), i) =>
        f.agg(count(lit(1)).as("entities"))
          .select(lit(i + 1).cast("int").as("step"),
            lit(step).as("event_type"), col("entities"))
      }.reduce(_.unionAll(_))
  }

  /** The funnel's per-step frontier frames — frontier(i) has one row per
    * entity that completed steps 0..i, with the earliest completion time
    * of step i given the step i−1 anchor. Exposed so the exchange-free
    * claim over a bucketed-by-id layout is a pinned plan-shape test
    * (PlanShapeSpec), not a doc-comment assertion. */
  def funnelFrontiers(
      events: DataFrame, idCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(idCol), col(typeCol), col(tsCol))
    val first = ev.filter(col(typeCol) === steps.head)
      .groupBy(idCol).agg(min(tsCol).as("t"))
    steps.tail.scanLeft(first) { (prev, step) =>
      ev.filter(col(typeCol) === step)
        .join(prev.select(col(idCol), col("t").as("prev_t")), idCol)
        .filter(col(tsCol) > col("prev_t"))
        .groupBy(idCol).agg(min(tsCol).as("t"))
    }
  }

  /** Cohort retention: entities are cohorted by the epoch-week of their
    * first activity; each (cohort_week, week_offset) cell counts the
    * distinct entities from that cohort active `offset` weeks later.
    * Weeks are `floor(us / 7·86400·10⁶)` — integer division on the raw
    * micros, no calendar/timezone semantics to diverge on.
    *
    * Shape: distinct on (id, week) first — that one shuffle collapses
    * the event volume to ≤ |entities|·|weeks| rows and every later step
    * runs on the collapsed frame: the per-entity min is a partial-agg
    * shuffle on id (same key ⇒ co-located), and the final cell count is
    * an agg over (cohort, offset) — a frame bounded by weeks², tiny at
    * any corpus size. `count(distinct id)` inside the final agg is safe
    * because (id, week) is already unique ⇒ Spark plans it as a plain
    * count after the existing distinct, no expand-node blowup. */
  def cohortRetention(
      events: DataFrame, idCol: String, tsCol: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // `div` is exact long division (DuckDB `//`); `/` would detour
    // through double
    val idWeek = events
      .select(col(idCol), expr(s"CAST($tsCol AS BIGINT) div $weekUs").as("week"))
      .distinct()
    val cohorts = idWeek.groupBy(idCol).agg(min("week").as("cohort_week"))
    idWeek.join(cohorts, idCol)
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col(idCol)).as("active_entities"))
  }

  /** SCD2 validity intervals from an update log: per entity, collapse
    * CONSECUTIVE equal attribute values into one interval and stamp each
    * interval with [valid_from, valid_to) in the log's own position
    * domain (`ordCol`, unique per entity) — the slowly-changing-dimension
    * type-2 build a warehouse runs over a CDC/event stream (the
    * reference's per-stream version order, `ReadonlyStreamStoreBase.cs`,
    * is exactly this order). The OPEN current interval has `valid_to`
    * NULL and `is_current` 1.
    *
    * Gaps-and-islands via the standard two-window construction: a lag
    * change flag, a running sum turning flags into run ids, then one
    * group-by per run. All three windows and the aggregate partition by
    * the SAME entity key, so at 100 TB the entity's history sorts within
    * its partition (bounded by per-entity event count, never corpus-wide)
    * and the whole operator is ONE shuffle on `idCol` — Spark plans the
    * three windows + agg into a single sort over a single exchange.
    * Pure integer/string comparisons ⇒ bit-exact vs the oracle. */
  def scd2Intervals(
      log: DataFrame, idCol: String, ordCol: String, attrCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byIdOrd = Window.partitionBy(idCol).orderBy(ordCol)
    val runs = log
      .select(col(idCol), col(ordCol), col(attrCol))
      .withColumn("chg",
        when(lag(col(attrCol), 1).over(byIdOrd).isNull ||
             lag(col(attrCol), 1).over(byIdOrd) =!= col(attrCol), 1L).otherwise(0L))
      .withColumn("run_id", sum("chg").over(byIdOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("run_id"))
      .agg(min(col(ordCol)).as("valid_from"), max(col(ordCol)).as("last_seen"),
        first(col(attrCol)).as(attrCol), count(lit(1)).as("n_rows"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(Window.partitionBy(idCol).orderBy("valid_from")))
      .withColumn("is_current", when(col("valid_to").isNull, 1L).otherwise(0L))
      .select(col(idCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("n_rows"), col("is_current"))
  }

  /** Point-in-time SCD2 lookup: annotate each fact row with the
    * dimension attribute that was CURRENT at the fact's own position —
    * the query every SCD2 table exists to answer ("what was the user's
    * plan when this order was placed"). `dim` is a
    * [[scd2Intervals]]-shaped frame (idCol, attrCol, valid_from …);
    * facts positioned before an entity's first interval get null.
    *
    * Because [[scd2Intervals]] emits CONTIGUOUS intervals per entity
    * (each `valid_to` equals the next `valid_from`, the last is open),
    * membership `t ∈ [valid_from, valid_to)` reduces to the as-of rule
    * "latest valid_from ≤ t" — so the lookup rides
    * [[AsOfJoin.asOf]]'s tagged-union running-window plan: ONE shuffle
    * on the entity key, per-partition sort, no range-join row blowup,
    * no broadcast requirement on either side. Output: facts + the
    * interval's attribute as `dim_<attrCol>`. */
  def pointInTime(
      facts: DataFrame, dim: DataFrame, idCol: String, factOrdCol: String,
      attrCol: String): DataFrame =
    AsOfJoin.asOf(facts, dim.select(col(idCol), col("valid_from"), col(attrCol)),
      keys = Seq(idCol), leftTs = factOrdCol, rightTs = "valid_from",
      payload = Seq(attrCol), prefix = "dim_")

  /** First-order Markov transition counts over the event log: for each
    * entity's position-ordered sequence, count (from_type → to_type)
    * transitions corpus-wide and attach the conditional probability in
    * integer parts-per-million (`ppm = cnt·10⁶ div Σ_to cnt`) — the
    * "what happens next" model behind next-event prediction, anomaly
    * scoring and session-flow Sankey reports. Integer ppm (not a float
    * ratio) keeps the gate hashable bit-for-bit.
    *
    * Shape: ONE shuffle on the entity key for the lag window (per-entity
    * sort, bounded by entity history), then a partial aggregation that
    * collapses the corpus to |types|² rows before the final exchange —
    * map-side combine does the heavy lifting, and the ppm window runs on
    * that tiny frame. At 100 TB nothing but (from, to, partial count)
    * crosses the second shuffle. */
  def transitionCounts(
      events: DataFrame, idCol: String, ordCol: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byIdOrd = Window.partitionBy(idCol).orderBy(ordCol)
    val pairs = events
      .select(col(idCol), col(ordCol), col(typeCol))
      .withColumn("from_type", lag(col(typeCol), 1).over(byIdOrd))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("transitions"))
    pairs.withColumn("prob_ppm",
      expr("transitions * 1000000L div sum(transitions) over (partition by from_type)"))
  }

  /** Contiguous sequential-pattern support counts: every length-`len`
    * run of consecutive event types inside one entity's timeline,
    * counted corpus-wide — the n-gram generalization of
    * [[transitionCounts]] (len = 2 reproduces its count column) and the
    * contiguous special case of PrefixSpan-style sequence mining
    * (Pei et al. ICDE'01; contiguity keeps the pattern space linear in
    * the event count instead of exponential, which is why production
    * clickstream miners start here). Output: one row per pattern
    * (`s0..s{len-1}`, `support`), `support >= minSupport`.
    *
    * Shape: ONE shuffle on the entity key for the `lead` window (the
    * per-entity sort is bounded by entity history), each event emits at
    * most one pattern occurrence — no blowup, unlike skip-gram
    * mining — then a partial aggregation collapses the corpus to
    * |types|^len pattern rows before the final exchange; map-side
    * combine does the heavy lifting. At 100 TB only (pattern, partial
    * count) crosses the second shuffle, same shape as
    * [[transitionCounts]]. */
  def sequentialPatterns(
      events: DataFrame, idCol: String, ordCol: String, typeCol: String,
      len: Int = 3, minSupport: Long = 1L): DataFrame = {
    require(len >= 2 && len <= 8, s"pattern length out of range: $len")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy(ordCol)
    val base = events.select(col(idCol), col(ordCol), col(typeCol).as("s0"))
    val withLeads = (1 until len).foldLeft(base) { (df, i) =>
      df.withColumn(s"s$i", lead(col("s0"), i).over(w))
    }
    val patternCols = (0 until len).map(i => s"s$i")
    withLeads
      .filter(patternCols.drop(1).map(col(_).isNotNull).reduce(_ && _))
      .groupBy(patternCols.map(col): _*)
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Last-touch attribution: each conversion event claims the MOST
    * RECENT preceding touch event within the same entity's timeline —
    * the default credit-assignment rule of marketing/recommendation
    * analytics ("which view led to this purchase"). Output: one row per
    * conversion (entity, conversion ord, attributed touch ord, or null
    * when the entity converted with no prior touch).
    *
    * The running "latest touch so far" is a cumulative `max(CASE)` over
    * the entity window — `ordCol` is monotone within the window by
    * definition, so max(preceding touch ords) IS the latest, with no
    * IGNORE NULLS / last_value engine-dependence (every engine agrees
    * on integer max). Same single-shuffle shape as [[transitionCounts]]:
    * one keyed exchange for the window, per-entity sort bounded by that
    * entity's history, then a filter to conversion rows — the output is
    * |conversions|, never |events|. */
  def lastTouchAttribution(
      events: DataFrame, idCol: String, ordCol: String, typeCol: String,
      touchType: String, convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy(ordCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touch_ord",
        max(when(col(typeCol) === touchType, col(ordCol))).over(w))
      .filter(col(typeCol) === convType)
      .select(col(idCol), col(ordCol).as("conv_ord"), col("touch_ord"))
  }

  /** Linear multi-touch attribution in exact ppm: each conversion
    * splits 1 000 000 ppm equally across its in-lookback prior touches
    * (credit = 1000000 div k), with the truncation remainder assigned
    * to the LATEST touch — a stated, deterministic convention that
    * conserves credit exactly: Σ credit over a conversion's touches is
    * 1 000 000, always (the spec asserts this). Conversions with no
    * in-window touch credit a synthetic `(direct)` channel in full —
    * the classic "direct traffic" bucket, so total credit =
    * 1 000 000 × conversions corpus-wide. The fractional-credit
    * counterpart of [[lastTouchAttribution]]'s winner-takes-all.
    *
    * Shape: conversions ⋈ touches per entity (one keyed shuffle each,
    * co-partitioned equi-join on the entity + a time-range filter) —
    * pair volume is bounded by per-entity in-window activity, the same
    * contract as any interval join; then one window per conversion
    * (k, latest) over those pairs and a |channels|-row roll-up. */
  def linearAttribution(
      events: DataFrame, idCol: String, tsCol: String, typeCol: String,
      touchTypes: Seq[String], convType: String,
      lookbackMicros: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType))
    require(lookbackMicros > 0)
    import org.apache.spark.sql.expressions.Window
    val convs = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("_id"), col(tsCol).as("_conv_ts"))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(idCol).as("_id"), col(tsCol).as("_touch_ts"),
        col(typeCol).as("channel"))
    val pairs = convs.join(touches, Seq("_id"))
      .filter(col("_touch_ts") < col("_conv_ts") &&
        col("_touch_ts") >= col("_conv_ts") - lookbackMicros)
    val perConv = Window.partitionBy(col("_id"), col("_conv_ts"))
    val ranked = pairs
      .withColumn("_k", count(lit(1)).over(perConv))
      .withColumn("_rn", row_number().over(
        perConv.orderBy(col("_touch_ts").desc, col("channel").asc)))
      .withColumn("_credit",
        expr("1000000 div _k") +
          when(col("_rn") === 1, lit(1000000L) - expr("1000000 div _k") * col("_k"))
            .otherwise(0L))
    val attributed = ranked.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        count_distinct(col("_id"), col("_conv_ts")).as("n_conversions"),
        sum(col("_credit")).as("credit_ppm"))
    val direct = convs.join(
        pairs.select("_id", "_conv_ts").distinct(),
        Seq("_id", "_conv_ts"), "left_anti")
      .agg(lit("(direct)").as("channel"),
        lit(0L).as("n_touches"),
        count(lit(1)).as("n_conversions"),
        (count(lit(1)) * 1000000L).as("credit_ppm"))
      .filter(col("n_conversions") > 0)
    attributed.union(direct)
  }

  /** Kaplan–Meier life table per signup cohort — the survival-analysis
    * ingredients (never the product estimator itself: S(t) = Π(1 −
    * dᵢ/nᵢ) is a rational with compounding denominators, so the gate
    * emits the exact integer life table and S(t) renders downstream).
    * Per user: lifetime = days from first to last activity; users
    * still active within `censorDays` of the corpus horizon are
    * CENSORED (alive at last observation), not deaths — the
    * right-censoring distinction that makes naive churn rates lie.
    * Output per (cohort_week, t_day): n_risk (users whose lifetime
    * reached t), n_deaths, n_censored.
    *
    * Shape: one corpus-sized keyed aggregate (user → first/last, map-
    * side combined), the one-row horizon broadcast onto it, then a
    * |cohorts|×|days| frame where the n_risk suffix sum runs as a
    * keyed window ordered by lifetime DESC — reduced-frame windows
    * only, the seasonalDecompose discipline. */
  def survivalTable(
      events: DataFrame, idCol: String, tsCol: String,
      censorDays: Int = 3): DataFrame = {
    require(censorDays >= 0)
    import org.apache.spark.sql.expressions.Window
    val horizon = events.agg(max(to_date(col(tsCol))).as("_horizon"))
    val users = events.groupBy(col(idCol))
      .agg(min(to_date(col(tsCol))).as("_first_d"),
        max(to_date(col(tsCol))).as("_last_d"))
      .crossJoin(broadcast(horizon))
      .withColumn("t_day", datediff(col("_last_d"), col("_first_d")).cast("long"))
      .withColumn("censored",
        datediff(col("_horizon"), col("_last_d")) < censorDays)
      .withColumn("cohort_week",
        expr("datediff(_first_d, date '1970-01-01') div 7").cast("long"))
    val table = users.groupBy(col("cohort_week"), col("t_day"))
      .agg(sum(when(col("censored"), 0L).otherwise(1L)).as("n_deaths"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("n_censored"))
    table
      .withColumn("n_risk", sum(col("n_deaths") + col("n_censored")).over(
        Window.partitionBy(col("cohort_week")).orderBy(col("t_day").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("cohort_week", "t_day", "n_risk", "n_deaths", "n_censored")
  }

  /** Activity streaks per entity — the gaps-and-islands classic (the
    * Duolingo-streak / SLA-consecutive-breach shape): distinct active
    * days collapse to runs via the day − row_number island key (two
    * consecutive days share it, a gap breaks it), then per entity:
    * active days, number of streaks, longest streak, and the CURRENT
    * streak (the run touching the entity's last active day). All
    * integer; ties impossible (days are distinct after the dedup).
    *
    * Shape: the day dedup is the one corpus-sized aggregate (distinct
    * (entity, day), map-side combined); the island window and both
    * roll-ups run per entity over its |days| rows — keyed sort runs,
    * never global. */
  def activityStreaks(
      events: DataFrame, idCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = events
      .select(col(idCol), to_date(col(tsCol)).as("_d")).distinct()
      .withColumn("_epoch", datediff(col("_d"), lit("1970-01-01")).cast("long"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("_epoch"))
    val islands = days
      .withColumn("_island", col("_epoch") - row_number().over(w))
      .groupBy(col(idCol), col("_island"))
      .agg(count(lit(1)).as("_len"), max(col("_epoch")).as("_last"))
    islands.groupBy(col(idCol))
      .agg(sum(col("_len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("_len")).as("longest_streak"),
        max(col("_last")).as("_last_day"),
        max(struct(col("_last"), col("_len"))).as("_last_run"))
      .select(col(idCol), col("n_active_days"), col("n_streaks"),
        col("longest_streak"),
        col("_last_run._len").as("current_streak"),
        col("_last_day").as("last_active_epochday"))
  }

  /** Price–volume bridge (mix-shift decomposition, the analyst's
    * revenue-waterfall): between two periods, per segment,
    * Δrev = volume effect + price effect with ONE common denominator:
    *
    *   vol_num = (q1 − q0)·rev0,  price_num = rev1·q0 − q1·rev0,
    *   den = q0,   and (vol_num + price_num)/den = rev1 − rev0 exactly
    *
    * — the standard (q1−q0)·p0 + q1·(p1−p0) bridge with the average
    * price p = rev/q never divided out, so every emitted value is an
    * exact integer (micros revenue × integral quantities, accumulated
    * in decimal(38,0)) and the two effects PROVABLY sum to the revenue
    * delta. Segments present in only one period emit with q=rev=0 on
    * the other side (den = 0 ⇒ pure new/lost business, rendered as
    * 100% volume downstream).
    *
    * Shape: one filtered scan per period is avoided — a single scan
    * with conditional aggregates (sum(CASE period)) collapses straight
    * to |segments| rows, map-side combined; the bridge arithmetic runs
    * on that frame. */
  def priceVolumeBridge(
      df: DataFrame, segCol: String, periodCol: String, qtyCol: String,
      revMicrosCol: String, period0: String, period1: String): DataFrame = {
    val d = "decimal(38,0)"
    df.filter(col(periodCol).isin(period0, period1))
      .groupBy(col(segCol))
      .agg(
        sum(when(col(periodCol) === period0, col(qtyCol)).otherwise(0L)).as("q0"),
        sum(when(col(periodCol) === period0, col(revMicrosCol)).otherwise(0L)).as("rev0"),
        sum(when(col(periodCol) === period1, col(qtyCol)).otherwise(0L)).as("q1"),
        sum(when(col(periodCol) === period1, col(revMicrosCol)).otherwise(0L)).as("rev1"))
      .select(col(segCol), col("q0"), col("q1"), col("rev0"), col("rev1"),
        ((col("q1") - col("q0")).cast(d) * col("rev0")).cast(d).as("vol_num"),
        (col("rev1").cast(d) * col("q0") - col("q1").cast(d) * col("rev0"))
          .cast(d).as("price_num"),
        col("q0").as("den"))
  }

  /** RFM segmentation (recency / frequency / monetary, the classic
    * direct-marketing scoring): per entity, the newest activity marker,
    * event count, and exact-decimal spend, each quantile-scored into
    * `tiles` buckets, composed into the familiar three-digit segment
    * code (r·100 + f·10 + m). Ties are broken by the entity id inside
    * every ordering, so the tiling is a total order and both engines
    * agree bucket-for-bucket.
    *
    * Shape: ONE corpus-sized keyed aggregation (map-side combined)
    * collapses events to the |entities| frame; the three tilings then
    * run DISTRIBUTED over that reduced frame via
    * [[Stats.distributedNtile]] (range-repartitioned parallel rank, the
    * rangePrefixSum idiom) — at 10⁹ entities no single task ever sorts
    * the whole frame, and the rank→bucket arithmetic is bit-identical
    * to the global `ntile` window it replaces. */
  def rfmScores(
      events: DataFrame, idCol: String, ordCol: String, valueCol: String,
      tiles: Int = 5): DataFrame = {
    require(tiles >= 2, s"tiles must be >= 2: $tiles")
    val u = events.groupBy(col(idCol))
      .agg(
        max(col(ordCol)).as("recency"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(30,6)")).as("monetary"))
    val tiled = Seq("recency" -> "r_score", "frequency" -> "f_score",
        "monetary" -> "m_score")
      .foldLeft(u) { case (acc, (metric, out)) =>
        Stats.distributedNtile(acc, tiles, Nil,
          Seq(col(metric), col(idCol)), out)
      }
    tiled.select(col(idCol), col("recency"), col("frequency"),
        col("monetary").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"))
      .withColumn("rfm",
        col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
  }

  /** Exact rolling distinct actives (DAU/WAU-style): per day, the
    * distinct entities active THAT day and within the trailing
    * `window`-day range — exact, not sketched. The naive windowed
    * COUNT(DISTINCT) needs per-day state of every id seen in the range
    * (engines reject it outright over window frames); instead each
    * event CONTRIBUTES FORWARD to the `window` day-windows it falls in
    * (`explode(sequence(day, day+window−1))`), turning the rolling
    * distinct into a plain per-key distinct aggregate.
    *
    * Shape: one `window`× row replication (the explode is the cost —
    * linear, bounded, and the dial), then two distinct aggregations
    * that partial-aggregate map-side; the join uniting them runs on the
    * |days| frame. At 100 TB the replication factor is the window
    * length, not the data — 7× for WAU, 30× for MAU; beyond that,
    * sketch (HLL) or bitmap indexes are the documented fallback, traded
    * exactness and all. Only days that actually occur are emitted. */
  /** Top session paths: sessionize each entity's timeline by an
    * inactivity gap (the [[graft.streaming.EventTimeOps.sessionizeBatch]]
    * islands rule — lag + cumulative session starts), render each
    * session's ordered event types as one `>`-joined path string, and
    * count sessions per path — the journey/Sankey report behind "what
    * do users actually do before converting".
    *
    * Shape: one shuffle on the entity key; the session window sorts are
    * bounded per entity; the path render is `collect_list` inside the
    * (entity, session) aggregate — bounded by session length, which the
    * gap DEFINES as bounded (a session longer than memory is a
    * sessionization bug, not an operator problem); the final path count
    * partial-aggregates to |distinct paths| rows. Order inside a
    * session is made total with the tiebreak column so replays render
    * identical strings. */
  def conversionPaths(
      events: DataFrame, idCol: String, tsCol: String, tieCol: String,
      typeCol: String, gap: Long, topK: Int = 50): DataFrame = {
    require(gap > 0 && topK > 0, s"gap and topK must be positive: $gap, $topK")
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy(idCol).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("_prev", lag(col(tsCol), 1).over(byTime))
      .withColumn("_new", (col("_prev").isNull || col(tsCol) - col("_prev") > gap).cast("long"))
      .withColumn("_session", sum(col("_new")).over(byTime))
      .groupBy(col(idCol), col("_session"))
      .agg(concat_ws(">", collect_list(col(typeCol))).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topK)
  }

  /** Peak concurrency by sweep line — the "maximum simultaneous
    * sessions/beds/connections" question over an interval table
    * ([start, end) half-open): each interval contributes +1 at start,
    * −1 at end; the running sum over the merged, totally-ordered event
    * stream is the live count, its max the peak. Ends sort BEFORE
    * starts at the same instant (delta −1 < +1 in the order — half-open
    * semantics: a session ending exactly when another starts never
    * overlaps it), and an id column completes the total order so
    * replays sweep identically.
    *
    * Shape: one 2× row expansion (start/end unpivot via explode), one
    * shuffle on the group key, one incremental running-frame window,
    * then a |groups|-row aggregate (peak and its FIRST instant in one
    * max-of-struct — no second window, no join-back). For a single
    * corpus-spanning group at 100 TB, pre-aggregate the ±1s to
    * (group, time) deltas first — same answer, |distinct times| sort
    * instead of 2·|intervals|. */
  def maxConcurrent(
      intervals: DataFrame, groupCol: String, startCol: String,
      endCol: String, idCol: String): DataFrame = {
    val events = intervals.select(
      col(groupCol),
      explode(array(
        struct(col(startCol).as("t"), lit(1L).as("delta"), col(idCol).as("tie")),
        struct(col(endCol).as("t"), lit(-1L).as("delta"), col(idCol).as("tie")))).as("e"))
      .select(col(groupCol), col("e.t").as("t"), col("e.delta").as("delta"),
        col("e.tie").as("tie"))
    import org.apache.spark.sql.expressions.Window
    val sweep = Window.partitionBy(groupCol)
      .orderBy(col("t"), col("delta"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("live", sum(col("delta")).over(sweep))
      .groupBy(col(groupCol))
      // max over (live, −t): live decides, then the EARLIEST instant
      .agg(max(struct(col("live").as("live"), (-col("t")).as("negt"))).as("m"))
      .select(col(groupCol), col("m.live").as("peak"), (-col("m.negt")).as("peak_at"))
  }

  def rollingActiveUsers(
      events: DataFrame, idCol: String, dayCol: String, window: Int = 7): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val base = events.select(col(dayCol).as("day"), col(idCol).as("uid"))
    val dau = base.groupBy("day").agg(count_distinct(col("uid")).as("dau"))
    val rolling = base
      .select(explode(sequence(col("day"), col("day") + lit(window - 1))).as("day"),
        col("uid"))
      .groupBy("day").agg(count_distinct(col("uid")).as("rolling"))
    dau.join(rolling, Seq("day"))
      .select(col("day"), col("dau"), col("rolling"))
  }
}
