package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators._
import graft.streaming.{EventTimeOps, StatefulOps}

/** CDC replay, validation, interpolation, journeys, skew/scaling/growth diagnostics, privacy, unpivot.
  *
  * One gate trait of [[SparkEntry]] (round-11 split of the single-file
  * registry): the operator defs, their `queries` entries, and their
  * DuckDB oracle twins travel together; SparkEntry composes the maps. */
private[graft] trait CdcGates extends GateSupport {

  // ==================================================================
  // Round-8 family: CDC replay, validation, interpolation, journeys,
  // skew/scaling/growth diagnostics, privacy diversity, unpivot
  // ==================================================================

  /** The events table viewed as a CDC feed: `click` = delete, every
    * other type upserts the event's value; event_id is the total log
    * order. */
  protected def cdcLog(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("user_id"), col("event_id"),
      when(col("event_type") === "click", "d").otherwise("u").as("op"),
      col("value"))

  /** CDC snapshot ([[graft.operators.Cdc.applyChangeLog]]): the change
    * history collapsed to current state — newest row per user decides
    * existence and value, no per-batch loop, one keyed shuffle. */
  protected def cdcApply(s: SparkSession, dir: String): DataFrame =
    graft.operators.Cdc.applyChangeLog(cdcLog(s, dir),
        keyCols = Seq("user_id"), orderCols = Seq("event_id"), opCol = "op")
      .orderBy("user_id")

  /** CDC feed health ([[graft.operators.Cdc.churnStats]]): per-key
    * change/delete counts + liveness in ONE partial-aggregable pass
    * (newest op via max-of-struct, no window). */
  protected def cdcChurn(s: SparkSession, dir: String): DataFrame =
    graft.operators.Cdc.churnStats(cdcLog(s, dir),
        keyCols = Seq("user_id"), orderCols = Seq("event_id"), opCol = "op")
      .orderBy("user_id")

  /** Declarative batch-promotion audit ([[graft.operators.Validation]]):
    * five row rules in ONE orders/lineitem scan each, a key-uniqueness
    * rule, and an orders←lineitem referential probe — all through the
    * same (rule, n_checked, n_violations) schema. */
  protected def dataValidation(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Validation
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    val orderRules = Validation.report(o, Seq(
      Validation.Rule("orders_price_positive", col("o_totalprice") > 0.0),
      Validation.Rule("orders_date_present", col("o_orderdate").isNotNull),
      Validation.Rule("orders_status_domain",
        col("o_orderstatus").isin("O", "F", "P"))))
    val lineRules = Validation.report(li, Seq(
      Validation.Rule("lineitem_discount_band",
        col("l_discount") >= 0.0 && col("l_discount") <= 0.1),
      Validation.Rule("lineitem_qty_band",
        col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0)))
    orderRules
      .unionByName(lineRules)
      .unionByName(Validation.uniqueReport(o, "orders_key_unique", Seq("o_orderkey")))
      .unionByName(Validation.fkReport(li, "lineitem_fk_orders", "l_orderkey", o, "o_orderkey"))
      .orderBy("rule")
  }

  /** Hourly LINEAR-interpolation grid ([[graft.operators.Resample
    * .interpGrid]]) of each user's value — the continuous-signal
    * counterpart of `resample_locf`, same keyed-only exchanges; gap
    * buckets take the fixed-shape IEEE interpolation both engines
    * evaluate identically. */
  protected def resampleInterp(s: SparkSession, dir: String): DataFrame =
    graft.operators.Resample.interpGrid(
        eventsNs(s, dir).select(col("user_id"), col("ts"), col("event_id"), col("value")),
        "user_id", "ts", "value", "event_id",
        step = 3600L * 1000000000L)
      .orderBy("user_id", "bucket")

  /** Top user journeys ([[graft.operators.Behavioral.conversionPaths]]):
    * 30-minute-gap sessions rendered as ordered `>`-joined type paths,
    * counted corpus-wide, top 50. */
  protected def conversionPathsQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.conversionPaths(eventsNs(s, dir),
      "user_id", "ts", "event_id", "event_type",
      gap = 1800L * 1000000000L, topK = 50)

  /** Key-skew diagnostic ([[graft.operators.Stats.keySkewReport]]) over
    * the order⋈lineitem join key: per power-of-two bucket of rows-per-
    * key, how many keys / rows / the hottest key — the pre-join report
    * that decides salting. */
  protected def skewReport(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.keySkewReport(t(s, dir, "lineitem"), Seq("l_orderkey"))
      .orderBy("log2_bucket")

  /** Exact-moment z-score standardization ([[graft.operators.Stats
    * .standardize]]) of extended price within return flag — decimal
    * moments, one broadcast back, projection-only scaling. */
  protected def featureScaling(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.standardize(
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"),
        "l_returnflag", "l_extendedprice", scale = 2)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "z")
      .orderBy("l_orderkey", "l_linenumber")

  /** Week-over-week revenue growth ([[graft.operators.Stats
    * .periodGrowth]]): per order status, weekly revenue in exact micros
    * with integer-ppm growth vs the previous week — the lag window runs
    * on the |status|·|weeks| aggregate, never the fact rows. */
  protected def wowGrowth(s: SparkSession, dir: String): DataFrame = {
    val weekly = t(s, dir, "orders")
      .groupBy(col("o_orderstatus"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 604800000000").as("week"))
      .agg((sum(col("o_totalprice").cast("decimal(30,6)")) * 1000000L)
        .cast("long").as("rev_micros"))
    graft.operators.Stats.periodGrowth(weekly, "o_orderstatus", "week", "rev_micros")
      .orderBy("o_orderstatus", "week")
  }

  /** Additive seasonal decomposition ([[graft.operators.Stats
    * .seasonalDecompose]]) of daily event counts per type, summarized to
    * day-of-week seasonal components: n complete-window days, their raw
    * count mass, and the integer seasonal numerator Σ(7·cnt −
    * trend7_sum) — seasonal index = seas_num / (7·n_days) at render
    * time, kept unsplit here so every emitted value is engine-exact.
    * The corpus collapses to |types|×|days| before any window runs. */
  protected def seasonalDecomposeQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.seasonalDecompose(t(s, dir, "events"), "event_type", "ts")
      .filter(col("detrended7").isNotNull)
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("cnt")).as("cnt_sum"),
        sum(col("detrended7")).as("seas_num"))
      .orderBy("event_type", "dow")

  /** Theil–Sen robust daily trend per event type ([[graft.operators
    * .Stats.theilSenSlope]]): the median pairwise slope of the daily
    * count series, emitted as the exact integer fraction (Δcnt, Δdays)
    * — the outlier-proof "is this event type growing?" answer. The pair
    * expansion is quadratic in the ~|days| series, computed entirely
    * inside one projection over |types| rows. */
  protected def theilSenTrend(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.theilSenSlope(
        t(s, dir, "events")
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("x"))
          .agg(count(lit(1)).as("y")),
        "event_type", "x", "y")
      .orderBy("event_type")

  /** Exact ROC-AUC ([[graft.operators.Stats.exactAuc]]) of character
    * length as a ranker for the ≥45-word screen, per source — the
    * Mann–Whitney integer fraction (midrank ties), the threshold-free
    * quality-scorer evaluation next to `rater_agreement`'s κ. */
  protected def qualityAuc(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.exactAuc(
        t(s, dir, "documents").select(col("source"),
          length(trim(col("text"))).cast("long").as("score"),
          (size(split(trim(col("text")), "\\s+")) >= 45).as("label")),
        "source", "score", "label")
      .orderBy("source")

  /** First-occurrence novelty ([[graft.operators.TextCorpus
    * .noveltyScores]]) over the dup fixture: per doc, distinct 8-gram
    * shingles vs how many an EARLIER doc already introduced — the
    * exact-dup clones (+10000) and excerpts (+20000) score fully
    * recycled while their sources stay clean, the "keep first" policy
    * as a measurement. */
  protected def noveltyScoresQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextCorpus.noveltyScores(
        docsWithDups(s, dir), "doc_id", "text", shingleSize = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  /** Calibration bins ([[graft.operators.Stats.calibrationBins]]): the
    * length score's equi-depth deciles vs the word-screen hit rate per
    * source — (score_sum/n, n_pos/n) per bin renders the reliability
    * diagram; all-integer, ntile over a (score, doc_id) total order. */
  protected def calibrationBinsQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.calibrationBins(
        t(s, dir, "documents").select(col("source"), col("doc_id"),
          length(trim(col("text"))).cast("long").as("score"),
          (size(split(trim(col("text")), "\\s+")) >= 45).as("label")),
        "source", "score", "label", tieCols = Seq("doc_id"), bins = 10)
      .orderBy("source", "bin")

  /** Cohen's kappa ([[graft.operators.Stats.cohenKappa]]) between two
    * deterministic quality screens (length ≥ 280 chars vs ≥ 45 words)
    * per source — agreement beyond chance as the exact integer fraction
    * (n·o − Σrow·col, n² − Σrow·col); the rater-calibration statistic a
    * labeling pipeline reads before trusting either screen alone. */
  protected def raterAgreement(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.cohenKappa(
        t(s, dir, "documents").select(col("source"),
          (length(trim(col("text"))) >= 280).as("a"),
          (size(split(trim(col("text")), "\\s+")) >= 45).as("b")),
        "source", "a", "b")
      .orderBy("source")

  /** CUSUM changepoint ([[graft.operators.Stats.cusumChangepoint]]) of
    * each event type's daily count series: the interior day that
    * maximizes |n·cumsum − k·total| — integer-exact level-shift
    * localization, the O(n) screen before the quadratic robust fits. */
  protected def cusumChangepoint(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.cusumChangepoint(
        t(s, dir, "events")
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("x"))
          .agg(count(lit(1)).as("y")),
        "event_type", "x", "y")
      .orderBy("event_type")

  /** Functional-dependency audit ([[graft.operators.Validation
    * .fdAudit]]): candidate dependencies over part (all broken in this
    * corpus — the fan-out says how badly) plus the key-certifying
    * o_orderkey → o_custkey (0 violating keys proves orderkey is a
    * key for custkey). Each candidate is its own two-column pruned
    * aggregate pass; the report is |candidates| rows. */
  protected def fdAuditQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Validation.fdAudit(t(s, dir, "part"),
        Seq(("p_brand", "p_type"), ("p_type", "p_brand"), ("p_name", "p_brand")))
      .union(graft.operators.Validation.fdAudit(t(s, dir, "orders"),
        Seq(("o_orderkey", "o_custkey"))))
      .orderBy("lhs", "rhs")

  /** Order-dependency audit ([[graft.operators.Validation.orderAudit]]):
    * is ship date nondecreasing along each order's line numbers, and
    * does the event clock ever run backwards along event ids within a
    * user? Two lag-window rules reported through the uniform
    * (rule, n_checked, n_violations) contract. */
  protected def orderAuditQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Validation.orderAudit(t(s, dir, "lineitem"),
        "shipdate_by_linenumber", Seq("l_orderkey"),
        // linenumber has dup rows → the audited value breaks the tie
        Seq("l_linenumber", "l_shipdate"), "l_shipdate")
      .union(graft.operators.Validation.orderAudit(t(s, dir, "events"),
        "event_ts_by_id_per_user", Seq("user_id"), Seq("event_id"), "ts"))
      .orderBy("rule")

  /** Collocation screen ([[graft.operators.TextCorpus.collocations]]):
    * adjacent token pairs with ≥5 occurrences beating independence by
    * lift ≥ 1.30, the cross-multiplied integer PMI screen — the phrase
    * detector next to `top_ngrams`' raw frequencies. */
  protected def collocationsQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextCorpus.collocations(
        t(s, dir, "documents"), minCount = 5L, minLiftPct = 130L)
      .orderBy("w1", "w2")

  /** Per-source Gini impurity of the language mix
    * ([[graft.operators.Stats.giniImpurity]]) — the curation diversity
    * report as exact integer rationals; all values fit long at any
    * test SF, so the gate casts rather than string-renders. */
  protected def sourceLangGiniQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.giniImpurity(
        t(s, dir, "documents"), Seq("source"), "lang")
      .select(col("source"),
        col("n").cast("long").as("n"),
        col("ssq").cast("long").as("ssq"),
        col("n_categories"),
        col("gini_num").cast("long").as("gini_num"),
        col("gini_den").cast("long").as("gini_den"))
      .orderBy("source")

  /** Mann–Whitney U ([[graft.operators.Stats.mannWhitneyU]]) between
    * view and purchase event values (cents) — the nonparametric
    * two-sample location test as exact doubled-rank integers
    * (u2 = 2·U); effect size U/(n_a·n_b) at render time. */
  protected def mannWhitneyQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.mannWhitneyU(
        t(s, dir, "events")
          .withColumn("value_c", round(col("value") * 100).cast("long")),
        "event_type", "value_c", groupA = "view", groupB = "purchase")
      // gate boundary: the decimal(38,0) doubled-U values render as
      // strings (the spearman_corr discipline) — same digits on both
      // engines at any magnitude, no non-ANSI decimal→long NULL risk
      .withColumn("u2_a", col("u2_a").cast("string"))
      .withColumn("u2_b", col("u2_b").cast("string"))

  /** Spearman rank correlation ([[graft.operators.Stats.spearmanCorr]])
    * between quantity and extended price per return flag — monotone
    * association as exact integer fractions over doubled midranks,
    * ρ = rho_num/√(rho_denx·rho_deny) at render time. */
  protected def spearmanCorrQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.spearmanCorr(
        t(s, dir, "lineitem"), "l_returnflag", "l_quantity", "l_extendedprice")
      // gate boundary: the decimal(38,0) moments render as strings so the
      // hash compare sees identical digits on both engines at any
      // magnitude (HUGEINT → float64 in the driver's oracle reader,
      // decimal(38,0) → java.math.BigDecimal in its parquet reader)
      .withColumn("rho_num", col("rho_num").cast("string"))
      .withColumn("rho_denx", col("rho_denx").cast("string"))
      .withColumn("rho_deny", col("rho_deny").cast("string"))
      .orderBy("l_returnflag")

  /** Seasonality-adjusted anomaly days ([[graft.operators.Stats
    * .seasonalOutliers]]): detrended residuals ≥ 4× their (type, dow)
    * cell's MAD — Mondays judged against Monday's own spread, the
    * relative threshold that survives a 100× traffic scale-up. */
  protected def seasonalOutliersQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.seasonalOutliers(
        t(s, dir, "events"), "event_type", "ts", madMultiple = 4L)
      // epoch-day (the theil_sen convention) keeps the gate integer-only
      .select(col("event_type"),
        datediff(col("d"), lit("1970-01-01")).cast("long").as("d_epochday"),
        col("dow"), col("cnt"), col("detrended7"), col("med7"),
        col("abs_dev7"), col("mad7"))
      .orderBy("event_type", "d_epochday")

  /** t-closeness audit ([[graft.operators.Pii.tClosenessClasses]]) of
    * the same customer release l_diversity gates: EMD between each QI
    * class's balance-band distribution and the corpus's, exact-integer
    * via prefix-sum cross-multiplication, against t = 3/20 — the
    * skewness-attack screen that k-anonymity and l-diversity both
    * miss, completing the privacy triad. */
  protected def tClosenessQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pii.tClosenessClasses(
        t(s, dir, "customer")
          // same engine-safe positive band as the l_diversity gate
          .withColumn("bal_band", expr("floor(c_acctbal + 1000.0d) div 2000")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", tNum = 3L, tDen = 20L)
      // gate boundary: render the decimal(38,0) EMD numerator as a string
      // (same digits on both engines; see spearman_corr's note)
      .withColumn("emd_num", col("emd_num").cast("string"))
      .orderBy("c_nationkey", "c_mktsegment")

  /** Inclusion-dependency audit ([[graft.operators.Validation
    * .indAudit]]): two certified INDs (order custkeys ⊆ customers,
    * lineitem partkeys ⊆ parts) and one violated business containment
    * (purchasers ⊆ launch-week signups) — the FK-discovery twin of
    * `fd_audit`'s key discovery, distinct-value semantics. */
  protected def indAuditQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    graft.operators.Validation.indAudit("o_custkey_in_customer",
        t(s, dir, "orders"), "o_custkey", t(s, dir, "customer"), "c_custkey")
      .union(graft.operators.Validation.indAudit("l_partkey_in_part",
        t(s, dir, "lineitem"), "l_partkey", t(s, dir, "part"), "p_partkey"))
      .union(graft.operators.Validation.indAudit("purchaser_in_launch_signups",
        ev.filter(col("event_type") === "purchase"), "user_id",
        ev.filter(col("event_type") === "signup" &&
          col("ts") < lit("2024-01-08").cast("timestamp")), "user_id"))
      .orderBy("candidate")
  }

  /** Batch twin of the streaming funnel CEP ([[graft.streaming
    * .StatefulOps.funnelWithState]]): view → click → purchase within 7
    * days of the FIRST view, each step strictly after the previous
    * match — the same flatMapGroupsWithState function run in batch mode
    * (empty state, one invocation per user), oracled against the
    * nested min-chain SQL. StatefulStreamingSpec pins the streaming
    * replay — including in-watermark reordering — to these rows. */
  protected def funnelStateBatch(s: SparkSession, dir: String): DataFrame =
    // FOUR steps (view → click → signup → purchase): pins the N-step
    // generalization (round-10 verdict #2) — the operator takes any
    // distinct step list, like its batch twin Behavioral.funnel
    graft.streaming.StatefulOps.funnelWithState(
        graft.streaming.StatefulOps.typedEvents(t(s, dir, "events")),
        Seq("view", "click", "signup", "purchase"),
        windowMicros = 7L * 86400L * 1000000L)
      .toDF()
      .select(col("userId").as("user_id"), col("reached"),
        col("stepUs")(0).as("t1_us"), col("stepUs")(1).as("t2_us"),
        col("stepUs")(2).as("t3_us"), col("stepUs")(3).as("t4_us"),
        col("completed"))
      .orderBy("user_id")

  /** Anti-entropy bucket diff ([[graft.operators.Validation.syncDiff]]):
    * the orders table vs a deterministically-mutated replica (priority
    * rewritten on keys ≡ 3 mod 97, keys ≡ 5 mod 101 deleted) — the
    * mismatched 1/64th keyspace slices a repair pass would re-read,
    * found by moving 2×64 digest rows instead of two table scans'
    * worth of rows to one place. */
  protected def syncDigestQuery(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val mutated = orders
      .withColumn("o_orderpriority",
        when(pmod(col("o_orderkey"), lit(97)) === 3, lit("9-RESYNC"))
          .otherwise(col("o_orderpriority")))
      .filter(pmod(col("o_orderkey"), lit(101)) =!= 5)
    graft.operators.Validation.syncDiff(orders, mutated, "o_orderkey",
        Seq("o_custkey", "o_orderstatus", "o_orderpriority"), nBuckets = 64)
      .orderBy("bucket")
  }

  /** Quantile alignment ([[graft.operators.Stats.quantileAlign]]) of
    * every source's length distribution onto src0's — each source's
    * k-th of n lengths takes src0's value at the proportional rank, so
    * a single corpus-wide length threshold means the same thing in
    * every source; all-integer rank arithmetic, keyed windows only. */
  protected def quantileAlignQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.quantileAlign(
        t(s, dir, "documents").select("source", "doc_id", "n_chars"),
        "source", "n_chars", "doc_id", refSource = "src0")
      .orderBy("source", "doc_id")

  /** Sample-ratio-mismatch guardrail ([[graft.operators.Sampling
    * .srmCheck]]): the salted 50/50 user split audited per event type —
    * clean as logged, then with arm-A users at even ids dropped (the
    * differential-logging-loss failure SRM exists to catch): the exact
    * integer z² flags the biased scenario and passes the clean one. */
  protected def srmCheckQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val biased = ev.filter(!(pmod(col("user_id"), lit(2)) === 0 &&
      graft.operators.Sampling.hashBucket(col("user_id"), "exp1", 2) < 1))
    graft.operators.Sampling.srmCheck(ev, "event_type", "user_id", "exp1", 1L, 1L)
      .withColumn("scenario", lit("clean"))
      .union(graft.operators.Sampling
        .srmCheck(biased, "event_type", "user_id", "exp1", 1L, 1L)
        .withColumn("scenario", lit("lossy")))
      .orderBy("scenario", "event_type")
  }

  /** Poisson-bootstrap replicate sums ([[graft.operators.Sampling
    * .poissonBootstrapSums]]): 16 deterministic replicates of the
    * view-vs-purchase value comparison — the one-pass uncertainty
    * estimate behind an A/B readout's CI; exact integer sums per
    * (replicate, arm). */
  protected def bootstrapSumsQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.poissonBootstrapSums(
        t(s, dir, "events")
          .filter(col("event_type").isin("view", "purchase"))
          .withColumn("value_c", round(col("value") * 100).cast("long")),
        "event_type", "value_c", "event_id", b = 16, salt = "ci-v1")
      .withColumn("replicate", col("replicate").cast("long"))
      .orderBy("replicate", "grp")

  /** Linear multi-touch attribution ([[graft.operators.Behavioral
    * .linearAttribution]]): each purchase splits 1e6 ppm equally across
    * its 3-day-lookback view/click touches (remainder to the latest;
    * no-touch purchases credit `(direct)` in full) — credit conserves
    * exactly at 1e6 per conversion, the fractional counterpart of
    * `attribution_last_touch`. */
  protected def attributionLinear(s: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.linearAttribution(
        t(s, dir, "events")
          .withColumn("us", unix_micros(col("ts").cast("timestamp"))),
        "user_id", "us", "event_type", Seq("view", "click"), "purchase",
        lookbackMicros = 3L * 86400L * 1000000L)
      .orderBy("channel")

  /** Kaplan–Meier life table ([[graft.operators.Behavioral
    * .survivalTable]]) per signup-week cohort: lifetime days with
    * right-censoring (active within 3 days of the horizon = alive, not
    * churned) — the exact integer (n_risk, deaths, censored) rows the
    * survival curve renders from. */
  protected def survivalTableQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.survivalTable(
        t(s, dir, "events"), "user_id", "ts", censorDays = 3)
      .orderBy("cohort_week", "t_day")

  /** Activity streaks ([[graft.operators.Behavioral.activityStreaks]]):
    * per user, consecutive-active-day runs via the day − row_number
    * island key — active days, streak count, longest and current
    * streak, all integers over each user's |days| rows. */
  protected def activityStreaksQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.activityStreaks(t(s, dir, "events"), "user_id", "ts")
      .orderBy("user_id")

  /** Price–volume bridge ([[graft.operators.Behavioral
    * .priceVolumeBridge]]) between 1995-01 and 1995-02 per return flag:
    * Δrevenue split into volume and price effects over the common
    * denominator q0, provably summing to rev1 − rev0 — the revenue
    * waterfall as exact integers. */
  protected def mixShiftQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.priceVolumeBridge(
        t(s, dir, "lineitem")
          .withColumn("m",
            date_format(col("l_shipdate").cast("timestamp"), "yyyy-MM"))
          .withColumn("qty", col("l_quantity").cast("long"))
          .withColumn("rev_micros",
            (col("l_extendedprice").cast("decimal(30,6)") * 1000000L)
              .cast("long")),
        "l_returnflag", "m", "qty", "rev_micros", "1995-01", "1995-02")
      // gate boundary: render the decimal(38,0) bridge terms as strings
      // (same digits on both engines; see spearman_corr's note)
      .withColumn("vol_num", col("vol_num").cast("string"))
      .withColumn("price_num", col("price_num").cast("string"))
      .orderBy("l_returnflag")

  /** Distinct l-diversity audit ([[graft.operators.Pii
    * .lDiversityClasses]]) of the customer release: QI =
    * (nation, market segment), sensitive = account-balance band —
    * classes where every member shares a band fail l=3 and leak. */
  protected def lDiversity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pii.lDiversityClasses(
        t(s, dir, "customer")
          // +1000 shift keeps the band operand positive: floor/÷ agree
          // across engines only above zero (DuckDB floors negative //,
          // Spark's div truncates)
          .withColumn("bal_band", expr("floor(c_acctbal + 1000.0d) div 2000")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 3)
      .orderBy("c_nationkey", "c_mktsegment")

  /** Wide→long UNPIVOT (Spark's native `unpivot`/melt, Catalyst Expand
    * under the hood — same zero-shuffle single pass as ROLLUP): the
    * per-flag pricing rollup melted to (flag, metric, value) for
    * metric-generic downstream consumers. */
  protected def unpivotMetrics(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")

  /** Streaming-shaped anomaly monitor replayed over history
    * ([[graft.operators.Stats.runningAnomalies]]): each event judged
    * against its user's PRIOR running mean/variance, the z² test in
    * exact integer arithmetic — the batch replay that IS the
    * mapGroupsWithState monitor's semantics, gated cross-engine. */
  protected def zscoreAlerts(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.runningAnomalies(
        eventsNs(s, dir).select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("value_c")),
        "user_id", Seq("ts", "event_id"), "value_c", z = 3, minPrior = 5)
      .select("user_id", "event_id", "n_prior", "is_anomaly")
      .orderBy("user_id", "event_id")

  /** Peak concurrent sessions per day ([[graft.operators.Behavioral
    * .maxConcurrent]]): 6-hour-gap sessions swept as ±1 interval
    * endpoints ([start, end+1ns) half-open; ends before starts at a
    * tie), grouped by session START day. Raw timestamps are whole
    * microseconds, so the +1ns end never collides with a start and the
    * oracle's +1µs sweep orders identically. */
  protected def concurrencyPeak(s: SparkSession, dir: String): DataFrame = {
    val sessions = graft.streaming.EventTimeOps.sessionizeBatch(
      eventsNs(s, dir), "ts", "user_id", "value",
      gapNanos = 21600L * 1000000000L)
    val iv = sessions.select(col("user_id"),
      expr("session_start_ns div 86400000000000").as("day"),
      col("session_start_ns").as("s"),
      (col("session_end_ns") + 1L).as("e"))
    graft.operators.Behavioral.maxConcurrent(iv, "day", "s", "e", "user_id")
      .orderBy("day")
  }

  /** Clamped stock-ledger fold ([[graft.operators.Ledger
    * .clampedBalance]]): purchases/carts stock up, other events draw
    * down, balance saturating in [0, 100000] centi-units after EVERY
    * step — the non-windowable fold, oracled against a recursive CTE
    * unrolling the same recurrence. */
  protected def stockLedger(s: SparkSession, dir: String): DataFrame = {
    val log = eventsNs(s, dir).select(
      col("user_id"), col("ts"), col("event_id"),
      when(col("event_type").isin("purchase", "cart"),
          round(col("value") * 100).cast("long"))
        .otherwise(-round(col("value") * 100).cast("long")).as("delta_c"))
    graft.operators.Ledger.clampedBalance(log,
        "user_id", "ts", "event_id", "delta_c", lo = 0L, hi = 100000L)
      .select("user_id", "event_id", "delta_c", "balance")
      .orderBy("user_id", "event_id")
  }

  /** Conversion latency quantiles: per purchase, the exact-micros gap
    * since the user's most recent preceding view (the last-touch
    * window), rank-rule quantiles per conversion weekday
    * ([[graft.operators.Stats.groupedQuantiles]]). */
  protected def timeToConvert(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val gaps = eventsNs(s, dir)
      .withColumn("touch_ts",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .filter(col("event_type") === "purchase" && col("touch_ts").isNotNull)
      .select(expr("((ts div 86400000000000) + 4) % 7").as("dow"),
        expr("(ts - touch_ts) div 1000").as("latency_us"))
    graft.operators.Stats.groupedQuantiles(gaps, "dow", "latency_us",
        ps = Seq(0.5, 0.9, 0.99))
      .orderBy("dow", "p")
  }

  /** k-fold assignment audit ([[graft.operators.Sampling.cvFold]]):
    * per (fold, lang) document counts — the balance check before
    * cross-validated training; the assignment itself is a stateless
    * salted-hash projection. */
  protected def cvFolds(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("fold", graft.operators.Sampling.cvFold(col("doc_id"), "cv-1", 5))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("fold", "lang")

  /** Percent-of-total report ([[graft.operators.Stats
    * .contributionShare]]): each status's integer-ppm share of its
    * week's revenue — the window runs on the |weeks|·|statuses|
    * rollup, never the orders. */
  protected def revenueShare(s: SparkSession, dir: String): DataFrame = {
    val weekly = t(s, dir, "orders")
      .groupBy(col("o_orderstatus"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 604800000000").as("week"))
      .agg((sum(col("o_totalprice").cast("decimal(30,6)")) * 1000000L)
        .cast("long").as("rev_micros"))
    graft.operators.Stats.contributionShare(weekly, Seq("week"), "rev_micros")
      .orderBy("week", "o_orderstatus")
  }

  /** A/B experiment funnel ([[graft.operators.Sampling.hashBucket]] arm
    * assignment × [[graft.operators.Behavioral.funnel]]): the
    * view→click→purchase funnel per deterministic experiment arm — the
    * readout shape of every hash-bucketed experiment. */
  protected def abFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsNs(s, dir).withColumn("arm",
      when(graft.operators.Sampling.hashBucket(col("user_id"), "exp-1", 2) === 0, "A")
        .otherwise("B"))
    Seq("A", "B").map { a =>
      graft.operators.Behavioral.funnel(ev.filter(col("arm") === a),
          "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .withColumn("arm", lit(a))
    }.reduce(_.unionAll(_))
      .select("arm", "step", "event_type", "entities")
      .orderBy("arm", "step")
  }

  /** Recommender holdout eval ([[graft.operators.Baskets
    * .recsHoldoutEval]]): orders before 1999 train a part co-occurrence
    * recommender, orders from 1999 on score it — precision@5 /
    * recall ingredients as one exact-integer summary row; the offline
    * eval loop `item_cf_topk`'s model would ship through. */
  protected def recsHoldoutEval(s: SparkSession, dir: String): DataFrame = {
    val tx = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        (col("o_orderdate").cast("date") >= to_date(lit("1999-01-01"))).as("is_test")),
        col("l_orderkey") === col("o_orderkey"))
    graft.operators.Baskets.recsHoldoutEval(tx, "l_orderkey", "o_custkey",
      "l_partkey", "is_test", k = 5, minCo = 2L)
  }

  /** Join-view IVM ([[graft.operators.Merge.maintainJoin]]): the
    * orders⋈customer view maintained from base + delta partitions
    * (orderkey ≡ 0 mod 8 and custkey ≡ 0 mod 9 play the night's
    * inserts) via V₀ ∪ ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB, then rolled up per
    * nation — bit-equal to the full-recompute oracle, at delta-join
    * cost. */
  protected def ivmJoinDelta(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("decimal(30,6)").as("rev"))
    val c = t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
      col("c_nationkey"))
    val (a0, dA) = (o.filter(pmod(col("o_orderkey"), lit(8)) =!= 0),
      o.filter(pmod(col("o_orderkey"), lit(8)) === 0))
    val (b0, dB) = (c.filter(pmod(col("o_custkey"), lit(9)) =!= 0),
      c.filter(pmod(col("o_custkey"), lit(9)) === 0))
    graft.operators.Merge.maintainJoin(
        a0.join(b0, Seq("o_custkey")), a0, dA, b0, dB, Seq("o_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("rev")) * 1000000L).cast("long").as("rev_micros"))
      .orderBy("c_nationkey")
  }

  /** Volume-weighted median ([[graft.operators.Stats.weightedMedian]]):
    * per return flag, the extended price at which half the UNITS
    * shipped — quantity-weighted, cross-multiplied halving, ties
    * closed by (orderkey, linenumber). */
  protected def weightedMedianQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.weightedMedian(
        t(s, dir, "lineitem")
          .withColumn("qty", col("l_quantity").cast("long")),
        "l_returnflag", "l_extendedprice", "qty",
        tieCols = Seq("l_orderkey", "l_linenumber"))
      .orderBy("l_returnflag")

  /** Last-n feed batch twin ([[graft.streaming.TransformWithStateOps
    * .recentFeedWithState]]): the ListState ring's batch degeneration —
    * each user's newest 5 events, slot 0 newest; the streaming
    * incremental maintenance is pinned in TransformWithStateSpec.
    *
    * Gated on a 1-in-10 user slice: batch-mode transformWithState pays
    * the full state-store machinery to produce what a plain window
    * answers, so the PARITY gate runs on a deterministic subset
    * (hundreds of users at sf0.01 — every merge/truncate/emit path
    * still exercised) while the full-data cost lives where it means
    * something: the streaming_feed_replay bench scenario (round-9
    * verdict cost-watch — this line was the 3rd most expensive query
    * for no extra coverage). */
  protected def recentFeedBatch(s: SparkSession, dir: String): DataFrame =
    graft.streaming.TransformWithStateOps.recentFeedWithState(
        graft.streaming.StatefulOps.typedEvents(
          t(s, dir, "events").filter(col("user_id") % 10 === 0)), n = 5)
      .toDF()
      .select(col("userId").as("user_id"), col("slot"),
        expr("tsNanos div 1000").as("ts_us"), col("eventType").as("event_type"))
      .orderBy("user_id", "slot")

  /** Item-item CF ([[graft.operators.Baskets.itemCosine]]): top-100
    * part pairs by cosine over implicit basket vectors — co-occurrence
    * normalized by popularity. */
  protected def itemCfTopk(s: SparkSession, dir: String): DataFrame =
    graft.operators.Baskets.itemCosine(t(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", minSupport = 2L)
      .orderBy(col("cosine").desc, col("a"), col("b"))
      .limit(100)

  /** Revenue concentration ([[graft.operators.Stats.giniIndex]]): per
    * order status, the exact-ppm Gini of customer total spend. */
  protected def giniRevenue(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(30,6)")) * 1000000L)
        .cast("long").as("spend_micros"))
    graft.operators.Stats.giniIndex(spend, "o_orderstatus", "o_custkey", "spend_micros")
      .orderBy("o_orderstatus")
  }

  /** Calendar dimension build: one row per day across the orders date
    * span with arithmetic day-of-week/week (integer epoch-day forms —
    * no engine calendar conventions) plus calendar year/month. The
    * output IS the dimension a warehouse joins facts against. */
  protected def calendarDim(s: SparkSession, dir: String): DataFrame = {
    val span = t(s, dir, "orders")
      .agg(min(to_date(col("o_orderdate"))).as("lo"),
        max(to_date(col("o_orderdate"))).as("hi"))
    span.select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
      .select(col("d"), year(col("d")).as("y"), month(col("d")).as("m"),
        expr("(datediff(d, date'1970-01-01') + 4) % 7").as("dow"),
        expr("datediff(d, date'1970-01-01') div 7").as("week"))
      .orderBy("d")
  }

  /** Equi-depth price histogram: ntile(10) deciles of extended price
    * within each return flag (total order via the line id tiebreak),
    * per-bucket count/min/max/exact-decimal sum. Three return flags
    * partition the CORPUS, so the tiling runs distributed
    * ([[graft.operators.Stats.distributedNtile]] — parallel
    * range-partitioned rank, never a one-task per-group sort). */
  protected def priceEquidepth(s: SparkSession, dir: String): DataFrame = {
    graft.operators.Stats.distributedNtile(
        t(s, dir, "lineitem"), 10, Seq("l_returnflag"),
        Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
        "tile")
      .groupBy("l_returnflag", "tile")
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag", "tile")
  }

  /** Degree assortativity of the co-purchase graph: Pearson r over the
    * (deg(u), deg(v)) pairs of every SYMMETRIZED edge — do hubs connect
    * to hubs? Moments are exact integer sums well inside double's 2^53
    * exact range (degrees are dimension-sized), so the closed-form r is
    * one fixed IEEE expression both engines evaluate identically. */
  protected def degreeAssortativity(s: SparkSession, dir: String): DataFrame = {
    val co = graft.operators.Baskets.cooccurrence(
      t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
    val edges = co.select(col("a").as("u"), col("b").as("v"))
      .unionAll(co.select(col("b").as("u"), col("a").as("v")))
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
    val pairs = edges
      .join(deg.select(col("u"), col("deg").as("dx")), Seq("u"))
      .join(deg.select(col("u").as("u2"), col("deg").as("dy")),
        col("v") === col("u2"))
    pairs.agg(
        count(lit(1)).as("n"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("assortativity"))
  }

  /** Benford first-digit audit over order totals: leading digit taken
    * from the INTEGER centi-price's string form (double→string
    * formatting differs across engines; int→string doesn't), with
    * exact-ppm shares — the fraud/quality screen for "does this revenue
    * distribution look organic". One aggregate, nine rows. */
  protected def benfordDigits(s: SparkSession, dir: String): DataFrame = {
    val digits = t(s, dir, "orders")
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    graft.operators.Stats.contributionShare(
        digits.withColumn("part", lit(1)), Seq("part"), "n")
      .select(col("digit"), col("n"), col("share_ppm"))
      .orderBy("digit")
  }

  /** Encoding-anomaly screen: per-doc counts of classic UTF-8-as-Latin-1
    * mojibake markers (Ã, â€™-family) — the ftfy-style triage pass; a
    * literal alternation pattern, identical under Java regex and RE2. */
  protected def mojibakeFlags(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, 'Ã|â€')")).cast("long").as("n_markers"))
      .withColumn("suspect", col("n_markers") > 0L)
      .orderBy("doc_id")

  /** Sentence-shape stats: sentences by terminal-punctuation runs,
    * words by the whitespace tokenizer, and mean words-per-sentence in
    * exact ppm — the readability-adjacent numbers a corpus report
    * carries. Pure projections; one presentation sort. */
  protected def sentenceStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(expr("filter(split(text, '[.!?]+'), x -> length(trim(x)) > 0)"))
          .cast("long").as("n_sentences"),
        graft.operators.TextAnalysis.tokenCount(col("text")).as("n_words"))
      .withColumn("words_per_sentence_ppm",
        when(col("n_sentences") > 0L,
          expr("(n_words * 1000000L) div n_sentences")))
      .orderBy("doc_id")

  /** New-vs-returning decomposition: per epoch-week, active users split
    * into first-ever-week cohort entrants and returners — two
    * map-side-combined aggregations on the (user, week) distinct frame. */
  protected def newVsReturning(s: SparkSession, dir: String): DataFrame = {
    val uw = eventsNs(s, dir)
      .select(col("user_id"), expr("ts div 604800000000000").as("week"))
      .distinct()
    val first = uw.groupBy("user_id").agg(min(col("week")).as("first_week"))
    uw.join(first, Seq("user_id"))
      .groupBy("week")
      .agg(count(lit(1)).as("active"),
        sum(when(col("week") === col("first_week"), 1L).otherwise(0L)).as("new_users"))
      .withColumn("returning", col("active") - col("new_users"))
      .orderBy("week")
  }

  /** Order↔line reconciliation audit: per order, the exact-micros gap
    * between the order total and its lines' discounted revenue, banded
    * by |relative error| ppm — the warehouse closing check "do the
    * facts roll up to the header". One keyed aggregation + one keyed
    * join; the band report is |bands| rows. Sign-split integer
    * division, decimal-widened blowup. */
  protected def orderReconciliation(s: SparkSession, dir: String): DataFrame = {
    val lineRev = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(30,6)")) * 1000000L).cast("long").as("line_micros"))
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(30,6)") * 1000000L).cast("long")
          .as("total_micros"))
      .join(lineRev, Seq("o_orderkey"))
      .withColumn("abs_diff_ppm",
        expr("(cast(abs(line_micros - total_micros) as decimal(38,0)) * 1000000)" +
          " div total_micros"))
      .withColumn("band",
        when(col("abs_diff_ppm") === 0L, "exact")
          .when(col("abs_diff_ppm") <= 1000L, "within_0.1pct")
          .when(col("abs_diff_ppm") <= 100000L, "within_10pct")
          .otherwise("mismatch"))
      .groupBy("band").agg(count(lit(1)).as("n_orders"))
      .orderBy("band")
  }

  /** Bounce rate per day: 30-minute-gap sessions, share of single-event
    * sessions in exact ppm — rides the same sessionization the journey
    * and concurrency gates use. */
  protected def bounceRate(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventTimeOps.sessionizeBatch(
        eventsNs(s, dir), "ts", "user_id", "value",
        gapNanos = 1800L * 1000000000L)
      .groupBy(expr("session_start_ns div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_ppm", expr("(n_bounces * 1000000L) div n_sessions"))
      .orderBy("day")

  /** Rapid-repeat-purchase screen: a second purchase by the same user
    * within an hour of the first — the double-charge/retry-bug triage
    * query as a keyed equi-join on the user with a bounded time
    * predicate (per-user pair expansion bounded by purchases-per-hour,
    * never a range-only blowup); the amount delta rides along for
    * triage. */
  protected def doubleChargeFlags(s: SparkSession, dir: String): DataFrame = {
    val p = eventsNs(s, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), round(col("value") * 100).cast("long").as("value_c"),
        col("ts"), col("event_id"))
    val a = p.toDF("user_id", "vc_a", "ts_a", "id_a")
    val b = p.toDF("user_id", "vc_b", "ts_b", "id_b")
    a.join(b, Seq("user_id"))
      .filter(col("ts_a") < col("ts_b") &&
        col("ts_b") - col("ts_a") <= lit(3600L * 1000000000L))
      .select(col("user_id"), col("id_a"), col("id_b"),
        expr("(ts_b - ts_a) div 1000").as("gap_us"),
        (col("vc_b") - col("vc_a")).as("delta_c"))
      .orderBy("user_id", "id_a", "id_b")
  }

  protected def cdcGateQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "seasonal_decompose" -> seasonalDecomposeQuery _,
    "theil_sen_trend" -> theilSenTrend _,
    "cusum_changepoint" -> cusumChangepoint _,
    "rater_agreement" -> raterAgreement _,
    "quality_auc" -> qualityAuc _,
    "calibration_bins" -> calibrationBinsQuery _,
    "fd_audit" -> fdAuditQuery _,
    "order_audit" -> orderAuditQuery _,
    "collocations" -> collocationsQuery _,
    "spearman_corr" -> spearmanCorrQuery _,
    "mann_whitney_u" -> mannWhitneyQuery _,
    "source_lang_gini" -> sourceLangGiniQuery _,
    "seasonal_outliers" -> seasonalOutliersQuery _,
    "t_closeness" -> tClosenessQuery _,
    "ind_audit" -> indAuditQuery _,
    "funnel_state_batch" -> funnelStateBatch _,
    "sync_digest" -> syncDigestQuery _,
    "quantile_align" -> quantileAlignQuery _,
    "srm_check" -> srmCheckQuery _,
    "bootstrap_sums" -> bootstrapSumsQuery _,
    "attribution_linear" -> attributionLinear _,
    "survival_table" -> survivalTableQuery _,
    "activity_streaks" -> activityStreaksQuery _,
    "mix_shift" -> mixShiftQuery _,
    "recs_holdout_eval" -> recsHoldoutEval _,
    "ivm_join_delta" -> ivmJoinDelta _,
    "weighted_median" -> weightedMedianQuery _,
    "recent_feed_batch" -> recentFeedBatch _,
    "novelty_scores" -> noveltyScoresQuery _,
    "cdc_apply" -> cdcApply _,
    "cdc_churn" -> cdcChurn _,
    "data_validation" -> dataValidation _,
    "resample_interp" -> resampleInterp _,
    "conversion_paths" -> conversionPathsQuery _,
    "skew_report" -> skewReport _,
    "feature_scaling" -> featureScaling _,
    "wow_growth" -> wowGrowth _,
    "l_diversity" -> lDiversity _,
    "unpivot_metrics" -> unpivotMetrics _,
    "zscore_alerts" -> zscoreAlerts _,
    "concurrency_peak" -> concurrencyPeak _,
    "stock_ledger" -> stockLedger _,
    "time_to_convert" -> timeToConvert _,
    "cv_folds" -> cvFolds _,
    "revenue_share" -> revenueShare _,
    "ab_funnel" -> abFunnel _,
    "item_cf_topk" -> itemCfTopk _,
    "gini_revenue" -> giniRevenue _,
    "calendar_dim" -> calendarDim _,
    "price_equidepth" -> priceEquidepth _,
    "degree_assortativity" -> degreeAssortativity _,
    "benford_digits" -> benfordDigits _,
    "mojibake_flags" -> mojibakeFlags _,
    "sentence_stats" -> sentenceStats _,
    "new_vs_returning" -> newVsReturning _,
    "order_reconciliation" -> orderReconciliation _,
    "bounce_rate" -> bounceRate _,
    "double_charge_flags" -> doubleChargeFlags _,
  )

  protected def cdcGateOracles: Map[String, String] = Map(
    "seasonal_decompose" ->
      // integer-exact decomposition: trend kept as the 7-day SUM,
      // detrended as 7·cnt − trend7 (no division anywhere); dow is
      // epoch-day mod 7 (0 = Thursday), not a locale dow function; a day
      // counts only when its centered window is complete (7 rows over
      // exactly 6 calendar days)
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                               count(*) AS cnt
                        FROM events GROUP BY 1, 2),
              w AS (SELECT event_type, d, cnt,
                      sum(cnt) OVER win AS t7,
                      count(*) OVER win AS w_n,
                      max(d) OVER win - min(d) OVER win AS w_span
                    FROM daily
                    WINDOW win AS (PARTITION BY event_type ORDER BY d
                                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
         SELECT event_type,
                CAST((d - DATE '1970-01-01') % 7 AS BIGINT) AS dow,
                CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(cnt) AS BIGINT) AS cnt_sum,
                CAST(sum(cnt * 7 - t7) AS BIGINT) AS seas_num
         FROM w WHERE w_n = 7 AND w_span = 6
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "theil_sen_trend" ->
      // median of all pairwise slopes as an exact integer fraction;
      // lower-median rank (m+1)//2 under (value, num, den) order — the
      // double division is a safe comparator here (distinct rationals
      // with den ≤ series length differ by ≥ 1/den², far above ulp)
      """WITH daily AS (SELECT event_type,
                CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
                CAST(count(*) AS BIGINT) AS y
              FROM events GROUP BY event_type, CAST(ts AS DATE)),
          npts AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
                   FROM daily GROUP BY 1),
          pairs AS (SELECT a.event_type, b.y - a.y AS num, b.x - a.x AS den
                    FROM daily a JOIN daily b
                      ON a.event_type = b.event_type AND b.x > a.x),
          ranked AS (SELECT event_type, num, den,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY num::DOUBLE / den::DOUBLE, num, den) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS m
                FROM pairs)
         SELECT r.event_type, n.n_points, CAST(r.m AS BIGINT) AS n_slopes,
                CAST(r.num AS BIGINT) AS slope_num,
                CAST(r.den AS BIGINT) AS slope_den
         FROM ranked r JOIN npts n USING (event_type)
         WHERE r.rn = (r.m + 1) // 2
         ORDER BY r.event_type""",
    "cusum_changepoint" ->
      // integer-exact CUSUM: S_k = n·cumsum_k − k·total (no mean
      // division); interior k only (S_n ≡ 0); ties break to earliest k
      """WITH daily AS (SELECT event_type,
                CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
                CAST(count(*) AS BIGINT) AS y
              FROM events GROUP BY event_type, CAST(ts AS DATE)),
          t AS (SELECT event_type, CAST(sum(y) AS BIGINT) AS t_total,
                       CAST(count(*) AS BIGINT) AS n_points
                FROM daily GROUP BY 1),
          c AS (SELECT event_type, x,
                  CAST(sum(y) OVER (PARTITION BY event_type ORDER BY x) AS BIGINT) AS cum,
                  CAST(row_number() OVER (PARTITION BY event_type ORDER BY x) AS BIGINT) AS k
                FROM daily),
          s AS (SELECT c.event_type, t.n_points, t.t_total, c.k, c.x,
                  t.n_points * c.cum - c.k * t.t_total AS s_k
                FROM c JOIN t USING (event_type)
                WHERE c.k < t.n_points)
         SELECT event_type, n_points, t_total, k AS split_k, x AS split_x,
                CAST(s_k AS BIGINT) AS cusum_num
         FROM s
         QUALIFY row_number() OVER (PARTITION BY event_type
           ORDER BY abs(s_k) DESC, k ASC) = 1
         ORDER BY event_type""",
    "rater_agreement" ->
      // exact-integer Cohen's kappa: κ = kappa_num/kappa_den with
      // num = n·o − Σ_k row_k·col_k, den = n² − Σ_k row_k·col_k
      """WITH r AS (SELECT source,
                (length(trim(text)) >= 280) AS a,
                (len(string_split_regex(trim(text), '\s+')) >= 45) AS b
              FROM documents),
          cells AS (SELECT source, a, b, CAST(count(*) AS BIGINT) AS c
                    FROM r GROUP BY 1, 2, 3),
          t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS o
                FROM cells GROUP BY 1),
          rm AS (SELECT source, a AS l, CAST(sum(c) AS BIGINT) AS row_k
                 FROM cells GROUP BY 1, 2),
          cm AS (SELECT source, b AS l, CAST(sum(c) AS BIGINT) AS col_k
                 FROM cells GROUP BY 1, 2),
          x AS (SELECT rm.source, CAST(sum(row_k * col_k) AS BIGINT) AS rc
                FROM rm JOIN cm ON rm.source = cm.source AND rm.l = cm.l
                GROUP BY 1)
         SELECT t.source, t.n, t.o,
                CAST(t.n * t.o - coalesce(x.rc, 0) AS BIGINT) AS kappa_num,
                CAST(t.n * t.n - coalesce(x.rc, 0) AS BIGINT) AS kappa_den
         FROM t LEFT JOIN x ON t.source = x.source
         ORDER BY t.source""",
    "quality_auc" ->
      // Mann–Whitney AUC with doubled midranks: 2·midrank = 2·rank_min
      // + ties − 1; num = Σ_pos(2·midrank) − P(P+1), den = 2·P·N
      """WITH r AS (SELECT source,
                CAST(length(trim(text)) AS BIGINT) AS s,
                (len(string_split_regex(trim(text), '\s+')) >= 45) AS pos
              FROM documents),
          w AS (SELECT source, pos,
                  CAST(rank() OVER (PARTITION BY source ORDER BY s) AS BIGINT) AS rnk,
                  CAST(count(*) OVER (PARTITION BY source, s) AS BIGINT) AS ties
                FROM r)
         SELECT source,
                CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
                CAST(sum(CASE WHEN pos THEN rnk * 2 + ties - 1 ELSE 0 END)
                  - sum(CASE WHEN pos THEN 1 ELSE 0 END)
                    * (sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1) AS BIGINT) AS auc_num,
                CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END)
                  * sum(CASE WHEN pos THEN 0 ELSE 1 END) * 2 AS BIGINT) AS auc_den
         FROM w GROUP BY source ORDER BY source""",
    "calibration_bins" ->
      // equi-depth deciles over the (score, doc_id) total order — the
      // ntile-parity convention price_equidepth established
      """WITH r AS (SELECT source, doc_id,
                CAST(length(trim(text)) AS BIGINT) AS score,
                (len(string_split_regex(trim(text), '\s+')) >= 45) AS label
              FROM documents),
          b AS (SELECT source, score, label,
                  CAST(ntile(10) OVER (PARTITION BY source
                    ORDER BY score, doc_id) AS BIGINT) AS bin
                FROM r)
         SELECT source, bin, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                CAST(sum(score) AS BIGINT) AS score_sum
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    "fd_audit" ->
      // per-candidate two-level aggregate; keys unify through VARCHAR so
      // one UNION ALL covers string and integer candidates alike
      """WITH cand AS (
           SELECT 'p_brand' AS lhs, 'p_type' AS rhs,
                  CAST(p_brand AS VARCHAR) AS k, CAST(p_type AS VARCHAR) AS v FROM part
           UNION ALL SELECT 'p_type', 'p_brand',
                  CAST(p_type AS VARCHAR), CAST(p_brand AS VARCHAR) FROM part
           UNION ALL SELECT 'p_name', 'p_brand',
                  CAST(p_name AS VARCHAR), CAST(p_brand AS VARCHAR) FROM part
           UNION ALL SELECT 'o_orderkey', 'o_custkey',
                  CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR) FROM orders),
          g AS (SELECT lhs, rhs, k, count(DISTINCT v) AS d, count(*) AS n
                FROM cand GROUP BY 1, 2, 3)
         SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
                CAST(max(d) AS BIGINT) AS max_fanout,
                CAST(sum(n) AS BIGINT) AS n_rows
         FROM g GROUP BY 1, 2 ORDER BY 1, 2""",
    "order_audit" ->
      // lag-window sortedness rules; a NULL comparison is vacuous (not a
      // violation), n_checked counts rows with a predecessor
      """WITH a AS (SELECT l_shipdate AS v,
                  lag(l_shipdate) OVER (PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_shipdate) AS p
                FROM lineitem),
          b AS (SELECT ts AS v,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS p
                FROM events)
         SELECT * FROM (
           SELECT 'shipdate_by_linenumber' AS rule,
                  CAST(count(*) AS BIGINT) AS n_checked,
                  CAST(sum(CASE WHEN v < p THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
           FROM a WHERE p IS NOT NULL
           UNION ALL
           SELECT 'event_ts_by_id_per_user',
                  CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN v < p THEN 1 ELSE 0 END) AS BIGINT)
           FROM b WHERE p IS NOT NULL)
         ORDER BY rule""",
    "collocations" ->
      // adjacent-pair PMI screen, cross-multiplied in HUGEINT: keep when
      // 100·pair_n·total ≥ 130·left_n·right_n (lift ≥ 1.30) and pair_n ≥ 5
      """WITH toks AS (SELECT string_split_regex(trim(lower(text)), '\s+') AS ts
                       FROM documents),
          pairs AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM (
            SELECT unnest([struct_pack(w1 := ts[i], w2 := ts[i+1])
                           FOR i IN range(1, len(ts))]) AS p
            FROM toks)),
          pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n
                 FROM pairs GROUP BY 1, 2),
          lm AS (SELECT w1, CAST(sum(pair_n) AS BIGINT) AS left_n FROM pc GROUP BY 1),
          rm AS (SELECT w2, CAST(sum(pair_n) AS BIGINT) AS right_n FROM pc GROUP BY 1),
          tot AS (SELECT CAST(sum(pair_n) AS BIGINT) AS total_pairs FROM pc)
         SELECT w1, w2, pair_n, left_n, right_n, total_pairs
         FROM pc JOIN lm USING (w1) JOIN rm USING (w2), tot
         WHERE pair_n >= 5
           AND CAST(pair_n AS HUGEINT) * total_pairs * 100
               >= 130 * CAST(left_n AS HUGEINT) * right_n
         ORDER BY w1, w2""",
    "spearman_corr" ->
      // Pearson moments of doubled midranks (2·midrank = 2·rank_min +
      // ties − 1), accumulated in HUGEINT = Spark's decimal(38,0);
      // ρ = rho_num/√(rho_denx·rho_deny) at render time
      """WITH r AS (SELECT l_returnflag AS g, l_quantity AS x,
                l_extendedprice AS y FROM lineitem),
          u AS (SELECT g,
                  CAST(rank() OVER (PARTITION BY g ORDER BY x) AS HUGEINT) * 2
                    + CAST(count(*) OVER (PARTITION BY g, x) AS HUGEINT) - 1 AS u,
                  CAST(rank() OVER (PARTITION BY g ORDER BY y) AS HUGEINT) * 2
                    + CAST(count(*) OVER (PARTITION BY g, y) AS HUGEINT) - 1 AS v
                FROM r)
         SELECT g AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
                CAST(count(*) * sum(u*v) - sum(u) * sum(v) AS VARCHAR) AS rho_num,
                CAST(count(*) * sum(u*u) - sum(u) * sum(u) AS VARCHAR) AS rho_denx,
                CAST(count(*) * sum(v*v) - sum(v) * sum(v) AS VARCHAR) AS rho_deny
         FROM u GROUP BY g ORDER BY g""",
    "source_lang_gini" ->
      // Gini impurity as exact rationals: num = n^2 - sum(c^2), den = n^2
      """WITH c AS (SELECT source, lang, count(*) AS c
                    FROM documents GROUP BY 1, 2)
         SELECT source,
                CAST(sum(c) AS BIGINT) AS n,
                CAST(sum(c * c) AS BIGINT) AS ssq,
                CAST(count(*) AS BIGINT) AS n_categories,
                CAST(sum(c) * sum(c) - sum(c * c) AS BIGINT) AS gini_num,
                CAST(sum(c) * sum(c) AS BIGINT) AS gini_den
         FROM c GROUP BY 1 ORDER BY 1""",
    "mann_whitney_u" ->
      // count-by-value collapses ties BEFORE ranking; doubled midrank of
      // a tie run at v = 2*(strictly below) + (run size) + 1;
      // u2 = 2*U = R2 - n*(n+1); invariant u2_a + u2_b = 2*n_a*n_b
      """WITH e AS (SELECT event_type AS grp,
                      CAST(round(value * 100) AS BIGINT) AS v
                    FROM events WHERE event_type IN ('view', 'purchase')),
          c AS (SELECT v,
                  CAST(sum(CASE WHEN grp = 'view' THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
                  CAST(sum(CASE WHEN grp = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS cb
                FROM e GROUP BY v),
          w AS (SELECT v, ca, cb,
                  coalesce(sum(ca + cb) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
                FROM c)
         SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
                CAST(sum(ca * (below * 2 + ca + cb + 1))
                     - sum(ca) * (sum(ca) + 1) AS VARCHAR) AS u2_a,
                CAST(sum(cb * (below * 2 + ca + cb + 1))
                     - sum(cb) * (sum(cb) + 1) AS VARCHAR) AS u2_b
         FROM w""",
    "seasonal_outliers" ->
      // seasonal_decompose's CTE + per-(type, dow) lower medians: flag
      // |det7 − med7| ≥ 4·MAD, MAD > 0; epoch-day output (theil_sen
      // convention) keeps the gate integer-only
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS cnt
                        FROM events GROUP BY 1, 2),
          w AS (SELECT event_type, d, cnt,
                  sum(cnt) OVER win AS t7,
                  count(*) OVER win AS w_n,
                  max(d) OVER win - min(d) OVER win AS w_span
                FROM daily
                WINDOW win AS (PARTITION BY event_type ORDER BY d
                               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
          det AS (SELECT event_type, d,
                    CAST((d - DATE '1970-01-01') % 7 AS BIGINT) AS dow,
                    CAST(cnt AS BIGINT) AS cnt,
                    CAST(cnt * 7 - t7 AS BIGINT) AS det7
                  FROM w WHERE w_n = 7 AND w_span = 6),
          med AS (SELECT event_type, dow, det7 AS med7 FROM
                    (SELECT event_type, dow, det7,
                       row_number() OVER (PARTITION BY event_type, dow
                         ORDER BY det7) AS rn,
                       count(*) OVER (PARTITION BY event_type, dow) AS n
                     FROM det)
                  WHERE rn = (n + 1) // 2),
          dev AS (SELECT det.*, med7, abs(det7 - med7) AS ad
                  FROM det JOIN med USING (event_type, dow)),
          mad AS (SELECT event_type, dow, ad AS mad7 FROM
                    (SELECT event_type, dow, ad,
                       row_number() OVER (PARTITION BY event_type, dow
                         ORDER BY ad) AS rn,
                       count(*) OVER (PARTITION BY event_type, dow) AS n
                     FROM dev)
                  WHERE rn = (n + 1) // 2)
         SELECT event_type,
                CAST(d - DATE '1970-01-01' AS BIGINT) AS d_epochday,
                dow, cnt, det7 AS detrended7, med7,
                ad AS abs_dev7, mad7
         FROM dev JOIN mad USING (event_type, dow)
         WHERE mad7 > 0 AND ad >= 4 * mad7
         ORDER BY event_type, d_epochday""",
    "t_closeness" ->
      // ordered-EMD via prefix sums, exact-integer: emd_num =
      // Σ|n_total·cpref − n_class·gpref|; close ⇔ emd·20 ≤ 3·n_class·
      // n_total·(m−1); dense grid so missing cells still carry distance
      """WITH rel AS (SELECT c_nationkey, c_mktsegment,
                CAST(floor(c_acctbal + 1000.0) AS BIGINT) // 2000 AS v
              FROM customer),
          cells AS (SELECT c_nationkey, c_mktsegment, v, count(*) AS c
                    FROM rel GROUP BY 1, 2, 3),
          g AS (SELECT v, count(*) AS gg FROM rel GROUP BY 1),
          go AS (SELECT v, CAST(sum(gg) OVER (ORDER BY v) AS BIGINT) AS gpref,
                   CAST(sum(gg) OVER () AS BIGINT) AS n_total,
                   CAST(count(*) OVER () AS BIGINT) AS m
                 FROM g),
          cls AS (SELECT c_nationkey, c_mktsegment,
                    CAST(count(*) AS BIGINT) AS class_size
                  FROM rel GROUP BY 1, 2),
          grid AS (SELECT cls.*, go.* FROM cls CROSS JOIN go),
          j AS (SELECT grid.*, coalesce(cells.c, 0) AS c
                FROM grid LEFT JOIN cells USING (c_nationkey, c_mktsegment, v)),
          p AS (SELECT *, sum(c) OVER (PARTITION BY c_nationkey, c_mktsegment
                  ORDER BY v) AS cpref FROM j)
         SELECT c_nationkey, c_mktsegment, class_size, m, n_total,
                CAST(sum(abs(CAST(n_total AS HUGEINT) * cpref
                        - CAST(class_size AS HUGEINT) * gpref)) AS VARCHAR) AS emd_num,
                (sum(abs(CAST(n_total AS HUGEINT) * cpref
                         - CAST(class_size AS HUGEINT) * gpref)) * 20
                 <= 3 * CAST(class_size AS HUGEINT) * n_total * (m - 1)) AS close
         FROM p GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2""",
    "ind_audit" ->
      // distinct-value containment per candidate; 0 missing certifies
      """WITH oc AS (SELECT count(*) AS n_values,
                count(CASE WHEN c.v IS NULL THEN 1 END) AS n_missing_values
              FROM (SELECT DISTINCT o_custkey AS v FROM orders) x
              LEFT JOIN (SELECT DISTINCT c_custkey AS v FROM customer) c USING (v)),
          lp AS (SELECT count(*) AS n_values,
                count(CASE WHEN p.v IS NULL THEN 1 END) AS n_missing_values
              FROM (SELECT DISTINCT l_partkey AS v FROM lineitem) x
              LEFT JOIN (SELECT DISTINCT p_partkey AS v FROM part) p USING (v)),
          ps AS (SELECT count(*) AS n_values,
                count(CASE WHEN s.v IS NULL THEN 1 END) AS n_missing_values
              FROM (SELECT DISTINCT user_id AS v FROM events
                    WHERE event_type = 'purchase') x
              LEFT JOIN (SELECT DISTINCT user_id AS v FROM events
                         WHERE event_type = 'signup'
                           AND ts < TIMESTAMP '2024-01-08') s USING (v))
         SELECT * FROM (
           SELECT 'l_partkey_in_part' AS candidate,
                  CAST(n_values AS BIGINT) AS n_values,
                  CAST(n_missing_values AS BIGINT) AS n_missing_values FROM lp
           UNION ALL
           SELECT 'o_custkey_in_customer', CAST(n_values AS BIGINT),
                  CAST(n_missing_values AS BIGINT) FROM oc
           UNION ALL
           SELECT 'purchaser_in_launch_signups', CAST(n_values AS BIGINT),
                  CAST(n_missing_values AS BIGINT) FROM ps)
         ORDER BY candidate""",
    "recent_feed_batch" ->
      // last-5 per user, slot 0 newest; (ts desc, type desc) mirrors
      // the processor's ascending merge + reverse emission; same
      // 1-in-10 user slice as the Spark side (parity on a subset, the
      // full-data cost belongs to streaming_feed_replay)
      """WITH r AS (SELECT user_id, epoch_us(ts) AS us, event_type,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY ts DESC, event_type DESC) AS rn
              FROM events WHERE user_id % 10 = 0)
         SELECT user_id, CAST(rn - 1 AS BIGINT) AS slot,
                CAST(us AS BIGINT) AS ts_us, event_type
         FROM r WHERE rn <= 5 ORDER BY user_id, slot""",
    "weighted_median" ->
      // first row where 2·cumulative-quantity ≥ total, ties closed by
      // (orderkey, linenumber) for a total order
      """WITH r AS (SELECT l_returnflag, l_extendedprice,
                CAST(l_quantity AS BIGINT) AS qty,
                CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
                  PARTITION BY l_returnflag
                  ORDER BY l_extendedprice, l_orderkey, l_linenumber
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
                CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
                  PARTITION BY l_returnflag) AS BIGINT) AS totw,
                l_orderkey, l_linenumber
              FROM lineitem)
         SELECT l_returnflag, l_extendedprice AS w_median,
                cumw AS cum_weight, totw AS total_weight
         FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
               FROM r WHERE cumw * 2 >= totw)
         WHERE rn = 1 ORDER BY l_returnflag""",
    "ivm_join_delta" ->
      // the oracle is the FULL RECOMPUTE the maintenance identity must
      // equal: plain orders⋈customer rolled up per nation
      """SELECT c_nationkey,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) * 1000000
                  AS BIGINT) AS rev_micros
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "recs_holdout_eval" ->
      // time-split CF eval: train co-occurrence (distinct basket-item,
      // a<b pairs, minCo 2), directed scores summed per user, top-5
      // minus owned, hits vs the test side — one exact summary row
      """WITH tx AS (SELECT l.l_orderkey AS basket, o.o_custkey AS u,
                l.l_partkey AS i,
                (CAST(o.o_orderdate AS DATE) >= DATE '1999-01-01') AS is_test
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
          bi AS (SELECT DISTINCT basket, i FROM tx WHERE NOT is_test),
          co AS (SELECT x.i AS a, y.i AS b, CAST(count(*) AS BIGINT) AS n
                 FROM bi x JOIN bi y ON x.basket = y.basket AND x.i < y.i
                 GROUP BY 1, 2 HAVING count(*) >= 2),
          dir AS (SELECT a AS f, b AS t, n FROM co
                  UNION ALL SELECT b, a, n FROM co),
          tui AS (SELECT DISTINCT u, i FROM tx WHERE NOT is_test),
          sc AS (SELECT tui.u, dir.t, CAST(sum(n) AS BIGINT) AS score
                 FROM tui JOIN dir ON tui.i = dir.f
                 GROUP BY 1, 2),
          cand AS (SELECT sc.* FROM sc ANTI JOIN tui
                     ON sc.u = tui.u AND sc.t = tui.i),
          recs AS (SELECT u, t FROM (SELECT u, t, row_number() OVER (
                     PARTITION BY u ORDER BY score DESC, t ASC) AS rn
                   FROM cand) WHERE rn <= 5),
          tei AS (SELECT DISTINCT u, i AS t FROM tx WHERE is_test),
          hits AS (SELECT recs.* FROM recs SEMI JOIN tei
                     ON recs.u = tei.u AND recs.t = tei.t)
         SELECT (SELECT CAST(count(DISTINCT u) AS BIGINT) FROM recs)
                  AS n_users_recommended,
                (SELECT CAST(count(*) AS BIGINT) FROM recs) AS total_recs,
                (SELECT CAST(count(*) AS BIGINT) FROM hits) AS total_hits,
                (SELECT CAST(count(DISTINCT u) AS BIGINT) FROM tei)
                  AS n_test_users,
                (SELECT CAST(count(*) AS BIGINT) FROM tei) AS total_test_pairs""",
    "activity_streaks" ->
      // gaps-and-islands: day − row_number collapses consecutive days
      // to one island key; current streak = the run at the last day
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                       FROM events),
          e AS (SELECT user_id,
                  CAST(d - DATE '1970-01-01' AS BIGINT) AS ep,
                  CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY d) AS BIGINT) AS rn
                FROM days),
          isl AS (SELECT user_id, ep - rn AS island,
                    CAST(count(*) AS BIGINT) AS len,
                    CAST(max(ep) AS BIGINT) AS last
                  FROM e GROUP BY 1, 2),
          agg AS (SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
                    CAST(count(*) AS BIGINT) AS n_streaks,
                    CAST(max(len) AS BIGINT) AS longest_streak,
                    CAST(max(last) AS BIGINT) AS last_active_epochday
                  FROM isl GROUP BY 1),
          cur AS (SELECT user_id, len AS current_streak FROM
                    (SELECT user_id, len, row_number() OVER (
                       PARTITION BY user_id ORDER BY last DESC) AS rn
                     FROM isl)
                  WHERE rn = 1)
         SELECT user_id, n_active_days, n_streaks, longest_streak,
                current_streak, last_active_epochday
         FROM agg JOIN cur USING (user_id) ORDER BY user_id""",
    "mix_shift" ->
      // price-volume bridge over common denominator q0:
      // (vol_num + price_num)/q0 = rev1 − rev0 exactly
      """WITH l AS (SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS m,
                CAST(l_quantity AS BIGINT) AS qty,
                CAST(CAST(l_extendedprice AS DECIMAL(30,6)) * 1000000 AS BIGINT) AS rev
              FROM lineitem
              WHERE strftime(l_shipdate, '%Y-%m') IN ('1995-01', '1995-02')),
          g AS (SELECT l_returnflag,
                  CAST(sum(CASE WHEN m = '1995-01' THEN qty ELSE 0 END) AS BIGINT) AS q0,
                  CAST(sum(CASE WHEN m = '1995-01' THEN rev ELSE 0 END) AS BIGINT) AS rev0,
                  CAST(sum(CASE WHEN m = '1995-02' THEN qty ELSE 0 END) AS BIGINT) AS q1,
                  CAST(sum(CASE WHEN m = '1995-02' THEN rev ELSE 0 END) AS BIGINT) AS rev1
                FROM l GROUP BY 1)
         SELECT l_returnflag, q0, q1, rev0, rev1,
                CAST(CAST(q1 - q0 AS HUGEINT) * rev0 AS VARCHAR) AS vol_num,
                CAST(CAST(rev1 AS HUGEINT) * q0
                     - CAST(q1 AS HUGEINT) * rev0 AS VARCHAR) AS price_num,
                q0 AS den
         FROM g ORDER BY l_returnflag""",
    "attribution_linear" ->
      // equal-split ppm credits, remainder to the latest touch; credit
      // conserves at exactly 1e6 per conversion incl. the (direct) bucket
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
          c AS (SELECT user_id, us AS conv_ts FROM e
                WHERE event_type = 'purchase'),
          tch AS (SELECT user_id, us AS touch_ts, event_type AS channel
                  FROM e WHERE event_type IN ('view', 'click')),
          p AS (SELECT c.user_id, conv_ts, touch_ts, channel
                FROM c JOIN tch USING (user_id)
                WHERE touch_ts < conv_ts
                  AND touch_ts >= conv_ts - 259200000000),
          r AS (SELECT *, count(*) OVER w AS k,
                  row_number() OVER (PARTITION BY user_id, conv_ts
                    ORDER BY touch_ts DESC, channel) AS rn
                FROM p WINDOW w AS (PARTITION BY user_id, conv_ts)),
          cr AS (SELECT channel,
                  CAST(count(*) AS BIGINT) AS n_touches,
                  CAST(count(DISTINCT (user_id, conv_ts)) AS BIGINT) AS n_conversions,
                  CAST(sum(1000000 // k + CASE WHEN rn = 1
                      THEN 1000000 - (1000000 // k) * k ELSE 0 END) AS BIGINT)
                    AS credit_ppm
                 FROM r GROUP BY 1),
          d AS (SELECT '(direct)' AS channel, CAST(0 AS BIGINT) AS n_touches,
                  CAST(count(*) AS BIGINT) AS n_conversions,
                  CAST(count(*) * 1000000 AS BIGINT) AS credit_ppm
                FROM c ANTI JOIN (SELECT DISTINCT user_id, conv_ts FROM p)
                  USING (user_id, conv_ts)
                HAVING count(*) > 0)
         SELECT * FROM (SELECT * FROM cr UNION ALL SELECT * FROM d)
         ORDER BY channel""",
    "survival_table" ->
      // life-table integers: lifetime days, right-censored within 3
      // days of the horizon; n_risk = suffix sum over lifetimes
      """WITH hz AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
          u AS (SELECT user_id, min(CAST(ts AS DATE)) AS f,
                  max(CAST(ts AS DATE)) AS l
                FROM events GROUP BY 1),
          s AS (SELECT (f - DATE '1970-01-01') // 7 AS cohort_week,
                  l - f AS t_day, (h - l) < 3 AS censored
                FROM u, hz),
          g AS (SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
                  CAST(t_day AS BIGINT) AS t_day,
                  CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
                    AS n_deaths,
                  CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_censored
                FROM s GROUP BY 1, 2)
         SELECT cohort_week, t_day,
                CAST(sum(n_deaths + n_censored) OVER (PARTITION BY cohort_week
                  ORDER BY t_day DESC) AS BIGINT) AS n_risk,
                n_deaths, n_censored
         FROM g ORDER BY 1, 2""",
    "quantile_align" ->
      // proportional-rank mapping onto src0's distribution; integer
      // floor-div on ranks, aligned value is an actual src0 element
      """WITH r AS (SELECT source, doc_id, n_chars,
                CAST(row_number() OVER (PARTITION BY source
                  ORDER BY n_chars, doc_id) AS BIGINT) AS rr,
                CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
              FROM documents),
          ref AS (SELECT rr AS pos, n_chars AS aligned FROM r
                  WHERE source = 'src0'),
          nr AS (SELECT CAST(count(*) AS BIGINT) AS n_ref FROM r
                 WHERE source = 'src0')
         SELECT source, doc_id, n_chars, aligned
         FROM (SELECT source, doc_id, n_chars,
                 (rr - 1) * n_ref // n + 1 AS pos FROM r, nr)
         JOIN ref USING (pos)
         ORDER BY source, doc_id""",
    "bootstrap_sums" ->
      // same salted-md5 arithmetic as Sampling.hashBucket, one draw per
      // (replicate, event): u = md5('ci-v1#r:id')[0:8] % 1e6, weight by
      // the exact integer Poisson(1) inverse-CDF ladder
      """WITH e AS (SELECT event_type AS grp,
                      CAST(round(value * 100) AS BIGINT) AS v,
                      event_id AS id
                    FROM events WHERE event_type IN ('view', 'purchase')),
              r AS (SELECT unnest(range(16)) AS replicate),
              u AS (SELECT e.grp, e.v, r.replicate,
                      ('0x' || substr(md5('ci-v1#' || CAST(r.replicate AS VARCHAR)
                        || ':' || CAST(e.id AS VARCHAR)), 1, 8))::BIGINT
                        % 1000000 AS u
                    FROM e CROSS JOIN r),
              w AS (SELECT grp, v, replicate,
                      CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
                           WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
                           WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
                           WHEN u < 999916 THEN 6 WHEN u < 999989 THEN 7
                           WHEN u < 999998 THEN 8 WHEN u < 999999 THEN 9
                           ELSE 10 END AS w
                    FROM u)
         SELECT replicate, grp, count(*) AS n_rows,
                CAST(sum(w) AS BIGINT) AS w_sum,
                CAST(sum(w * v) AS BIGINT) AS wv_sum
         FROM w GROUP BY 1, 2 ORDER BY 1, 2""",
    "srm_check" ->
      // exact-integer z² SRM: dev = n_a·(wA+wB) − n·wA flags when
      // dev² > z²·n·wA·wB; arm = salted-md5 bucket, units deduped
      """WITH u AS (SELECT DISTINCT event_type,
                (('0x' || substr(md5('exp1:' || user_id::VARCHAR), 1, 8))::BIGINT
                 % 2) < 1 AS in_a,
                user_id
              FROM events),
          agg AS (SELECT 'clean' AS scenario, event_type,
                CAST(count(*) AS BIGINT) AS n_units,
                CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
              FROM u GROUP BY 2
              UNION ALL
              SELECT 'lossy', event_type,
                CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT),
                CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT)
              FROM u WHERE NOT (user_id % 2 = 0 AND in_a) GROUP BY 2)
         SELECT event_type, n_units, n_a, n_b,
                CAST(n_a * 2 - n_units AS BIGINT) AS dev,
                (CAST(n_a * 2 - n_units AS HUGEINT)
                 * (n_a * 2 - n_units) > 9 * CAST(n_units AS HUGEINT)) AS srm,
                scenario
         FROM agg ORDER BY scenario, event_type""",
    "sync_digest" ->
      // 48-bit md5-prefix row hashes summed per key-mod-64 bucket
      // (commutative — order-free); emit only mismatched buckets
      """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                o_orderpriority FROM orders),
          mut AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 97 = 3 THEN '9-RESYNC'
                     ELSE o_orderpriority END AS o_orderpriority
              FROM base WHERE o_orderkey % 101 <> 5),
          da AS (SELECT o_orderkey % 64 AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows_a,
                CAST(sum(('0x' || substr(md5(
                    o_orderkey::VARCHAR || chr(1)
                    || coalesce(o_custkey::VARCHAR, chr(0)) || chr(1)
                    || coalesce(o_orderstatus, chr(0)) || chr(1)
                    || coalesce(o_orderpriority, chr(0))),
                  1, 12))::BIGINT) AS BIGINT) AS digest_a
              FROM base GROUP BY 1),
          db AS (SELECT o_orderkey % 64 AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows_b,
                CAST(sum(('0x' || substr(md5(
                    o_orderkey::VARCHAR || chr(1)
                    || coalesce(o_custkey::VARCHAR, chr(0)) || chr(1)
                    || coalesce(o_orderstatus, chr(0)) || chr(1)
                    || coalesce(o_orderpriority, chr(0))),
                  1, 12))::BIGINT) AS BIGINT) AS digest_b
              FROM mut GROUP BY 1)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                coalesce(n_rows_a, 0) AS n_rows_a,
                coalesce(n_rows_b, 0) AS n_rows_b,
                coalesce(digest_a, 0) AS digest_a,
                coalesce(digest_b, 0) AS digest_b
         FROM da FULL JOIN db USING (bucket)
         WHERE coalesce(n_rows_a, 0) <> coalesce(n_rows_b, 0)
            OR coalesce(digest_a, 0) <> coalesce(digest_b, 0)
         ORDER BY bucket""",
    "funnel_state_batch" ->
      // first-touch 4-step funnel min-chain: t1 = min view; t2 = min
      // click in (t1, t1+7d]; t3 = min signup in (t2, t1+7d]; t4 = min
      // purchase in (t3, t1+7d]; strict > between steps, the window
      // anchored at the FIRST view
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type
                    FROM events
                    WHERE event_type IN ('view', 'click', 'signup', 'purchase')),
          s1 AS (SELECT user_id, min(us) AS t1 FROM e
                 WHERE event_type = 'view' GROUP BY 1),
          s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
                 WHERE event_type = 'click' AND us > t1
                   AND us <= t1 + 604800000000 GROUP BY 1),
          s3 AS (SELECT e.user_id, min(us) AS t3
                 FROM e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
                 WHERE event_type = 'signup' AND us > t2
                   AND us <= t1 + 604800000000 GROUP BY 1),
          s4 AS (SELECT e.user_id, min(us) AS t4
                 FROM e JOIN s3 USING (user_id) JOIN s1 USING (user_id)
                 WHERE event_type = 'purchase' AND us > t3
                   AND us <= t1 + 604800000000 GROUP BY 1)
         SELECT s1.user_id,
                CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
                       + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END
                       + CASE WHEN t4 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS reached,
                t1 AS t1_us, coalesce(t2, -1) AS t2_us, coalesce(t3, -1) AS t3_us,
                coalesce(t4, -1) AS t4_us,
                (t4 IS NOT NULL) AS completed
         FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
              LEFT JOIN s4 USING (user_id)
         ORDER BY 1""",
    "novelty_scores" ->
      // first-occurrence attribution: a shingle counts against every
      // doc EXCEPT the smallest-id one that introduced it
      s"""WITH docs AS (SELECT doc_id, trim(text) AS text FROM $docsWithDupsSql dd),
          sh AS (SELECT doc_id,
                   unnest(list_distinct([substr(text, i, 8) FOR i IN range(1, greatest(length(text)-7, 1)+1)])) AS tok
                 FROM docs),
          f AS (SELECT tok, min(doc_id) AS first_id FROM sh GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                CAST(sum(CASE WHEN first_id < doc_id THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_recycled
         FROM sh JOIN f USING (tok)
         GROUP BY 1 ORDER BY doc_id""",
    "cdc_apply" ->
      // Cdc.applyChangeLog: newest log row per key decides existence
      // (delete ⇒ absent) and carries the final values
      """WITH log AS (
           SELECT user_id, event_id,
                  CASE WHEN event_type = 'click' THEN 'd' ELSE 'u' END AS op,
                  value
           FROM events),
              latest AS (
           SELECT *, row_number() OVER (
             PARTITION BY user_id ORDER BY event_id DESC) AS rn
           FROM log)
         SELECT user_id, event_id, value
         FROM latest WHERE rn = 1 AND op <> 'd' ORDER BY user_id""",
    "cdc_churn" ->
      // Cdc.churnStats: single-pass per-key change/delete counts +
      // liveness (newest op via arg_max on the total log order)
      """SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_changes,
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_deletes,
                arg_max(CASE WHEN event_type = 'click' THEN 'd' ELSE 'u' END,
                        event_id) <> 'd' AS exists
         FROM events GROUP BY user_id ORDER BY user_id""",
    "data_validation" ->
      // Validation.report / uniqueReport / fkReport: one aggregate per
      // rule family, all through (rule, n_checked, n_violations)
      """SELECT * FROM (
           SELECT 'orders_price_positive' AS rule,
                  CAST(count(*) AS BIGINT) AS n_checked,
                  CAST(sum(CASE WHEN coalesce(o_totalprice > 0.0, FALSE)
                                THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
           FROM orders
           UNION ALL
           SELECT 'orders_date_present', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'orders_status_domain', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'lineitem_discount_band', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.1
                                THEN 0 ELSE 1 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'lineitem_qty_band', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN l_quantity >= 1.0 AND l_quantity <= 50.0
                                THEN 0 ELSE 1 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'orders_key_unique', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1)
           UNION ALL
           SELECT 'lineitem_fk_orders',
                  (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
                  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
                   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
         ) ORDER BY rule""",
    "resample_interp" ->
      // Resample.interpGrid: the locf grid construction, gaps filled by
      // the SAME fixed-shape IEEE interpolation expression
      """WITH obs AS (
           SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
                  epoch_us(ts) AS us, event_id, value
           FROM events),
              lastb AS (
           SELECT user_id, bucket, value FROM (
             SELECT *, row_number() OVER (
               PARTITION BY user_id, bucket
               ORDER BY us DESC, event_id DESC) AS rn
             FROM obs) WHERE rn = 1),
              grid AS (
           SELECT user_id, unnest(generate_series(lo, hi)) AS bucket
           FROM (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
                 FROM obs GROUP BY user_id)),
              j AS (
           SELECT g.user_id, g.bucket, l.value
           FROM grid g LEFT JOIN lastb l
             ON g.user_id = l.user_id AND g.bucket = l.bucket),
              f AS (
           SELECT user_id, bucket, value,
             last_value(CASE WHEN value IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
             last_value(value IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             first_value(CASE WHEN value IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb,
             first_value(value IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
           FROM j)
         SELECT user_id, bucket,
                CASE WHEN value IS NOT NULL THEN value
                     ELSE pv + (nv - pv) *
                          (CAST(bucket - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
                END AS value
         FROM f ORDER BY user_id, bucket""",
    "conversion_paths" ->
      // Behavioral.conversionPaths: gap sessionization (lag + cumulative
      // starts), ordered string_agg per session, global path counts.
      // Gap compares micros (Spark side: nanos = micros·1000, identical)
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
              s AS (
           SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                          THEN 1 ELSE 0 END AS new_s
           FROM (SELECT *, lag(us) OVER (
                   PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e)),
              sess AS (
           SELECT *, sum(new_s) OVER (
             PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           FROM s),
              paths AS (
           SELECT user_id, session_seq,
                  string_agg(event_type, '>' ORDER BY us, event_id) AS path
           FROM sess GROUP BY user_id, session_seq)
         SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         FROM paths GROUP BY path
         ORDER BY n_sessions DESC, path LIMIT 50""",
    "skew_report" ->
      // Stats.keySkewReport: per-key counts → power-of-two buckets via
      // binary-string length (floor(log2) exactly, both engines)
      """WITH pk AS (
           SELECT l_orderkey, count(*) AS n_rows FROM lineitem GROUP BY 1)
         SELECT CAST(length(bin(n_rows)) - 1 AS BIGINT) AS log2_bucket,
                CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(n_rows) AS BIGINT) AS total_rows,
                CAST(max(n_rows) AS BIGINT) AS max_key_rows
         FROM pk GROUP BY 1 ORDER BY log2_bucket""",
    "feature_scaling" ->
      // Stats.standardize: exact decimal moments (18,2 — products stay
      // inside both engines' 38-digit decimals), one fixed-shape IEEE
      // finishing expression
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
                  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS s1,
                  sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(l_extendedprice AS DECIMAL(18,2))) AS s2
           FROM lineitem GROUP BY 1),
              mm AS (
           SELECT l_returnflag,
                  CAST(s1 AS DOUBLE) / n AS mean,
                  greatest((CAST(s2 AS DOUBLE) -
                            CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n,
                           0.0) AS var
           FROM m)
         SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
                CASE WHEN mm.var > 0.0
                     THEN (CAST(l.l_extendedprice AS DOUBLE) - mm.mean) / sqrt(mm.var)
                     ELSE 0.0 END AS z
         FROM lineitem l JOIN mm ON l.l_returnflag = mm.l_returnflag
         ORDER BY l.l_orderkey, l.l_linenumber""",
    "wow_growth" ->
      // Stats.periodGrowth: weekly micros revenue, integer-ppm growth;
      // the sign split keeps the ÷ positive so floor (DuckDB) and
      // truncate (Spark) agree
      """WITH weekly AS (
           SELECT o_orderstatus,
                  epoch_us(o_orderdate) // 604800000000 AS week,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) * 1000000 AS BIGINT)
                    AS rev_micros
           FROM orders GROUP BY 1, 2),
              g AS (
           SELECT *, lag(rev_micros) OVER (
             PARTITION BY o_orderstatus ORDER BY week) AS prev_micros
           FROM weekly)
         SELECT o_orderstatus, week, rev_micros, prev_micros,
                CASE WHEN prev_micros IS NOT NULL AND prev_micros > 0
                     THEN CAST(CASE WHEN rev_micros >= prev_micros THEN 1
                                    WHEN rev_micros < prev_micros THEN -1 END AS BIGINT) *
                          CAST((CAST(abs(rev_micros - prev_micros) AS HUGEINT)
                                * 1000000) // prev_micros AS BIGINT)
                END AS growth_ppm
         FROM g ORDER BY o_orderstatus, week""",
    "l_diversity" ->
      // Pii.lDiversityClasses: per-QI-class size + distinct sensitive
      // bands; +1000 shift keeps the band arithmetic positive
      """SELECT c_nationkey, c_mktsegment,
                CAST(count(*) AS BIGINT) AS class_size,
                CAST(count(DISTINCT bal_band) AS BIGINT) AS n_sensitive,
                count(DISTINCT bal_band) >= 3 AS diverse
         FROM (SELECT c_nationkey, c_mktsegment,
                      CAST(floor(c_acctbal + 1000.0) AS BIGINT) // 2000 AS bal_band
               FROM customer)
         GROUP BY 1, 2 ORDER BY c_nationkey, c_mktsegment""",
    "unpivot_metrics" ->
      // Spark's native unpivot (Expand) melted rollup = UNION ALL
      """WITH a AS (
           SELECT l_returnflag,
                  CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
                  CAST(sum(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc
           FROM lineitem GROUP BY 1)
         SELECT * FROM (
           SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
           UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
           UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
         ) ORDER BY l_returnflag, metric""",
    "zscore_alerts" ->
      // Stats.runningAnomalies: prior-only running sums, z² test in
      // exact int128 — (n·v − s1)² > 9·(n·s2 − s1²)
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS us, event_id,
                  CAST(round(value * 100) AS BIGINT) AS vc
           FROM events),
              w AS (
           SELECT user_id, event_id, vc,
                  count(*) OVER win AS n_prior,
                  sum(CAST(vc AS HUGEINT)) OVER win AS s1,
                  sum(CAST(vc AS HUGEINT) * CAST(vc AS HUGEINT)) OVER win AS s2
           FROM e
           WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT user_id, event_id, CAST(n_prior AS BIGINT) AS n_prior,
                CASE WHEN n_prior >= 5 THEN
                  (CAST(n_prior AS HUGEINT) * vc - s1) *
                  (CAST(n_prior AS HUGEINT) * vc - s1)
                    > 9 * (CAST(n_prior AS HUGEINT) * s2 - s1 * s1)
                ELSE FALSE END AS is_anomaly
         FROM w ORDER BY user_id, event_id""",
    "concurrency_peak" ->
      // Behavioral.maxConcurrent: 6h-gap sessions → ±1 sweep per start
      // day; ends (+1µs, never colliding with whole-µs starts) sort
      // before starts at a tie, matching the Spark side's +1ns
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
              m AS (
           SELECT user_id, us,
                  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                            > 21600000000 THEN 1
                       WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL THEN 1
                       ELSE 0 END AS new_s
           FROM e),
              s AS (
           SELECT user_id, us,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid
           FROM m),
              iv AS (
           SELECT user_id, min(us) AS st, max(us) + 1 AS en
           FROM s GROUP BY user_id, sid),
              ev AS (
           SELECT st // 86400000000 AS day, st AS t, 1 AS delta, user_id FROM iv
           UNION ALL
           SELECT st // 86400000000 AS day, en AS t, -1 AS delta, user_id FROM iv),
              sw AS (
           SELECT day, t, delta,
                  sum(delta) OVER (PARTITION BY day ORDER BY t, delta, user_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
           FROM ev),
              p AS (SELECT day, max(live) AS peak FROM sw GROUP BY day)
         SELECT p.day, CAST(p.peak AS BIGINT) AS peak,
                CAST(min(sw.t) * 1000 AS BIGINT) AS peak_at
         FROM sw JOIN p ON sw.day = p.day AND sw.live = p.peak
         GROUP BY p.day, p.peak ORDER BY p.day""",
    "stock_ledger" ->
      // Ledger.clampedBalance: the clamp-after-every-step recurrence has
      // no window form — unroll it as a recursive CTE walking each
      // key's rows in rank order
      """WITH RECURSIVE e AS (
           SELECT user_id, event_id,
                  CASE WHEN event_type IN ('purchase', 'cart')
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE -CAST(round(value * 100) AS BIGINT) END AS delta_c,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS rn
           FROM events),
              r AS (
           SELECT user_id, event_id, delta_c, rn,
                  least(100000, greatest(0, delta_c)) AS balance
           FROM e WHERE rn = 1
           UNION ALL
           SELECT e.user_id, e.event_id, e.delta_c, e.rn,
                  least(100000, greatest(0, r.balance + e.delta_c))
           FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
         SELECT user_id, event_id, delta_c, balance
         FROM r ORDER BY user_id, event_id""",
    "time_to_convert" ->
      // last-view-to-purchase latency in exact micros, rank-rule
      // quantiles per conversion weekday (epoch day 0 = Thursday → +4)
      """WITH t AS (
           SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
                  max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS touch_us
           FROM events),
              v AS (
           SELECT ((us // 86400000000) + 4) % 7 AS dow,
                  us - touch_us AS latency_us
           FROM t WHERE event_type = 'purchase' AND touch_us IS NOT NULL),
              ranked AS (
           SELECT dow, latency_us,
                  CAST(row_number() OVER (PARTITION BY dow
                    ORDER BY latency_us) AS BIGINT) AS rn
           FROM v),
              counts AS (
           SELECT dow, CAST(count(*) AS BIGINT) AS n_rows FROM v GROUP BY dow),
              targets AS (
           SELECT dow, n_rows, p.p AS p,
                  CAST(floor(p.p * (n_rows - 1)) + 1 AS BIGINT) AS rn
           FROM counts,
             (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                             CAST(0.99 AS DOUBLE)]) AS p) p)
         SELECT r.dow, t.p, t.n_rows, r.latency_us AS value
         FROM ranked r JOIN targets t ON r.dow = t.dow AND r.rn = t.rn
         ORDER BY r.dow, t.p""",
    "cv_folds" ->
      // Sampling.cvFold = hashBucket(id, salt, 5): same md5 arithmetic
      """SELECT ('0x' || substr(md5('cv-1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 5 AS fold,
                lang, CAST(count(*) AS BIGINT) AS n
         FROM documents GROUP BY 1, 2 ORDER BY fold, lang""",
    "revenue_share" ->
      // Stats.contributionShare: ppm of the week's total, exact int128
      """WITH weekly AS (
           SELECT o_orderstatus,
                  epoch_us(o_orderdate) // 604800000000 AS week,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) * 1000000 AS BIGINT)
                    AS rev_micros
           FROM orders GROUP BY 1, 2)
         SELECT o_orderstatus, week, rev_micros,
                CAST(sum(rev_micros) OVER (PARTITION BY week) AS BIGINT) AS part_total,
                CAST((CAST(rev_micros AS HUGEINT) * 1000000)
                     // sum(rev_micros) OVER (PARTITION BY week) AS BIGINT) AS share_ppm
         FROM weekly ORDER BY week, o_orderstatus""",
    "ab_funnel" ->
      // hashBucket arm split × the funnel_steps chain, per arm
      """WITH e AS (
           SELECT user_id, event_type, epoch_us(ts) AS us,
                  CASE WHEN ('0x' || substr(md5('exp-1:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                            % 2 = 0 THEN 'A' ELSE 'B' END AS arm
           FROM events),
              f1 AS (SELECT arm, user_id, min(us) AS t FROM e
                     WHERE event_type = 'view' GROUP BY arm, user_id),
              f2 AS (SELECT e.arm, e.user_id, min(us) AS t FROM e
                     JOIN f1 ON e.user_id = f1.user_id AND e.arm = f1.arm
                     WHERE event_type = 'click' AND us > f1.t GROUP BY e.arm, e.user_id),
              f3 AS (SELECT e.arm, e.user_id, min(us) AS t FROM e
                     JOIN f2 ON e.user_id = f2.user_id AND e.arm = f2.arm
                     WHERE event_type = 'purchase' AND us > f2.t GROUP BY e.arm, e.user_id)
         SELECT * FROM (
           SELECT arm, 1 AS step, 'view' AS event_type,
                  CAST(count(*) AS BIGINT) AS entities FROM f1 GROUP BY arm
           UNION ALL SELECT arm, 2, 'click', CAST(count(*) AS BIGINT) FROM f2 GROUP BY arm
           UNION ALL SELECT arm, 3, 'purchase', CAST(count(*) AS BIGINT) FROM f3 GROUP BY arm)
         ORDER BY arm, step""",
    "item_cf_topk" ->
      // Baskets.itemCosine: co-occurrence / sqrt(popularity product),
      // one fixed IEEE expression over exact integer counts
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
              pairs AS (
           SELECT a.l_partkey AS a, b.l_partkey AS b,
                  CAST(count(*) AS BIGINT) AS n_baskets
           FROM items a JOIN items b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
              deg AS (
           SELECT l_partkey, CAST(count(*) AS BIGINT) AS deg
           FROM items GROUP BY 1)
         SELECT p.a, p.b, p.n_baskets, da.deg AS deg_a, db.deg AS deg_b,
                CAST(p.n_baskets AS DOUBLE)
                  / sqrt(CAST(da.deg * db.deg AS DOUBLE)) AS cosine
         FROM pairs p
         JOIN deg da ON p.a = da.l_partkey
         JOIN deg db ON p.b = db.l_partkey
         ORDER BY cosine DESC, a, b LIMIT 100""",
    "gini_revenue" ->
      // Stats.giniIndex rank formula in exact int128; numerator of an
      // ascending sequence is non-negative, so // = div
      """WITH spend AS (
           SELECT o_orderstatus, o_custkey,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) * 1000000 AS BIGINT)
                    AS spend_micros
           FROM orders GROUP BY 1, 2),
              r AS (
           SELECT o_orderstatus, spend_micros,
                  CAST(row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY spend_micros, o_custkey) AS HUGEINT) AS rk
           FROM spend)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                CAST(((2 * sum(rk * CAST(spend_micros AS HUGEINT))
                       - (count(*) + 1) * sum(CAST(spend_micros AS HUGEINT))) * 1000000)
                     // (count(*) * sum(CAST(spend_micros AS HUGEINT))) AS BIGINT)
                  AS gini_ppm
         FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "calendar_dim" ->
      // arithmetic dow/week from epoch days (no calendar conventions);
      // year/month are proleptic-Gregorian in both engines
      """WITH span AS (
           SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                  max(CAST(o_orderdate AS DATE)) AS hi
           FROM orders),
              days AS (
           SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
           FROM span)
         SELECT d, CAST(year(d) AS INT) AS y, CAST(month(d) AS INT) AS m,
                CAST(((d - DATE '1970-01-01') + 4) % 7 AS INT) AS dow,
                CAST((d - DATE '1970-01-01') // 7 AS BIGINT) AS week
         FROM days ORDER BY d""",
    "price_equidepth" ->
      // ntile semantics agree (larger buckets first); the tiebreak
      // makes the tiling a total order
      """WITH t AS (
           SELECT l_returnflag, l_extendedprice,
                  CAST(ntile(10) OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT)
                    AS tile
           FROM lineitem)
         SELECT l_returnflag, tile, CAST(count(*) AS BIGINT) AS n,
                min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
         FROM t GROUP BY 1, 2 ORDER BY l_returnflag, tile""",
    "degree_assortativity" ->
      // exact int64 moments (CAST each sum down from DuckDB's HUGEINT
      // before the closed form — int64→double conversion agrees across
      // engines; hugeint→double does not beyond 2^53)
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
              co AS (
           SELECT a.l_partkey AS a, b.l_partkey AS b
           FROM items a JOIN items b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
              edges AS (
           SELECT a AS u, b AS v FROM co UNION ALL SELECT b, a FROM co),
              deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
                      FROM edges GROUP BY u),
              p AS (
           SELECT dx.deg AS dx, dy.deg AS dy
           FROM edges e JOIN deg dx ON e.u = dx.u JOIN deg dy ON e.v = dy.u),
              m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
                  CAST(sum(dx * dx) AS BIGINT) AS sxx,
                  CAST(sum(dy * dy) AS BIGINT) AS syy,
                  CAST(sum(dx * dy) AS BIGINT) AS sxy
           FROM p)
         SELECT n, CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS assortativity
         FROM m""",
    "benford_digits" ->
      // leading digit from the INTEGER centi-price's string form
      """WITH d AS (
           SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                   AS VARCHAR), 1, 1) AS INT) AS digit
           FROM orders),
              c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1)
         SELECT digit, n,
                CAST((CAST(n AS HUGEINT) * 1000000) // sum(n) OVER () AS BIGINT)
                  AS share_ppm
         FROM c ORDER BY digit""",
    "mojibake_flags" ->
      // literal alternation — identical under Java regex and RE2
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, 'Ã|â€')) AS BIGINT) AS n_markers,
                len(regexp_extract_all(text, 'Ã|â€')) > 0 AS suspect
         FROM documents ORDER BY doc_id""",
    "sentence_stats" ->
      // sentences = non-blank splits on terminal-punctuation runs;
      // words = the whitespace tokenizer (text_token_counts formula)
      """WITH s AS (
           SELECT doc_id,
                  CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                       x -> length(trim(x)) > 0)) AS BIGINT)
                    AS n_sentences,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                    AS n_words
           FROM documents)
         SELECT doc_id, n_sentences, n_words,
                CASE WHEN n_sentences > 0
                     THEN (n_words * 1000000) // n_sentences END
                  AS words_per_sentence_ppm
         FROM s ORDER BY doc_id""",
    "new_vs_returning" ->
      """WITH uw AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
           FROM events),
              f AS (SELECT user_id, min(week) AS first_week FROM uw GROUP BY 1)
         SELECT uw.week, CAST(count(*) AS BIGINT) AS active,
                CAST(sum(CASE WHEN uw.week = f.first_week THEN 1 ELSE 0 END) AS BIGINT)
                  AS new_users,
                CAST(count(*) - sum(CASE WHEN uw.week = f.first_week THEN 1 ELSE 0 END)
                     AS BIGINT) AS returning
         FROM uw JOIN f ON uw.user_id = f.user_id
         GROUP BY uw.week ORDER BY uw.week""",
    "order_reconciliation" ->
      // header vs line rollup in exact micros, |relative error| bands
      """WITH lr AS (
           SELECT l_orderkey AS o_orderkey,
                  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                AS DECIMAL(30,6))) * 1000000 AS BIGINT)
                    AS line_micros
           FROM lineitem GROUP BY 1),
              j AS (
           SELECT o.o_orderkey,
                  CAST(CAST(o_totalprice AS DECIMAL(30,6)) * 1000000 AS BIGINT)
                    AS total_micros,
                  lr.line_micros
           FROM orders o JOIN lr ON o.o_orderkey = lr.o_orderkey),
              d AS (
           SELECT (CAST(abs(line_micros - total_micros) AS HUGEINT) * 1000000)
                    // total_micros AS abs_diff_ppm
           FROM j)
         SELECT CASE WHEN abs_diff_ppm = 0 THEN 'exact'
                     WHEN abs_diff_ppm <= 1000 THEN 'within_0.1pct'
                     WHEN abs_diff_ppm <= 100000 THEN 'within_10pct'
                     ELSE 'mismatch' END AS band,
                CAST(count(*) AS BIGINT) AS n_orders
         FROM d GROUP BY 1 ORDER BY band""",
    "bounce_rate" ->
      // 30-min-gap sessions, single-event share in exact ppm
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
              m AS (
           SELECT user_id, us,
                  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                            > 1800000000 THEN 1
                       WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL THEN 1
                       ELSE 0 END AS new_s
           FROM e),
              s AS (
           SELECT user_id, us,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY us) AS sid
           FROM m),
              sess AS (
           SELECT user_id, sid, min(us) AS start_us, count(*) AS n_events
           FROM s GROUP BY 1, 2)
         SELECT start_us // 86400000000 AS day,
                CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_bounces,
                CAST((sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000)
                     // count(*) AS BIGINT) AS bounce_ppm
         FROM sess GROUP BY 1 ORDER BY day""",
    "double_charge_flags" ->
      // same user, a second purchase within the hour — keyed equi-join
      """WITH p AS (
           SELECT user_id, CAST(round(value * 100) AS BIGINT) AS value_c,
                  epoch_us(ts) AS us, event_id
           FROM events WHERE event_type = 'purchase')
         SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
                b.us - a.us AS gap_us,
                b.value_c - a.value_c AS delta_c
         FROM p a JOIN p b
           ON a.user_id = b.user_id
          AND a.us < b.us AND b.us - a.us <= 3600000000
         ORDER BY a.user_id, id_a, id_b""",
  )
}
