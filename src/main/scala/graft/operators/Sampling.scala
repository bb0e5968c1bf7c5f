package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: train/val/test
  * splits and per-stratum quota sampling that are (a) reproducible
  * across runs and engines — the hash is md5 over the row's own id, so
  * any engine computes the same assignment — and (b) fully distributed:
  * split assignment is a stateless projection (codegen'd, no shuffle);
  * stratified sampling is one shuffle on the stratum key.
  *
  * Random `sample()`/`rand()` would be none of that: not reproducible
  * across engines, not stable under repartitioning, and un-oracle-able.
  * Salted md5 keeps assignments independent across salts (changing the
  * salt redraws every split) while each salt's assignment is a pure
  * function of the id — the standard trick for holdout splits that must
  * never leak when the corpus is re-sharded or appended to.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the salted md5 of `id` — the
    * first 8 hex chars as an integer. Stateless and codegen'd; identical
    * in any engine with md5 (DuckDB: `('0x' || substr(md5(..),1,8))::BIGINT`). */
  def hashBucket(id: Column, salt: String, buckets: Int = 100): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Split label ("train" / "val" / "test") for an id, with the given
    * percentages (test takes the remainder). A projection — no shuffle,
    * no state; appending new rows never reassigns existing ids. */
  def deterministicSplit(
      id: Column, salt: String,
      trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct + valPct <= 100, "train + val must leave room for test")
    val b = hashBucket(id, salt)
    when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test")
  }

  /** Keep approximately `fraction` of rows, deterministically: true iff
    * the id's salted hash falls below `round(fraction * 1e6)` of the
    * fixed bucket space — ROUNDED, not truncated, so a fraction like 0.3
    * (binary 0.29999…) keeps exactly the 300000 buckets an oracle's
    * integer threshold keeps. Stateless (no shuffle) and stable under
    * re-sharding, unlike `df.sample`. */
  /** k-fold cross-validation assignment: fold = salted-hash bucket in
    * [0, folds) — the same stateless projection contract as
    * [[deterministicSplit]] (no shuffle, stable under re-sharding and
    * appends, leakage-free by construction: an id maps to exactly one
    * fold forever). Train/test for fold i = (fold ≠ i, fold = i). */
  def cvFold(id: Column, salt: String, folds: Int): Column = {
    require(folds >= 2, s"folds must be >= 2: $folds")
    hashBucket(id, salt, folds)
  }

  def sampleFraction(id: Column, salt: String, fraction: Double): Column = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    hashBucket(id, salt, SampleSpace) < math.round(fraction * SampleSpace)
  }

  /** Sample-ratio-mismatch guardrail for hash-split experiments — the
    * first dashboard every A/B platform checks before trusting a
    * readout: per group, count the DISTINCT units the salted hash
    * assigned to each arm and test the observed split against the
    * intended `wA:wB` with an exact-integer z² (the
    * `runningAnomalies` trick — no sqrt, no float):
    *
    *   dev = n_a·(wA+wB) − n·wA,   srm ⇔ dev² > z²·n·wA·wB
    *
    * (Var(n_a)·(wA+wB)² = n·wA·wB under the intended binomial.) A true
    * `srm` flag means the assignment, logging, or filtering is biased
    * and every downstream metric is suspect. dev² runs in
    * decimal(38,0): it reaches n², past int64 at ~3 G units.
    *
    * Shape: the unit dedup is the one data-sized aggregate — distinct
    * (group, unit) pairs, map-side combined; arm counting and the test
    * run on the |groups| frame. The assignment itself is the stateless
    * salted-md5 projection every split operator here shares. */
  def srmCheck(
      df: DataFrame, groupCol: String, idCol: String, salt: String,
      wA: Long, wB: Long, z: Int = 3): DataFrame = {
    require(wA >= 1 && wB >= 1 && z >= 1)
    val arms = (wA + wB).toInt
    val d = "decimal(38,0)"
    val units = df.select(col(groupCol),
        (hashBucket(col(idCol), salt, arms) < wA).as("in_a"), col(idCol))
      .distinct()
    units.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"),
        sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("n_b"))
      .withColumn("dev", col("n_a") * (wA + wB) - col("n_units") * wA)
      .withColumn("srm",
        col("dev").cast(d) * col("dev") >
          lit(z.toLong * z).cast(d) * col("n_units") * wA * wB)
  }

  /** Weighted mixture downsampling: each row survives with its source's
    * keep fraction — how a training mix reweights corpora (e.g. keep 100%
    * of books, 10% of crawl). A pure filter projection: no shuffle, no
    * counting pass, deterministic per id, so re-running or appending data
    * never changes earlier decisions. Sources absent from `weights` are
    * dropped (weight 0). */
  /** Temperature-scaled mixture weights at α = 1/2 — the standard
    * corpus-rebalancing move for heterogeneous sources (multilingual
    * sampling, Conneau & Lample 2019: draw source s with probability
    * ∝ n_s^α, α < 1, so small sources are upsampled relative to their
    * share without ever dominating). α is PINNED to 1/2 because that
    * is the exponent with an exact integer evaluation: the weight is
    * the integer square root of n_s·10¹² (= ⌊10⁶·√n_s⌋, fixed-point
    * ×10⁶ via BigInteger.sqrt — no float pow, so both engines produce
    * identical digits at any count; other α need transcendental pow
    * and would hash-differ in the last ulp). Output per source:
    * `n_docs`, `w_fp` (10⁶-scaled √n), and `share_ppm`
    * (w·10⁶ div Σw — the sampling probability in ppm, floor division).
    *
    * 100 TB shape: ONE map-side-combined count per source; the
    * |sources| frame (a data-card-sized list by construction) comes to
    * the driver for the exact BigInteger sqrt — the bounded-frame
    * collect pattern of the k-means centroids — and returns as a
    * literal frame for joins downstream ([[mixturePlan]] accepts
    * `w_fp` as its integral weight column). */
  def temperatureWeights(
      df: DataFrame, sourceCol: String): DataFrame = {
    val spark = df.sparkSession
    // NULL sources are dropped BEFORE the groupBy (the weightedMixture
    // drop semantics): a null group key would otherwise NPE the driver's
    // .toString below instead of yielding a diagnosable result
    val counts = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .collect() // bounded: |sources| rows
      .map(r => (r.get(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val scaled = counts.map { case (s, n) =>
      val w = java.math.BigInteger.valueOf(n)
        .multiply(java.math.BigInteger.TEN.pow(12)).sqrt()
      (s, n, w.longValueExact())
    }
    val total = scaled.map(t => BigInt(t._3)).sum
    import spark.implicits._
    // share in exact BigInt floor division (a decimal divide would
    // ROUND at result scale and could disagree with the oracle's //)
    scaled.toSeq
      .map { case (s, n, w) => (s, n, w, (BigInt(w) * 1000000 / total).toLong) }
      .toDF("source", "n_docs", "w_fp", "share_ppm")
  }

  /** Poisson-bootstrap replicate sums (Chamandy et al. 2012,
    * "Estimating uncertainty for massive data streams" — the bootstrap
    * that works in one pass at scale: per replicate, each row enters
    * with an independent Poisson(1) multiplicity instead of a global
    * size-n resample, so there is no corpus shuffle and no fixed-n
    * coordination; for large n the two bootstraps agree). The
    * multiplicity is DETERMINISTIC: the salted md5 of
    * `salt#replicate:id` maps to a uniform u in [0, 10⁶) and an exact
    * integer inverse-CDF ladder of Poisson(1) (thresholds =
    * ⌊10⁶·CDF(k)⌋ — both engines compute identical digits), so
    * re-running never changes a draw and appended rows never reshuffle
    * old draws (the [[sampleFraction]] contract).
    *
    * Output: per (replicate, group) the exact integer row count,
    * weight sum, and weighted value sum — everything a percentile CI
    * needs (replicate b's group mean = wv_sum/w_sum; rank the B
    * mean-diffs at render time; Poisson weights also make w_sum itself
    * a resample size to report).
    *
    * 100 TB shape: ONE data-sized pass — the B-element weight array
    * rides the scan (codegen'd higher-order function, no join, no
    * shuffle for the draw) and posexplodes into the aggregate, which
    * map-side combines down to B×|groups| rows. Cost is B× the scan's
    * row volume in the partial aggregate only. */
  def poissonBootstrapSums(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      b: Int = 32, salt: String = "boot"): DataFrame = {
    require(b >= 1 && b <= 1024, s"replicates must be in [1, 1024]: $b")
    // ⌊10⁶ · Poisson(1)-CDF(k)⌋ for k = 0..9; u ≥ the last gets 10
    val cdf = Seq(367879L, 735758L, 919698L, 981011L, 996340L,
      999405L, 999916L, 999989L, 999998L, 999999L)
    val weights = transform(sequence(lit(0), lit(b - 1)), r => {
      val u = conv(substring(md5(concat(
          lit(salt), lit("#"), r.cast("string"),
          lit(":"), col(idCol).cast("string"))), 1, 8), 16, 10)
        .cast("long") % 1000000L
      cdf.zipWithIndex.foldRight(lit(10L): Column) {
        case ((thr, k), rest) => when(u < thr, k.toLong).otherwise(rest)
      }
    })
    df.select(col(groupCol).as("grp"), col(valueCol).as("v"),
        posexplode(weights).as(Seq("replicate", "w")))
      .groupBy("replicate", "grp")
      .agg(count(lit(1)).as("n_rows"), sum("w").as("w_sum"),
        sum(col("w") * col("v")).as("wv_sum"))
  }

  def weightedMixture(
      df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double], salt: String = "mix"): DataFrame = {
    val keep = weights.foldLeft(lit(false)) { case (acc, (src, w)) =>
      acc || (col(sourceCol) === src && sampleFraction(col(idCol), salt, w))
    }
    df.filter(keep)
  }

  /** Leakage-safe train/val/test split: the split is decided at the
    * DEDUP-CLUSTER level, so near-duplicate documents can never straddle
    * a boundary — the *prevention* counterpart of the `split_leakage`
    * audit (which detects exactly the pairs this construction makes
    * impossible). `groups` is a `(idCol, group_id)` frame as produced by
    * [[graft.operators.Dedup.nearDupGroups]] — only documents in some
    * near-dup pair need appear; everything else is its own singleton
    * cluster and splits exactly like [[deterministicSplit]] on its id.
    *
    * One equi-join of the corpus against the (small — dup members only)
    * group table on the id; the split itself stays a stateless salted-md5
    * projection of the cluster key, so appends and re-shards never move
    * existing documents. Output: (id, split_key, split). */
  def clusterSplit(
      docs: DataFrame, groups: DataFrame, salt: String,
      trainPct: Int = 90, valPct: Int = 5,
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol))
      .join(groups.select(col(idCol), col("group_id")), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("group_id"), col(idCol)).as("split_key"),
        deterministicSplit(coalesce(col("group_id"), col(idCol)), salt, trainPct, valPct)
          .as("split"))

  private val SampleSpace = 1000000

  /** Token-budget mixture planning: the step BEFORE [[weightedMixture]].
    * Given per-source integer mixture weights and a total token budget,
    * compute for each source what it can supply and what the mix asks of
    * it: `target_tokens = budget * weight / Σweights` and the keep rate
    * `rate_ppm = target_tokens * 1e6 / available_tokens` (parts per
    * million; > 1e6 means the source must be repeated — epochs — to hit
    * its quota). `rate_ppm / 1e6` feeds straight into
    * [[weightedMixture]]'s per-source fractions.
    *
    * All arithmetic is integer floor-division on non-negative operands,
    * so the plan is bit-exact across engines and runs. Cost shape: one
    * token-count projection + one groupBy(source) — partial aggregation
    * does the work, and |sources| rows ever reach the weights join
    * (broadcast) and the total-weight aggregate. Counting the corpus is
    * the only full pass; at 100 TB it is the same scan any mixture job
    * must make at least once. */
  def mixturePlan(
      docs: DataFrame, weights: DataFrame, budgetTokens: Long,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 0, "token budget must be non-negative")
    // integral weights are the contract (exact floor-division plan); a
    // fractional weight would silently truncate — 0.5 becomes 0 and the
    // source vanishes from the mix with no error. Scale to integer parts
    // (e.g. ppm) upstream instead.
    val wdt = weights.schema("weight").dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)(wdt),
      s"mixturePlan needs an integral 'weight' column, got ${wdt.simpleString}: " +
        "scale fractional mixture weights to integer parts (ppm) upstream — " +
        "a silent cast would truncate 0.5 to 0 and drop the source from the mix")
    val perSource = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("available_tokens"))
    val joined = perSource.join(broadcast(weights), "source")
    val total = weights.agg(sum(col("weight")).cast("long").as("total_weight"))
    joined.crossJoin(broadcast(total))
      .select(
        col("source"), col("n_docs"), col("available_tokens"),
        col("weight").cast("long").as("weight"),
        expr(s"CAST(($budgetTokens * CAST(weight AS BIGINT)) div total_weight AS BIGINT)")
          .as("target_tokens"))
      .withColumn("rate_ppm",
        expr("CAST((target_tokens * 1000000) div available_tokens AS BIGINT)"))
  }

  /** Deterministic negative sampling for contrastive training: for each
    * query row, `k` pseudo-random corpus documents that are NOT its
    * positive — the in-batch-negatives alternative that works when
    * negatives must be reproducible (resumable training, cross-engine
    * audits) and corpus-wide rather than batch-local.
    *
    * Mechanics: corpus docs and queries each hash (salted md5) into one
    * of `buckets` buckets; a query draws its negatives only from its own
    * bucket, ranked by a second salted hash of the (query, doc) pair, so
    * every engine picks the same k docs in the same order. Changing the
    * salt redraws all assignments.
    *
    * Scale shape: NO cross join — one equi-join on the bucket key, so a
    * query's candidate pool is |corpus|/buckets rows and the per-query
    * rank window is bounded by pool size. Size `buckets` ∝ |corpus| (a
    * 10^10-doc corpus at buckets=10^6 gives 10^4-doc pools: thousands of
    * times more than any realistic k, joined and ranked fully in
    * parallel). Both join sides project only (id, bucket) — text and
    * embeddings never move. Requires pool > k by construction; a query
    * yields fewer than k rows only if its whole bucket is smaller than k.
    *
    * Output: (query_id, neg_id, rank) with rank in [1, k]. */
  def negativeSample(
      queries: DataFrame, corpus: DataFrame, k: Int, buckets: Int,
      salt: String = "neg",
      queryIdCol: String = "query_id", positiveIdCol: String = "positive_id",
      corpusIdCol: String = "doc_id"): DataFrame = {
    require(k > 0, "need at least one negative per query")
    require(buckets > 0, "need at least one bucket")
    val q = queries.select(
      col(queryIdCol).as("query_id"),
      col(positiveIdCol).as("positive_id"),
      hashBucket(col(queryIdCol), salt, buckets).as("b"))
    val c = corpus.select(
      col(corpusIdCol).as("neg_id"),
      hashBucket(col(corpusIdCol), salt, buckets).as("b"))
    val w = Window.partitionBy(col("query_id")).orderBy(
      md5(concat(lit(salt), lit("#"), col("query_id").cast("string"),
        lit("#"), col("neg_id").cast("string"))).asc,
      col("neg_id").asc)
    q.join(c, "b")
      .filter(col("neg_id") =!= col("positive_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neg_id", "rank")
  }

  /** Exactly `perStratum` rows per stratum (fewer if the stratum is
    * smaller), chosen by hash order so the choice is deterministic and
    * unbiased. One shuffle on the stratum key; the window never holds
    * more than a partition's sort run — at 100 TB this is the same cost
    * shape as any per-key top-k (and a skewed stratum can be pre-split
    * by hash range, since hash order is arbitrary). */
  def stratifiedSample(
      df: DataFrame, strataCol: String, idCol: String,
      perStratum: Int, salt: String = "strat"): DataFrame = {
    val w = Window
      .partitionBy(col(strataCol))
      .orderBy(md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))).asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= perStratum)
      .drop("_rn")
  }

  /** Deterministic weighted sample of `k` rows: each row draws the
    * integer priority `floor(hash₆₀(id) / w)` — a fixed 60-bit salted-md5
    * uniform divided by the row's positive integer weight — and the k
    * SMALLEST priorities win (ties broken by id). Heavier rows shrink
    * their priority proportionally, so inclusion odds grow with weight
    * (the integer-arithmetic analogue of Efraimidis–Spirakis A-Res
    * hash-priority sampling, reproducible across engines — a float
    * `u^(1/w)` key would hash-diverge in the last ulp); sampling
    * documents ∝ length/quality score for a training mix is the use.
    *
    * Shape: priority is a stateless codegen'd projection (zero shuffle)
    * and the global top-k plans as TakeOrderedAndProject — per-partition
    * k-heaps, only |partitions|·k rows reach the driver-side merge; no
    * global sort at any corpus size. */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "wsamp"): DataFrame = {
    require(k > 0, "k must be positive")
    val hash60 = conv(substring(
      md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    df.filter(col(weightCol) > 0)
      .withColumn("priority", hash60)
      .withColumn("priority", expr(s"priority div cast($weightCol as bigint)"))
      .orderBy(col("priority").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col(weightCol), col("priority"))
  }

  /** Per-group equal-count score buckets — the CCNet §3.3 head/middle/
    * tail split (Wenzek et al. 2020 bucket documents per LANGUAGE into
    * perplexity terciles; `by` is the language there, `score` the LM
    * perplexity — any quality signal plugs in). ANSI `ntile(k)` over
    * (score, tie) per group; `tie` must be unique so the split is
    * deterministic and engine-portable (ntile's earlier-buckets-get-the-
    * remainder distribution is the SQL standard on both engines).
    *
    * Shape: a group is a language (tens to hundreds) so per-group
    * volume is corpus-sized at 100 TB — the tiling therefore runs
    * distributed via [[Stats.distributedNtile]] (range-repartitioned
    * parallel rank; no group ever sorts in one task), bit-identical to
    * the per-group `ntile` window it replaces. */
  def scoreBuckets(
      df: DataFrame, by: Seq[String], score: Column, tie: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"bucket count k=$k must be >= 2")
    Stats.distributedNtile(df, k, by, Seq(score, tie), "bucket")
  }
}
