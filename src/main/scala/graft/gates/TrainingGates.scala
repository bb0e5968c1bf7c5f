package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators._
import graft.streaming.{EventTimeOps, StatefulOps}

/** Training-pipeline operators: as-of join, deterministic sampling, sequence packing.
  *
  * One gate trait of [[SparkEntry]] (round-11 split of the single-file
  * registry): the operator defs, their `queries` entries, and their
  * DuckDB oracle twins travel together; SparkEntry composes the maps. */
private[graft] trait TrainingGates extends GateSupport {

  // ==================================================================
  // Training-pipeline operators (round 5): as-of join, deterministic
  // sampling, sequence packing — all integer/hash arithmetic or exact
  // value carry, so every gate has a closed-form DuckDB twin (as-of
  // uses DuckDB's native ASOF JOIN as the oracle).
  // ==================================================================

  import graft.operators.{AsOfJoin, Packing, Sampling}

  /** As-of join (AsOfJoin.asOf): each event annotated with the user's
    * most recent purchase value at or before the event. Timestamps are
    * pre-floored to micros on the Spark side so the comparison domain
    * matches DuckDB's micros read of the nanos parquet column; the right
    * side is pre-aggregated to one row per (user, ts) as the operator
    * requires. Nulls are coalesced to -1 for a stable compare. */
  /** As-of join with a TOLERANCE: the carried value only counts when the
    * matched right row is within the window (here 1 day) — the staleness
    * bound every feature-store lookup needs ("last price, but not if
    * it's a week old"). Same single-shuffle union+window plan as
    * [[asofJoinQuery]]; the matched right timestamp rides the payload
    * struct and the bound is a codegen'd post-filter, so tolerance costs
    * nothing extra. */
  protected def asofToleranceQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsNs(s, dir)
      .withColumn("ts_us", EventTimeOps.floorDivMicros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts_us").agg(max("value").as("pvalue"))
      .withColumn("p_ts_us", col("ts_us"))
    AsOfJoin.asOf(
        ev.select("event_id", "user_id", "ts_us"), purchases,
        keys = Seq("user_id"), leftTs = "ts_us", rightTs = "ts_us",
        payload = Seq("pvalue", "p_ts_us"))
      .select(
        col("event_id"), col("user_id"),
        when(col("ts_us") - col("asof_p_ts_us") <= 86400000000L,
          col("asof_pvalue")).otherwise(lit(-1.0))
          .as("recent_purchase_value"))
      .orderBy("event_id")
  }

  protected def asofJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsNs(s, dir)
      .withColumn("ts_us", EventTimeOps.floorDivMicros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts_us").agg(max("value").as("pvalue"))
    AsOfJoin.asOf(
        ev.select("event_id", "user_id", "ts_us"), purchases,
        keys = Seq("user_id"), leftTs = "ts_us", rightTs = "ts_us",
        payload = Seq("pvalue"))
      .select(
        col("event_id"), col("user_id"),
        coalesce(col("asof_pvalue"), lit(-1.0)).as("last_purchase_value"))
      .orderBy("event_id")
  }

  /** Deterministic split assignment (Sampling.deterministicSplit):
    * per-language row counts of the 80/10/10 md5-bucket split. */
  protected def sampleSplitCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"),
        Sampling.deterministicSplit(col("doc_id"), "v1", trainPct = 80, valPct = 10).as("split"))
      .groupBy("lang", "split").agg(count(lit(1)).as("n"))
      .orderBy("lang", "split")

  /** Stratified quota sample (Sampling.stratifiedSample): exactly 50
    * docs per language, chosen by salted-md5 order. */
  protected def stratifiedSampleQuery(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(t(s, dir, "documents"), "lang", "doc_id", perStratum = 50)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** Benchmark-contamination check (Dedup.contamination): the planted
    * exact and prefix-truncated copies in the dup corpus flagged against
    * the doc_id<40 originals standing in as the eval set. Distinct docs
    * share far fewer than 30 distinct 8-gram shingles, so the flags are
    * exactly the planted copies. */
  protected def contaminationFlags(s: SparkSession, dir: String): DataFrame = {
    val bench = t(s, dir, "documents").select("doc_id", "text").filter(col("doc_id") < 40)
    val corpus = docsWithDups(s, dir).filter(col("doc_id") >= 10000)
    Dedup.contamination(corpus, bench, "text", "doc_id", shingleSize = 8, minOverlap = 30)
      .orderBy("corpus_id", "bench_id")
  }

  /** Bloom-filter decontamination (Dedup.bloomContamination): the same
    * planted-copy corpus and thresholds as [[contaminationFlags]], but
    * through the no-broadcast scale path — Bloom prefilter map-side,
    * shuffle join for the exact verify. Bloom filters have no false
    * negatives and the join is exact, so the output (and oracle) are
    * identical to the broadcast path's. */
  protected def bloomContaminationFlags(s: SparkSession, dir: String): DataFrame = {
    val bench = t(s, dir, "documents").select("doc_id", "text").filter(col("doc_id") < 40)
    val corpus = docsWithDups(s, dir).filter(col("doc_id") >= 10000)
    Dedup.bloomContamination(corpus, bench, "text", "doc_id", shingleSize = 8, minOverlap = 30)
      .orderBy("corpus_id", "bench_id")
  }

  /** Weighted mixture downsampling (Sampling.weightedMixture): three
    * source families at 100% / 50% / 10% keep rates, reported per
    * source. Rows from unlisted sources drop. */
  protected def weightedMixtureCounts(s: SparkSession, dir: String): DataFrame = {
    val weights = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.1,
      "src3" -> 1.0, "src4" -> 0.5, "src5" -> 0.1)
    Sampling.weightedMixture(t(s, dir, "documents"), "source", "doc_id", weights)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .orderBy("source")
  }

  /** Deterministic negative sampling (Sampling.negativeSample): 5
    * negatives per query from the query's hash bucket, positives (the
    * query doc itself here) excluded. Pure md5 arithmetic — exact
    * DuckDB twin. */
  protected def negativeSamples(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val queries = d.filter(col("doc_id") < 25)
      .select(col("doc_id").as("query_id"), col("doc_id").as("positive_id"))
    Sampling.negativeSample(queries, d, k = 5, buckets = 4, salt = "neg")
      .orderBy("query_id", "rank")
  }

  /** Sequence packing (Packing.binStats): 4096-char bins over chunks of
    * 100 consecutive doc ids, reported as per-bin utilization. */
  protected def packSequences(s: SparkSession, dir: String): DataFrame =
    Packing.binStats(t(s, dir, "documents"), "doc_id", "n_chars",
        budget = 4096L, chunkSize = 100L)
      .orderBy("bin")

  protected def trainingGateQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> asofJoinQuery _,
    "asof_tolerance" -> asofToleranceQuery _,
    "sample_split_counts" -> sampleSplitCounts _,
    "stratified_sample" -> stratifiedSampleQuery _,
    "weighted_mixture" -> weightedMixtureCounts _,
    "negative_samples" -> negativeSamples _,
    "contamination_flags" -> contaminationFlags _,
    "bloom_contamination" -> bloomContaminationFlags _,
    "pack_sequences" -> packSequences _,
  )

  protected def trainingGateOracles: Map[String, String] = Map(
    "asof_join" ->
      // DuckDB's native ASOF JOIN is the oracle for AsOfJoin.asOf; both
      // sides compare in the micros domain, right side deduped per
      // (user, ts) with max(value) exactly as the Spark query does
      """WITH p AS (SELECT user_id, epoch_us(ts) AS tus, max(value) AS pvalue
                    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT e.event_id, e.user_id,
                coalesce(p.pvalue, -1.0) AS last_purchase_value
         FROM events e ASOF LEFT JOIN p
           ON e.user_id = p.user_id AND epoch_us(e.ts) >= p.tus
         ORDER BY e.event_id""",
    "asof_tolerance" ->
      // the same native ASOF oracle with the staleness bound as a CASE:
      // a match older than the window (or no match: NULL tus) falls to -1
      """WITH p AS (SELECT user_id, epoch_us(ts) AS tus, max(value) AS pvalue
                    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT e.event_id, e.user_id,
                CASE WHEN epoch_us(e.ts) - p.tus <= 86400000000
                  THEN p.pvalue ELSE -1.0 END AS recent_purchase_value
         FROM events e ASOF LEFT JOIN p
           ON e.user_id = p.user_id AND epoch_us(e.ts) >= p.tus
         ORDER BY e.event_id""",
    "sample_split_counts" ->
      // the same salted-md5 bucket arithmetic as Sampling.hashBucket
      """WITH b AS (SELECT lang,
                           ('0x' || substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                             % 100 AS bucket
                    FROM documents)
         SELECT lang,
                CASE WHEN bucket < 80 THEN 'train'
                     WHEN bucket < 90 THEN 'val'
                     ELSE 'test' END AS split,
                count(*) AS n
         FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    "stratified_sample" ->
      """WITH ranked AS (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents)
         SELECT doc_id, lang FROM ranked WHERE rn <= 50 ORDER BY doc_id""",
    "weighted_mixture" ->
      // per-source keep fractions over the same md5 bucket space as
      // Sampling.sampleFraction (1e6 buckets)
      """WITH b AS (SELECT source,
                           ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                             % 1000000 AS bucket
                    FROM documents
                    WHERE source IN ('src0','src1','src2','src3','src4','src5'))
         SELECT source, count(*) AS n
         FROM b
         WHERE bucket < CASE source
                          WHEN 'src0' THEN 1000000 WHEN 'src3' THEN 1000000
                          WHEN 'src1' THEN 500000  WHEN 'src4' THEN 500000
                          ELSE 100000 END
         GROUP BY 1 ORDER BY 1""",
    "negative_samples" ->
      // same salted-md5 bucket assignment and (query, doc) rank hash as
      // Sampling.negativeSample; ties broken by neg_id on both engines
      """WITH q AS (SELECT doc_id AS query_id, doc_id AS positive_id,
                           ('0x' || substr(md5('neg:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS b
                    FROM documents WHERE doc_id < 25),
              c AS (SELECT doc_id AS neg_id,
                           ('0x' || substr(md5('neg:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS b
                    FROM documents),
              j AS (SELECT q.query_id, c.neg_id,
                           row_number() OVER (PARTITION BY q.query_id
                             ORDER BY md5('neg#' || CAST(q.query_id AS VARCHAR) || '#' || CAST(c.neg_id AS VARCHAR)),
                                      c.neg_id) AS rank
                    FROM q JOIN c ON q.b = c.b AND c.neg_id <> q.positive_id)
         SELECT query_id, neg_id, CAST(rank AS BIGINT) AS rank
         FROM j WHERE rank <= 5 ORDER BY query_id, rank""",
    "contamination_flags" -> contaminationOracleSql,
    "bloom_contamination" ->
      // Bloom prefilter + exact shuffle join ≡ the broadcast exact path
      // (no false negatives; the join erases false positives), so the
      // scale-path gate shares the exact oracle verbatim
      contaminationOracleSql,
    "pack_sequences" ->
      // Packing.assignBins: chunked cumulative fill, bin of each row's
      // END; bin id = chunk * 2^32 + binInChunk
      """WITH c AS (
           SELECT doc_id, n_chars, doc_id // 100 AS chunk,
                  sum(n_chars) OVER (PARTITION BY doc_id // 100 ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
           FROM documents)
         SELECT bin, n_docs, total_cost, first_id, last_id,
                total_cost / 4096.0 AS fill_ratio
         FROM (
           SELECT CAST(chunk * 4294967296 + (cum - 1) // 4096 AS BIGINT) AS bin,
                  count(*) AS n_docs,
                  CAST(sum(n_chars) AS BIGINT) AS total_cost,
                  min(doc_id) AS first_id, max(doc_id) AS last_id
           FROM c GROUP BY 1)
         ORDER BY bin""",
  )
}
