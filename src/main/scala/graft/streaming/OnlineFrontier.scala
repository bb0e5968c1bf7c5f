package graft.streaming

import graft.operators.{Html, Web}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming crawl-frontier maintenance — the URL-side twin of
  * [[OnlineDedup]]: a `foreachBatch` sink that turns every micro-batch
  * of fetched pages into NEW frontier entries against the frontier
  * accumulated so far. Per batch: outlinks extracted
  * ([[Html.extractLinks]]), absolute-only, canonicalized
  * ([[Web.normalizeUrl]]), batch-distinct, policy-checked
  * ([[Web.policyFilter]] — RFC 9309 longest-prefix), domain-blocklisted,
  * anti-joined against the standing frontier (a URL discovers once,
  * ever), and per-domain capped against the STANDING per-domain counts
  * (first-arrival admission: a domain at its cap admits nothing more —
  * the online counterpart of the batch gate's global cap; the two
  * differ deliberately, ordering by arrival instead of lexicographic).
  *
  * 100 TB story: every step is O(batch) — the rules broadcast, the
  * blocklist broadcasts, the standing-count frame is |domains|-sized
  * and broadcasts, and the one standing-frontier anti-join is an
  * equi-join on the canonical URL (co-partitioned; nothing rescans or
  * reshuffles the accumulated frontier beyond that probe).
  *
  * Replay safety (foreachBatch is at-least-once): batch-keyed partition
  * directories with OVERWRITE, and the standing reads EXCLUDE the
  * batch's own partition — the admission decision is identical on first
  * delivery and on every replay (the [[OnlineDedup]] recipe).
  *
  * Contract: `rootDir` belongs to ONE streaming query lineage (batch
  * ids are the idempotence key); canonical URLs are the frontier's
  * identity. */
final class OnlineFrontier(
    rootDir: String, rules: DataFrame, blockedDomains: Seq[String],
    suffixes: Seq[String], perDomainCap: Int = Int.MaxValue,
    htmlCol: String = "html") {
  require(perDomainCap >= 1, "perDomainCap must be >= 1")

  private val frontierDir = s"$rootDir/frontier"

  // the rule table is fixed for the life of the sink but arrives as an
  // arbitrary DataFrame lineage — materialize it ONCE so every
  // micro-batch's policy broadcast rebuilds from the rows instead of
  // re-executing the caller's upstream per batch (r16, guide §1.2/§5).
  // r17 (r16 advice): collected to a driver-local relation rather than
  // localCheckpoint'd — a lifetime-of-the-sink localCheckpoint is not
  // recomputable, so losing the executor holding its blocks mid-stream
  // would permanently fail every later micro-batch; the table is
  // KB-sized and broadcast anyway, so driver-local rows are the right
  // home (they also skip the per-batch executor fetch).
  private val pinnedRules = {
    import scala.jdk.CollectionConverters._
    rules.sparkSession.createDataFrame(
      rules.collect().toSeq.asJava, rules.schema)
  }

  /** The foreachBatch hook:
    * `pages.writeStream.foreachBatch(online.processBatch _)`. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cand = batch
      .select(explode(Html.extractLinks(col(htmlCol))).as("href"))
      .filter(Web.hostOf(col("href")) =!= "")
      .select(Web.normalizeUrl(col("href")).as("url_norm"))
      .distinct()
      .withColumn("domain",
        Web.registrableDomain(Web.hostOf(col("url_norm")), suffixes))
      // pinned: policyFilter consumes its input TWICE (the winner pick
      // and the verdict fan-back join) — unpinned, the whole regex
      // link-extraction subtree above would execute twice per batch
      // (r16; measured 2× the batch's dominant CPU term)
      .localCheckpoint()
    val allowed = Web.blocklistFilter(
      Web.policyFilter(cand, "url_norm", "url_norm", pinnedRules)
        .filter(col("allowed"))
        .select("url_norm", "host", "domain"),
      "domain", blockedDomains.toDF("domain"))
    val standing = readStanding(spark, batchId)
    val fresh = allowed
      .join(standing.select("url_norm"), Seq("url_norm"), "left_anti")
    // first-arrival cap: standing per-domain counts are |domains|-sized
    // (broadcast); within the batch, a deterministic (url) order fills
    // the remaining quota
    val counts = standing.groupBy("domain").agg(count(lit(1)).as("_n"))
    val admitted = fresh
      .join(broadcast(counts), Seq("domain"), "left")
      .na.fill(0L, Seq("_n"))
      .withColumn("_rn",
        row_number().over(
          Window.partitionBy(col("domain")).orderBy(col("url_norm"))))
      .filter(col("_n") + col("_rn") <= perDomainCap)
      .select("url_norm", "host", "domain")
    admitted.write.mode("overwrite").parquet(s"$frontierDir/batch=$batchId")
  }

  // a replayed batch must not probe its own prior write; a footerless
  // frontier dir (crash during the very first write) reads as empty
  // rather than wedging every replay on schema inference (r15 advice)
  private def readStanding(spark: SparkSession, batchId: Long): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("url_norm",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("host",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("domain",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("batch",
          org.apache.spark.sql.types.LongType))))
    IndexIo.readOrElse(spark, frontierDir)(empty)
      .filter(col("batch") =!= batchId)
      .drop("batch")
  }

  /** The frontier accumulated so far. */
  def frontier(spark: SparkSession): DataFrame =
    IndexIo.readOrElse(spark, frontierDir)(spark.emptyDataFrame).drop("batch")
}
