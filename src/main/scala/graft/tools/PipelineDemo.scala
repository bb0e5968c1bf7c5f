package graft.tools

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline walkthrough over the test corpus —
  * every stage a large-scale data pipeline runs, composed from the
  * operator family in dependency order:
  *
  *   quality filter → exact dedup → near-dup groups → decontamination
  *   → deterministic split → split-leakage audit → token-budget mixture
  *   → sequence packing → sharded shuffle
  *
  * Run: `sbt "runMain graft.tools.PipelineDemo [sfDir]"`. Prints one
  * summary line per stage and ends with `PIPELINE OK`. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"== ingest == ${raw.count()} documents from $sfDir")

    println("== quality filter ==")
    val quality = TextCorpus.qualityFlags(raw)
    val kept = raw.join(quality.filter(col("keep")).select("doc_id"), "doc_id")
    println(s"  kept ${kept.count()} / ${raw.count()} after language/quality/repetition")

    println("== exact dedup ==")
    val exact = Dedup.exactDedup(kept, "text", "doc_id")
    println(s"  ${exact.count()} survivors after byte-exact dedup")

    println("== near-dup groups (MinHash-LSH + connected components) ==")
    val pairs = Dedup.nearDupPairs(exact, "text", "doc_id", threshold = 0.5)
    val nPairs = pairs.count()
    val deduped =
      if (nPairs == 0) { println("  0 near-dup pairs"); exact }
      else {
        val groups = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
        val drop = groups.filter(col("id") =!= col("component"))
          .select(col("id").as("doc_id"))
        // materialize: the demo's counts and every later stage fan out
        // from this frame (the Bench macro scenario's r13 adjudication)
        val out = exact.join(drop, Seq("doc_id"), "left_anti").localCheckpoint()
        println(s"  $nPairs pairs → kept ${out.count()} (min-id survivor per cluster)")
        out
      }

    println("== decontamination vs a benchmark slice ==")
    val bench = raw.orderBy("doc_id").limit(5)
      .select((col("doc_id") + 900000).as("doc_id"), col("text"))
    // the synthetic corpus draws from a ~31-word vocabulary, so unrelated
    // docs share tens of 8-gram shingles by construction (p99 ≈ 67,
    // copies ≈ 200): the threshold must sit between the two modes
    val contaminated = Dedup.contamination(deduped, bench, "text", "doc_id",
        minOverlap = 150)
      .select(col("corpus_id").as("doc_id")).distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    println(s"  removed ${deduped.count() - clean.count()} contaminated docs " +
      s"(8-gram overlap vs ${bench.count()} benchmark docs)")

    println("== deterministic split ==")
    val split = clean.withColumn("split",
      Sampling.deterministicSplit(col("doc_id"), salt = "demo-v1", trainPct = 80, valPct = 10))
    split.groupBy("split").count().orderBy("split").collect()
      .foreach(r => println(s"  ${r.getString(0)}: ${r.getLong(1)}"))

    println("== split-leakage audit ==")
    val leaks = Dedup.nearDupPairs(clean, "text", "doc_id", threshold = 0.5)
      .select(
        Sampling.deterministicSplit(col("id_a"), "demo-v1", 80, 10).as("sa"),
        Sampling.deterministicSplit(col("id_b"), "demo-v1", 80, 10).as("sb"))
      .filter(col("sa") =!= col("sb")).count()
    println(s"  $leaks near-dup pairs cross a split boundary " +
      "(0 expected after near-dup removal)")

    println("== token-budget mixture plan ==")
    val weights = clean.select("source").distinct()
      .select(col("source"), (substring(col("source"), 4, 10).cast("int") % 4 + 1).as("weight"))
    val plan = Sampling.mixturePlan(split.filter(col("split") === "train"), weights,
      budgetTokens = 10000L)
    plan.orderBy("source").collect().take(3).foreach(r =>
      println(s"  ${r.getString(0)}: ${r.getLong(2)} tokens available, " +
        s"quota ${r.getLong(4)}, rate ${r.getLong(5)} ppm"))
    println(s"  (${plan.count()} sources planned)")

    println("== sequence packing ==")
    val withCost = split.filter(col("split") === "train")
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
    val bins = Packing.binStats(withCost, "doc_id", "n_tokens",
      budget = 512L, chunkSize = 1000L)
    println(s"  ${withCost.count()} train docs packed into ${bins.count()} bins of ≤512 tokens")

    println("== sharded shuffle (epoch 0) ==")
    val order = TextCorpus.shardedShuffle(split.filter(col("split") === "train"),
      shards = 4, salt = "epoch-0")
    println(s"  ${order.count()} rows dealt across " +
      s"${order.select("shard").distinct().count()} shards")

    println("PIPELINE OK")
    spark.stop()
  }
}
