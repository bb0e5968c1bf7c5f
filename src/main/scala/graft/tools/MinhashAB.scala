package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B timer for the minhash near-dup pipeline variants.
  * Not part of the library surface; used to pick the plan shape with
  * measurements instead of guesses. */
object MinhashAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val docs0 = d.unionAll(
        d.filter(col("doc_id") < 100)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      .unionAll(
        d.filter(col("doc_id") < 40)
          .select((col("doc_id") + 20000).as("doc_id"),
            col("text").substr(lit(11), lit(100000)).as("text")))
    docs0.count()

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"AB $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    def run(df: DataFrame): Unit =
      df.orderBy("id_a", "id_b").write.format("noop").mode("overwrite").save()

    // Component costs
    time("c0_shingle_pass") {
      val withSh = docs0.select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 5).as("sh"))
      withSh.agg(sum(size(col("sh")))).collect()
    }
    time("c1_sig_pass") {
      val withSh = docs0.select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 5).as("sh"))
      val sig = withSh.select(col("id"),
        posexplode(Dedup.lshBandHashes(graft.functions.TextHash.minHashFromHashes(col("sh"), 32), 8, 32))
          .as(Seq("band", "bucket")))
      sig.agg(count(lit(1))).collect()
    }
    time("c2_cands") {
      val withSh = docs0.select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 5).as("sh"))
      Dedup.lshCandidatePairsFromHashes(withSh, 32, 8, 10000).agg(count(lit(1))).collect()
    }

    // V1: current shipped pipeline
    time("v1_current") {
      run(Dedup.nearDupPairs(docs0, "text", "doc_id", threshold = 0.5, maxBucketSize = 10000))
    }

    // V2: verify via two id-joins against the corpus arrays (no explode,
    // no pair-groupBy); candidate side broadcast by hint
    time("v2_twojoin") {
      val docs = docs0.select(col("doc_id").as("id"), col("text").as("txt"))
      val withSh = docs.select(col("id"), Dedup.shingleHashes(col("txt"), 5).as("sh"))
      val cands = Dedup.lshCandidatePairsFromHashes(withSh, 32, 8, 10000)
      val out = withSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
        .join(broadcast(cands), Seq("id_a"))
        .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", Dedup.jaccardFromHashSets(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
      run(out)
    }

    // V3: current verify shape but NO broadcast hint (AQE decides)
    time("v3_aqe") {
      val docs = docs0.select(col("doc_id").as("id"), col("text").as("txt"))
      val withSh = docs.select(col("id"), Dedup.shingleHashes(col("txt"), 5).as("sh"))
      val cands = Dedup.lshCandidatePairsFromHashes(withSh, 32, 8, 10000)
      val sides = cands.select(
        col("id_a"), col("id_b"),
        explode(array(col("id_a"), col("id_b"))).as("id"))
      val out = docs.join(sides, Seq("id"))
        .select(col("id_a"), col("id_b"), Dedup.shingleHashes(col("txt"), 5).as("sh"))
        .groupBy("id_a", "id_b")
        .agg(collect_list(col("sh")).as("shs"))
        .withColumn("jaccard", Dedup.jaccardFromHashSets(element_at(col("shs"), 1), element_at(col("shs"), 2)))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
      run(out)
    }

    // V4: fuse — skip the candidate distinct; dedupe pairs in the verify
    // group (min over band occurrences), two-join verify without distinct
    time("v4_nodistinct_twojoin") {
      val docs = docs0.select(col("doc_id").as("id"), col("text").as("txt"))
      val withSh = docs.select(col("id"), Dedup.shingleHashes(col("txt"), 5).as("sh"))
      val sig = withSh.select(
        col("id"),
        posexplode(Dedup.lshBandHashes(graft.functions.TextHash.minHashFromHashes(col("sh"), 32), 8, 32))
          .as(Seq("band", "bucket")))
      val cands = sig.groupBy("band", "bucket")
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= 10000)
        .select(explode(Dedup.pairCombos(col("ids"))).as("p"))
        .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b")).agg(count(lit(1)))
        .select("id_a", "id_b")
      val out = withSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
        .join(broadcast(cands), Seq("id_a"))
        .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", Dedup.jaccardFromHashSets(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
      run(out)
    }

    // V5: two-join, no hints at all — SMJ both sides, hoping for
    // exchange reuse of the withSh shuffle
    time("v5_smj_reuse") {
      val docs = docs0.select(col("doc_id").as("id"), col("text").as("txt"))
      val withSh = docs.select(col("id"), Dedup.shingleHashes(col("txt"), 5).as("sh"))
      val cands = Dedup.lshCandidatePairsFromHashes(withSh, 32, 8, 10000)
      val out = cands
        .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", Dedup.jaccardFromHashSets(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
      run(out)
    }

    // V7: localCheckpoint the shingle arrays (computed exactly once),
    // then candidates + two broadcast-joins against the checkpointed frame
    time("v7_ckpt_twojoin") {
      val docs = docs0.select(col("doc_id").as("id"), col("text").as("txt"))
      val withSh = docs.select(col("id"), Dedup.shingleHashes(col("txt"), 5).as("sh"))
        .localCheckpoint()
      val cands = Dedup.lshCandidatePairsFromHashes(withSh, 32, 8, 10000)
      val out = withSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
        .join(broadcast(cands), Seq("id_a"))
        .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", Dedup.jaccardFromHashSets(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
      run(out)
    }

    // V8: like v7 but keep v1's single-scan verify (explode+groupBy)
    time("v8_ckpt_v1shape") {
      val docs = docs0.select(col("doc_id").as("id"), col("text").as("txt"))
      val withSh = docs.select(col("id"), Dedup.shingleHashes(col("txt"), 5).as("sh"))
        .localCheckpoint()
      val cands = Dedup.lshCandidatePairsFromHashes(withSh, 32, 8, 10000)
      val sides = cands.select(
        col("id_a"), col("id_b"),
        explode(array(col("id_a"), col("id_b"))).as("id"))
      val out = withSh.join(broadcast(sides), Seq("id"))
        .groupBy("id_a", "id_b")
        .agg(collect_list(col("sh")).as("shs"))
        .withColumn("jaccard", Dedup.jaccardFromHashSets(element_at(col("shs"), 1), element_at(col("shs"), 2)))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
      run(out)
    }

    spark.stop()
  }
}
