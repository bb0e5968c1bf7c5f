package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end equivalence of the INCREMENTAL daily-growth pipeline
  * (the `pipeline_docs_incremental` bench scenario) with a full
  * recompute restricted to the new ids — the `incremental_dedup` idiom
  * extended through the whole composition: index probe → survivors →
  * rollup merge → leakage-safe delta split. Batch ids are all larger
  * than standing ids (the incremental contract), so "restricted to new
  * ids" is exactly "pairs whose larger id is in the batch". */
class IncrementalPipelineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text", "source")
  private lazy val standing = docs.filter(col("doc_id") % 10 =!= 0)
    .localCheckpoint()
  // same construction as the bench scenario: half exact copies (index
  // hits), half fresh-tailed text (survivors)
  private lazy val batch = docs.filter(col("doc_id") % 10 === 0)
    .select((col("doc_id") + 10000000L).as("doc_id"),
      when(col("doc_id") % 20 === 0, col("text"))
        .otherwise(concat(col("text"), lit(" fresh "), col("doc_id")))
        .as("text"),
      col("source"))
    .localCheckpoint()

  private lazy val pairsInc = {
    val (buckets, shingles) = Dedup.nearDupIndex(standing, "text", "doc_id")
    Dedup.incrementalNearDupPairs(batch, buckets, shingles,
      "text", "doc_id", threshold = 0.5).localCheckpoint()
  }

  test("incremental pairs = full-recompute pairs restricted to larger-id-in-batch") {
    val full = Dedup.nearDupPairs(
        standing.unionByName(batch), "text", "doc_id", threshold = 0.5)
      .filter(col("id_b") >= 10000000L) // larger id in the batch
      .select(col("id_b").as("new_id"), col("id_a").as("match_id"),
        col("jaccard"))
    val a = pairsInc.select("new_id", "match_id", "jaccard")
      .collect().map(_.toSeq).toSet
    val b = full.collect().map(_.toSeq).toSet
    assert(a.nonEmpty, "fixture produced no duplicate pairs")
    assert(a === b)
  }

  test("incremental survivors = batch minus the full-recompute drop set") {
    val survivors = batch.join(
        pairsInc.select(col("new_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    val fullDrop = Dedup.nearDupPairs(
        standing.unionByName(batch), "text", "doc_id", threshold = 0.5)
      .filter(col("id_b") >= 10000000L)
      .select("id_b").as[Long].collect().toSet
    val expected = batch.select("doc_id").as[Long].collect().toSet -- fullDrop
    assert(survivors.nonEmpty && fullDrop.nonEmpty,
      "fixture needs both survivors and drops to be meaningful")
    assert(survivors === expected)
  }

  test("maintainAgg rollup merge = from-scratch rollup over standing ∪ survivors") {
    val survivors = batch.join(
      pairsInc.select(col("new_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    def withTokens(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .select("source", "n_tokens")
    val standingRollup = withTokens(standing).groupBy("source")
      .agg(sum("n_tokens").as("n_tokens"), count(lit(1)).as("n"))
    val merged = Merge.maintainAgg(standingRollup, withTokens(survivors),
        Seq("source"), Seq("n_tokens"), countCol = "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val scratch = withTokens(standing.unionByName(survivors)).groupBy("source")
      .agg(sum("n_tokens").as("n_tokens"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === scratch)
  }

  test("delta cluster split is leakage-safe and keys matched docs on their standing representative") {
    val groups = pairsInc.groupBy(col("new_id").as("doc_id"))
      .agg(min("match_id").as("group_id"))
    val split = Sampling.clusterSplit(batch, groups, salt = "inc-v1")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // every matched batch doc splits by its group key, which is its
    // SMALLEST match — a standing id whenever any standing match exists
    // (standing ids < batch ids), so it lands with the standing cluster
    val byDoc = pairsInc.groupBy("new_id").agg(min("match_id").as("rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rep) =>
      assert(split(id)._1 === rep, s"doc $id split key != its representative")
      // same group ⇒ same split: the split is a pure function of the key
      byDoc.collect { case (other, r2) if r2 == rep && other != id =>
        assert(split(other)._2 === split(id)._2,
          s"docs $id and $other share rep $rep but split differently")
      }
    }
    // unmatched docs split as their own singleton clusters
    val unmatched = split.keySet -- byDoc.keySet
    assert(unmatched.nonEmpty)
    unmatched.foreach(id => assert(split(id)._1 === id))
  }
}
