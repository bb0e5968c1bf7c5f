package graft.streaming

import graft.SparkTestSession
import graft.operators.SuffixDedup
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ExactSubstr ([[OnlineSuffixDedup]]): doc_id-ordered
  * micro-batch ingestion must be FRAME-EQUAL to the one-shot batch
  * [[SuffixDedup.removeDuplicatedSpans]] — the first-arrival owner IS
  * the min-doc_id owner under ordered ingestion — and whole-batch
  * replays must be absorbed. */
class OnlineSuffixSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val L = 20
  private val shared = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 chars
  // boundary chars around the shared block are pairwise DISTINCT, so
  // matches are exactly the planted regions (a shared delimiter would
  // extend them — the SuffixDedupSpec lesson)
  private val corpus = Seq(
    (1L, "own1" + shared + "one!"),                  // owner of `shared`
    (2L, "cpy2" + shared + "two@"),                  // later copy, cut
    (3L, "totally unique text that nothing repeats anywhere x3"),
    (4L, "cpy4" + shared + "for$"),                  // copy in a later batch
    (5L, "pair5" + shared.toUpperCase + "qq%"),      // owner of the UPPER variant
    (6L, "pair6" + shared.toUpperCase + "zz^"),      // same-batch copy of 5
    (7L, "short"))                                   // below minLen, untouched

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("doc-ordered micro-batch replay is frame-equal to the batch operator, incl. a redelivered batch") {
    val dir = SparkTestSession.tempDir("graft-online-suffix")
    val online = new OnlineSuffixDedup(dir, minLen = L)
    val batches = Seq(corpus.slice(0, 3), corpus.slice(3, 6), corpus.slice(6, 7))
    online.processBatch(batches(0).toDF("doc_id", "text"), 0L)
    online.processBatch(batches(1).toDF("doc_id", "text"), 1L)
    online.processBatch(batches(1).toDF("doc_id", "text"), 1L) // at-least-once replay
    online.processBatch(batches(2).toDF("doc_id", "text"), 2L)
    val streamed = collect(online.corpus(spark))
    val batch = collect(
      SuffixDedup.removeDuplicatedSpans(corpus.toDF("doc_id", "text"), minLen = L))
    assert(streamed === batch)
    // sanity on the semantics themselves: owners intact, copies cut
    val byId = streamed.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 === "own1" + shared + "one!")
    assert(byId(2L)._2 === "cpy2" + "two@" && byId(2L)._3 === 36L)
    assert(byId(4L)._2 === "cpy4" + "for$")
    assert(byId(5L)._2.contains(shared.toUpperCase)) // same-batch owner keeps
    assert(byId(6L)._3 === 36L)                      // same-batch copy cut
    assert(byId(7L) === (7L, "short", 0L, 0L))
  }

  test("index compaction: one generation replaces the batch dirs, semantics bit-identical") {
    val dirA = SparkTestSession.tempDir("graft-online-suffix-compact")
    val dirB = SparkTestSession.tempDir("graft-online-suffix-nocompact")
    val a = new OnlineSuffixDedup(dirA, minLen = L)
    val b = new OnlineSuffixDedup(dirB, minLen = L)
    val batches = Seq(corpus.slice(0, 2), corpus.slice(2, 4), corpus.slice(4, 6),
      corpus.slice(6, 7))
    // A compacts mid-stream (twice) and gets a replay AFTER compaction;
    // B never compacts — every observable must match
    a.processBatch(batches(0).toDF("doc_id", "text"), 0L)
    a.processBatch(batches(1).toDF("doc_id", "text"), 1L)
    assert(a.compactIndex(spark, targetFiles = 2) === 2)
    a.processBatch(batches(2).toDF("doc_id", "text"), 2L)
    a.processBatch(batches(2).toDF("doc_id", "text"), 2L) // replay post-compact
    assert(a.compactIndex(spark, targetFiles = 2) === 1)  // absorbs batch 2
    assert(a.compactIndex(spark) === 0)                   // nothing new: no-op
    a.processBatch(batches(3).toDF("doc_id", "text"), 3L)
    batches.zipWithIndex.foreach { case (bt, i) =>
      b.processBatch(bt.toDF("doc_id", "text"), i.toLong) }
    assert(collect(a.corpus(spark)) === collect(b.corpus(spark)))
    // the compacted layout really did replace the per-batch dirs
    val idx = new java.io.File(dirA, "index")
    val batchDirs = Option(idx.listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("batch="))
    assert(batchDirs.map(_.getName) === Seq("batch=3"),
      s"covered batch dirs should be reclaimed: ${batchDirs.map(_.getName)}")
    val gen = new java.io.File(idx, "_compacted")
    assert(gen.listFiles().map(_.getName).count(_.startsWith("COMMIT-g")) === 1,
      "old generations' markers are reclaimed")
  }

  test("a crashed compaction (generation data without its marker) changes nothing") {
    val dir = SparkTestSession.tempDir("graft-online-suffix-crashcompact")
    val online = new OnlineSuffixDedup(dir, minLen = L)
    online.processBatch(corpus.slice(0, 3).toDF("doc_id", "text"), 0L)
    // orphan generation: data written, marker never created
    spark.read.parquet(s"$dir/index").withColumn("junk", lit(999L))
      .write.parquet(s"$dir/index/_compacted/g0")
    online.processBatch(corpus.slice(3, 6).toDF("doc_id", "text"), 1L)
    val expected = SuffixDedup.removeDuplicatedSpans(
      (corpus.slice(0, 3) ++ corpus.slice(3, 6)).toDF("doc_id", "text"), minLen = L)
    assert(collect(online.corpus(spark)) === collect(expected))
    // the next compaction overwrites the orphan and commits
    assert(online.compactIndex(spark) === 2)
    online.processBatch(corpus.slice(6, 7).toDF("doc_id", "text"), 2L)
    val full = SuffixDedup.removeDuplicatedSpans(
      corpus.toDF("doc_id", "text"), minLen = L)
    assert(collect(online.corpus(spark)) === collect(full))
  }

  test("the index grows discover-once: replaying a batch adds no duplicate hashes") {
    val dir = SparkTestSession.tempDir("graft-online-suffix-idx")
    val online = new OnlineSuffixDedup(dir, minLen = L)
    online.processBatch(corpus.slice(0, 3).toDF("doc_id", "text"), 0L)
    online.processBatch(corpus.slice(3, 6).toDF("doc_id", "text"), 1L)
    online.processBatch(corpus.slice(3, 6).toDF("doc_id", "text"), 1L)
    val idx = spark.read.parquet(s"$dir/index")
    assert(idx.count() === idx.select("h").distinct().count())
  }
}
