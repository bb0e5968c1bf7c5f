package graft.streaming

import graft.SparkTestSession
import graft.operators.SuffixDedup
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
