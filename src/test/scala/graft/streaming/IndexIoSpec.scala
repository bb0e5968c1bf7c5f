package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[IndexIo]]: the crash window the r15 advice flagged — a standing
  * parquet state directory that EXISTS but holds no readable data
  * files (a crash between the first write's mkdirs and its commit)
  * must read as "no data yet", not wedge every subsequent replay on a
  * schema-inference failure. */
class IndexIoSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("absent, footerless, and committed directories") {
    val root = freshDir("graft-indexio")
    val absent = s"$root/never-written"
    assert(IndexIo.tryRead(spark, absent).isEmpty)
    // the crash window: directory created, no parquet committed
    val footerless = s"$root/index"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(footerless))
    assert(IndexIo.tryRead(spark, footerless).isEmpty)
    val fallback = Seq.empty[(String, Long)].toDF("h", "batch")
    val got = IndexIo.readOrElse(spark, footerless)(fallback)
    assert(got.columns.toSeq === Seq("h", "batch") && got.count() === 0L)
    // once data commits, the real frame is returned
    Seq(("x", 0L)).toDF("h", "batch").write.parquet(s"$footerless/batch=0")
    assert(IndexIo.readOrElse(spark, footerless)(fallback).count() === 1L)
  }

  test("OnlineSuffixDedup makes progress when the index dir survived a crashed first write") {
    val root = freshDir("graft-indexio-suffix")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/index"))
    val online = new OnlineSuffixDedup(root, minLen = 10)
    val docs = Seq(
      (1L, "abcdefghijklmnop distinct one"),
      (2L, "abcdefghijklmnop distinct two"))
    online.processBatch(docs.toDF("doc_id", "text"), 0L)
    val out = online.corpus(spark).orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(3) === 0L)  // owner keeps
    assert(out(1).getLong(3) >= 1L)   // same-batch copy cut
  }

  test("OnlineKmv current() skips a footerless newest snapshot for the last committed one") {
    val root = freshDir("graft-indexio-kmv")
    val kmv = new OnlineKmv(root, "v", k = 8)
    kmv.processBatch(Seq("a", "b", "c").toDF("v"), 0L)
    // crash window on the NEXT snapshot: dir exists, nothing committed
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/kmv/batch=1"))
    val cur = kmv.current(spark)
    assert(cur.isDefined)
    assert(cur.get.count() === 3L)
    // and a replay of batch 1 heals it: builds from batch 0, rewrites 1
    kmv.processBatch(Seq("c", "d").toDF("v"), 1L)
    assert(kmv.current(spark).get.count() === 4L)
  }

  test("OnlineSuffixDedup corpus() is empty, not an error, before any commit") {
    val root = freshDir("graft-indexio-empty")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/docs"))
    val online = new OnlineSuffixDedup(root, minLen = 10)
    assert(online.corpus(spark).count() === 0L)
  }
}
