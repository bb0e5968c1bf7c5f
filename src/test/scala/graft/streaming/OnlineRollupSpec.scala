package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming rollup maintenance: every micro-batch folds into the
  * standing aggregate without rescanning history, replays rewrite the
  * same snapshot, and the maintained state always equals the full
  * recompute over everything ingested. */
class OnlineRollupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("online-rollup").toString

  private def snap(r: OnlineRollup): Map[String, (Long, Long)] =
    r.current(spark).get.collect()
      .map(row => row.getString(0) -> ((row.getLong(1), row.getLong(2)))).toMap

  test("maintained snapshot equals the full recompute after every batch") {
    val rollup = new OnlineRollup(freshDir(), Seq("k"), Seq("v"), "n")
    def df(rows: (String, Long)*) = rows.toDF("k", "v")

    rollup.processBatch(df("a" -> 10L, "a" -> 5L, "b" -> 1L), 0L)
    assert(snap(rollup) === Map("a" -> ((15L, 2L)), "b" -> ((1L, 1L))))

    rollup.processBatch(df("b" -> 2L, "c" -> 7L), 1L)
    assert(snap(rollup) === Map(
      "a" -> ((15L, 2L)), "b" -> ((3L, 2L)), "c" -> ((7L, 1L))))

    rollup.processBatch(df("a" -> 1L), 2L)
    assert(snap(rollup) === Map(
      "a" -> ((16L, 3L)), "b" -> ((3L, 2L)), "c" -> ((7L, 1L))))
  }

  test("replaying a micro-batch rewrites the same snapshot, never double-adds") {
    val rollup = new OnlineRollup(freshDir(), Seq("k"), Seq("v"), "n")
    def df(rows: (String, Long)*) = rows.toDF("k", "v")

    rollup.processBatch(df("a" -> 10L), 0L)
    rollup.processBatch(df("a" -> 1L, "b" -> 2L), 1L)
    val before = snap(rollup)
    // at-least-once: the engine re-delivers batch 1 verbatim
    rollup.processBatch(df("a" -> 1L, "b" -> 2L), 1L)
    assert(snap(rollup) === before)
    assert(before === Map("a" -> ((11L, 2L)), "b" -> ((2L, 1L))))
  }

  test("current() is None before any batch lands") {
    val rollup = new OnlineRollup(freshDir(), Seq("k"), Seq("v"), "n")
    assert(rollup.current(spark).isEmpty)
  }
}
