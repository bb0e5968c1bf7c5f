package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** MERGE semantics: update wins, delete drops, insert lands, untouched
  * rows carry; change-log dedupe is latest-wins deterministic. */
class MergeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "bal")

  test("upsert: update, delete, insert, carry") {
    val updates = Seq(
      (2L, "b2", 21.0, false), // update
      (3L, "ignored", 0.0, true), // delete
      (9L, "new", 90.0, false) // insert
    ).toDF("k", "name", "bal", "del")
    val out = Merge.upsert(base, updates, Seq("k"), deleteCol = Some("del"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0), (9L, "new", 90.0)))
  }

  test("upsert with a partial-column change set leaves other columns intact") {
    val updates = Seq((1L, 11.0), (9L, 99.0)).toDF("k", "bal")
    val out = Merge.upsert(base, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (1L, Some("a"), 11.0), (2L, Some("b"), 20.0), (3L, Some("c"), 30.0),
      (4L, Some("d"), 40.0), (9L, None, 99.0)))
  }

  test("dedupeChanges keeps the greatest (version, tie) row per key") {
    val log = Seq(
      (1L, 1L, 1, 100.0), (1L, 3L, 1, 300.0), (1L, 3L, 2, 301.0), (2L, 1L, 1, 200.0)
    ).toDF("k", "ver", "seq", "bal")
    val out = Merge.dedupeChanges(log, Seq("k"), "ver", "seq")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 301.0), (2L, 200.0)))
  }

  test("maintainAgg merged rollup equals the full recompute") {
    import org.apache.spark.sql.functions._
    val all = Seq(
      ("a", 1L, 10L), ("a", 1L, 20L), ("b", 1L, 5L),
      ("a", 2L, 7L), ("c", 2L, 9L), ("b", 2L, 11L))
      .toDF("k", "batch", "x")
    val baseAgg = all.filter(col("batch") === 1L)
      .groupBy("k").agg(sum(col("x")).as("x"), count(lit(1)).as("n"))
    val maintained = Merge.maintainAgg(
        baseAgg, all.filter(col("batch") === 2L), Seq("k"), Seq("x"), "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = all.groupBy("k").agg(sum(col("x")).as("x"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained === full)
    assert(maintained === Set(("a", 37L, 3L), ("b", 16L, 2L), ("c", 9L, 1L)))
  }

  test("maintainAgg brings new keys in and leaves untouched keys exact") {
    import org.apache.spark.sql.functions._
    val baseAgg = Seq(("x", 100L, 4L)).toDF("k", "v", "n")
    val delta = Seq(("y", 1L), ("y", 2L)).toDF("k", "v")
    val out = Merge.maintainAgg(baseAgg, delta, Seq("k"), Seq("v"), "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(("x", 100L, 4L), ("y", 3L, 2L)))
  }
}
