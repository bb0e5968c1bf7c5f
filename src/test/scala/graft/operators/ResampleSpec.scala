package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** locfGrid: dense grid per key, forward fill, deterministic last-obs
  * tiebreak, exact integer bucketing. */
class ResampleSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("fills gaps forward on a dense per-key grid") {
    // key a: obs in buckets 0 and 3 (values 1.0, 4.0); grid 0..3
    // key b: single obs in bucket 5; grid is just 5
    val df = Seq(
      ("a", 5L, 1, 1.0), ("a", 35L, 2, 4.0),
      ("b", 51L, 3, 9.0)
    ).toDF("k", "ts", "id", "v")
    val out = Resample.locfGrid(df, "k", "ts", "v", "id", step = 10L)
      .orderBy("k", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      ("a", 0L, 1.0), ("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 4.0),
      ("b", 5L, 9.0)))
  }

  test("last observation per bucket wins, ties broken by the tie column") {
    val df = Seq(
      ("k", 1L, 1, 10.0), ("k", 9L, 2, 20.0),   // bucket 0 → ts 9 wins
      ("k", 12L, 4, 40.0), ("k", 12L, 3, 30.0)  // bucket 1 tie → id 4 wins
    ).toDF("k", "ts", "v_id", "v")
    val out = Resample.locfGrid(df, "k", "ts", "v", "v_id", step = 10L)
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((0L, 20.0), (1L, 40.0)))
  }

  test("rejects a non-positive step") {
    val df = Seq(("k", 1L, 1, 1.0)).toDF("k", "ts", "id", "v")
    assertThrows[IllegalArgumentException] {
      Resample.locfGrid(df, "k", "ts", "v", "id", step = 0L)
    }
  }
}
