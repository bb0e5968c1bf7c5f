package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Stats.distributedNtile]] must be bit-identical to the windowed
  * `ntile` it replaces — the contract that let the rfm/equi-depth/
  * calibration gate sites swap onto the distributed path without a hash
  * change. Fixtures force rows to SPAN range partitions (many more rows
  * than shuffle partitions would be the real regime; here the session's
  * partition count exceeds tiny group sizes, so slices of one group land
  * in different physical partitions — exactly the offset-stitching the
  * operator must get right). */
class DistributedNtileSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def windowed(
      df: org.apache.spark.sql.DataFrame, tiles: Int,
      partitionCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column]) =
    df.withColumn("expected",
      ntile(tiles).over(
        Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*))
        .cast("long"))

  private def check(
      df: org.apache.spark.sql.DataFrame, tiles: Int,
      partitionCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column]): Unit = {
    val got = Stats.distributedNtile(df, tiles, partitionCols, orderCols, "got")
    val joined = windowed(df, tiles, partitionCols, orderCols)
      .join(got, df.columns.toSeq)
    assert(joined.count() === df.count(), "join lost or duplicated rows")
    val mismatches = joined.filter(col("expected") =!= col("got")).collect()
    assert(mismatches.isEmpty,
      s"ntile mismatch (tiles=$tiles):\n${mismatches.mkString("\n")}")
  }

  test("global total order matches ntile, uneven remainder") {
    // 103 rows, 5 tiles: first 3 buckets get 21, the rest 20
    val df = (1 to 103).map(i => (i.toLong, (i * 37 % 101).toLong))
      .toDF("id", "v")
    check(df, 5, Nil, Seq(col("v"), col("id")))
  }

  test("grouped, uneven group sizes including n < tiles") {
    val rows =
      (1 to 23).map(i => ("a", i.toLong, (i * 13 % 29).toLong)) ++
        (1 to 7).map(i => ("b", i.toLong, (100 - i).toLong)) ++
        (1 to 2).map(i => ("c", i.toLong, i.toLong)) // n=2 < tiles=4
    val df = rows.toDF("g", "id", "v")
    check(df, 4, Seq("g"), Seq(col("v"), col("id")))
  }

  test("n < tiles globally: each row its own bucket by rank") {
    val df = Seq((1L, 10L), (2L, 5L), (3L, 7L)).toDF("id", "v")
    check(df, 10, Nil, Seq(col("v"), col("id")))
  }

  test("exact multiples: every bucket equal size") {
    val df = (1 to 40).map(i => (i.toLong, (41 - i).toLong)).toDF("id", "v")
    check(df, 8, Nil, Seq(col("v"), col("id")))
  }

  test("NULL group key is its own partition, not silently dropped") {
    // the windowed ntile keeps NULL as a partition of its own; the
    // distributed twin must too (r13 advice: the offsets join was a
    // null-unsafe usingColumns equi-join and lost these rows)
    val rows =
      (1 to 11).map(i => (Some("a"), i.toLong, (i * 13 % 29).toLong)) ++
        (1 to 9).map(i => (Option.empty[String], i.toLong, (90 - i).toLong))
    val df = rows.toDF("g", "id", "v")
    val got = Stats.distributedNtile(df, 3, Seq("g"), Seq(col("v"), col("id")), "got")
    assert(got.count() === df.count(), "null-group rows were dropped")
    // compare driver-side: the spec's own join would be null-unsafe too
    val expected = windowed(df, 3, Seq("g"), Seq(col("v"), col("id")))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) -> r.getLong(3)).toMap
    val actual = got
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) -> r.getLong(3)).toMap
    assert(actual === expected)
  }

  test("decimal order column (the rfm monetary path)") {
    val df = (1 to 31)
      .map(i => (i.toLong, BigDecimal(i * 7 % 17) + BigDecimal("0.25")))
      .toDF("id", "m")
      .select(col("id"), col("m").cast("decimal(30,6)").as("m"))
    check(df, 5, Nil, Seq(col("m"), col("id")))
  }

  test("rename-prefix freshness: adversarial column names don't collide (r14/r15 advice)") {
    // a partition column named "ff" made the old "_o" prefix produce
    // "_off" (ambiguous with the offsets frame's own value column);
    // value columns literally NAMED _off/_n/_ntile_o_off stress the
    // escalating-underscore freshness search over keys AND values
    val df = (1 to 24)
      .map(i => (s"g${i % 2}", i.toLong, (i * 13 % 7).toLong, i.toLong, i.toLong))
      .toDF("ff", "id", "v", "_off", "_ntile_o_off")
    check(df, 4, Seq("ff"), Seq(col("v"), col("id")))
  }
}
