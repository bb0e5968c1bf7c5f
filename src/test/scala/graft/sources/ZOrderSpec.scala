package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Morton-code correctness and the layout property the curve exists
  * for: files cover disjoint compact Z-intervals, so per-file min/max
  * column stats form small boxes that prune on EITHER dimension. */
class ZOrderSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def code(a: Long, b: Long, bits: Int = 21): Long =
    Seq((a, b)).toDF("a", "b")
      .select(ZOrder.mortonCode(col("a"), col("b"), bits)).head().getLong(0)

  test("morton code interleaves bits: a at even positions, b at odd") {
    // a = 0b101 -> bits at 0 and 4 = 17; b = 0b011 -> bits at 1 and 3 = 10
    assert(code(5L, 3L) === 27L)
    assert(code(0L, 0L) === 0L)
    assert(code(1L, 0L) === 1L)
    assert(code(0L, 1L) === 2L)
    // reference interleave on random values
    val rnd = new scala.util.Random(3)
    (0 until 20).foreach { _ =>
      val a = rnd.nextInt(1 << 21).toLong
      val b = rnd.nextInt(1 << 21).toLong
      val expected = (0 until 21).map { i =>
        (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))
      }.sum
      assert(code(a, b) === expected)
    }
  }

  test("points inside a 2^k-aligned tile share the code's high bits (locality)") {
    // every (x, y) with x, y < 2^k codes below 2^(2k): the tile is one
    // contiguous Z-interval — the property min/max pruning relies on
    for (k <- Seq(3, 8)) {
      val bound = 1L << (2 * k)
      val rnd = new scala.util.Random(k)
      (0 until 30).foreach { _ =>
        val c = code(rnd.nextInt(1 << k).toLong, rnd.nextInt(1 << k).toLong)
        assert(c >= 0L && c < bound)
      }
    }
  }

  test("writeZOrdered: files cover disjoint Z-intervals and round-trip the data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val rnd = new scala.util.Random(7)
    val rows = (0 until 4000).map(i => (i.toLong, rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = rows.toDF("id", "x", "y")
    ZOrder.writeZOrdered(df, s"$dir/z", "x", "y", files = 8, bits = 10)

    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() === 4000L)
    assert(back.select("id").collect().map(_.getLong(0)).toSet === rows.map(_._1).toSet)

    // per-file Z-intervals are disjoint (range partitioning on the code)
    val perFile = back
      .withColumn("f", input_file_name())
      .withColumn("z", ZOrder.mortonCode(col("x"), col("y"), 10))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlapping Z-intervals")
      case _ =>
    }
    // and because intervals are compact, per-file bounding boxes are
    // small: no file spans the whole (x, y) domain on both axes
    val boxes = back
      .withColumn("f", input_file_name())
      .groupBy("f").agg(
        (max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(boxes.count { case (dx, dy) => dx > 900 && dy > 900 } < boxes.length,
      "z-order produced no locality at all")
  }

  test("writeSizeTargeted adapts file count to the size estimate and clamps") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val df = (0 until 10000).map(i => (i.toLong, s"row-$i-${"x" * 50}")).toDF("id", "s")
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes

    // target a quarter of the estimate → expect ~4 files
    val dir1 = java.nio.file.Files.createTempDirectory("szt1").toString
    ZOrder.writeSizeTargeted(df, dir1, targetBytes = (est / 4).toLong.max(1L))
    val files1 = new java.io.File(dir1).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files1 >= 3 && files1 <= 5, s"expected ~4 files, got $files1")
    assert(spark.read.parquet(dir1).count() === 10000L)

    // huge target → exactly one file; tiny target + cap → clamped
    val dir2 = java.nio.file.Files.createTempDirectory("szt2").toString
    ZOrder.writeSizeTargeted(df, dir2, targetBytes = Long.MaxValue)
    assert(new java.io.File(dir2).listFiles().count(_.getName.endsWith(".parquet")) === 1)
    val dir3 = java.nio.file.Files.createTempDirectory("szt3").toString
    ZOrder.writeSizeTargeted(df, dir3, targetBytes = 1L, maxFiles = 7)
    assert(new java.io.File(dir3).listFiles().count(_.getName.endsWith(".parquet")) === 7)
  }
}
