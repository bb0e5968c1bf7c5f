package graft.functions

import graft.SparkTestSession
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The deflate-length expression and its golden gate: behavioral
  * properties of the signal (repetition compresses, noise doesn't),
  * agreement with a direct java.util.zip reference, and the committed
  * golden CSV's consistency with the live zlib — the value check behind
  * the `compression_signal` gate's read_csv oracle. */
class CompressSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def lenOf(text: String): Long =
    Seq(text).toDF("t").select(Compress.deflateLen(col("t"))).as[Long].collect().head

  test("matches a direct Deflater reference computation") {
    val texts = Seq("", "a", "hello world", "abc" * 1000,
      (0 until 500).map(i => s"w${i * 7919 % 997}").mkString(" "))
    for (t <- texts) {
      val d = new java.util.zip.Deflater(Compress.Level, true)
      d.setInput(t.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var expect = 0L
      while (!d.finished()) expect += d.deflate(buf)
      d.end()
      assert(lenOf(t) === expect, s"mismatch for ${t.take(20)}...")
    }
  }

  test("repetitive text compresses far below varied text of equal length") {
    val repetitive = "spam " * 2000                      // 10000 chars
    val varied = (0 until 2000).map(i => f"${i * 2654435761L % 99999}%04d").mkString(" ")
    val lr = lenOf(repetitive)
    val lv = lenOf(varied.take(10000))
    assert(lr < lv / 5, s"repetitive $lr should be far below varied $lv")
  }

  test("ratio is scale-stable: doubling repetitive text barely grows the deflate") {
    val once = lenOf("pattern " * 500)
    val twice = lenOf("pattern " * 1000)
    assert(twice < once * 2, "repeating content must not double the compressed size")
  }

  test("null text yields null, empty text yields the empty-stream size") {
    val r = Seq((1L, Option("x")), (2L, Option.empty[String]), (3L, Option("")))
      .toDF("id", "t")
      .select(col("id"), Compress.deflateLen(col("t")).as("l"))
      .orderBy("id").collect()
    assert(!r(0).isNullAt(1))
    assert(r(1).isNullAt(1))
    assert(r(2).getLong(1) >= 0L)
  }

  test("committed golden CSV matches the live zlib at sf0.01") {
    val golden = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/compression_golden.csv"))
      .getLines().drop(1).map { line =>
        val Array(id, nb, dl) = line.split(",")
        id.toLong -> ((nb.toLong, dl.toLong))
      }.toMap
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val actual = TextAnalysis.compressionStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(actual.size === golden.size)
    assert(actual === golden)
  }
}
