package graft.functions

import graft.SparkTestSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom membership expression and the decontamination scale path
  * built on it: no false negatives ever (the property the shared oracle
  * rests on), measured false-positive rate near the configured fpp, and
  * plan-level equality between the Bloom path and the exact broadcast
  * path on a corpus with planted contamination. */
class BloomProbeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("probe finds every inserted value (no false negatives)") {
    val inserted = spark.range(0, 5000).select((col("id") * 2654435761L).as("h"))
    val bf = inserted.stat.bloomFilter("h", 5000, 0.01)
    val misses = inserted
      .filter(!BloomProbe.mightContainLong(bf, col("h"))).count()
    assert(misses === 0)
  }

  test("false-positive rate on disjoint probes is near the configured fpp") {
    val inserted = spark.range(0, 20000).select((col("id") * 2L + 1L).as("h")) // odds
    val bf = inserted.stat.bloomFilter("h", 20000, 0.01)
    val probes = spark.range(0, 20000).select((col("id") * 2L).as("h")) // evens: disjoint
    val hits = probes.filter(BloomProbe.mightContainLong(bf, col("h"))).count()
    // 1% nominal; allow generous slack for the sizing rounding
    assert(hits < 20000 * 0.05, s"fpp too high: $hits / 20000")
  }

  test("probe survives serialization through a shuffle boundary") {
    val inserted = spark.range(0, 1000).select(col("id").as("h"))
    val bf = inserted.stat.bloomFilter("h", 1000, 0.01)
    // force an exchange so the expression (and its filter bytes) ship
    val n = spark.range(0, 2000).select(col("id").as("h"))
      .repartition(4, col("h"))
      .filter(BloomProbe.mightContainLong(bf, col("h")))
      .count()
    assert(n >= 1000 && n < 1100) // all inserted + few false positives
  }

  test("bloomContamination equals the exact broadcast contamination") {
    // 30 base docs of distinct word soup; plant full and partial copies
    val words = (0 until 30).map(i => s"w$i")
    def doc(seed: Int): String =
      (0 until 60).map(j => words((seed * 7 + j * 11) % 30)).mkString(" ")
    val bench = (0 until 10).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val corpus = ((100 until 110).map(i => (i.toLong, doc(i - 100))) ++ // exact copies
      (200 until 230).map(i => (i.toLong, doc(i)))) // unrelated
      .toDF("doc_id", "text")
    val exact = Dedup.contamination(corpus, bench, "text", "doc_id",
      shingleSize = 8, minOverlap = 30)
      .orderBy("corpus_id", "bench_id").collect().map(_.toSeq)
    val bloom = Dedup.bloomContamination(corpus, bench, "text", "doc_id",
      shingleSize = 8, minOverlap = 30)
      .orderBy("corpus_id", "bench_id").collect().map(_.toSeq)
    assert(exact.nonEmpty, "the planted copies must contaminate")
    assert(bloom.toSeq === exact.toSeq)
  }
}
