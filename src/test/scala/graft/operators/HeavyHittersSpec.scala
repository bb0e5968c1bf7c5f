package graft.operators

import scala.util.Random

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries sketch-then-recount vs the naive global GROUP BY (which
  * is also what the DuckDB gate runs at sf0.01). */
class HeavyHittersSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(tokens: Seq[String], divisor: Long): Map[String, Long] = {
    val n = tokens.size.toLong
    val threshold = (n + divisor - 1) / divisor
    tokens.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= threshold).toMap
  }

  private def mined(tokens: Seq[String], k: Int, divisor: Long): Map[String, Long] =
    HeavyHitters.frequentTokens(tokens.toDF("word"), "word", k, divisor)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("skewed stream: equals brute force exactly") {
    val rnd = new Random(42)
    // zipf-ish: heavy head + long uniform tail
    val tokens = Seq.fill(2000)(s"hot${rnd.nextInt(5)}") ++
      Seq.fill(3000)(s"cold${rnd.nextInt(1500)}")
    assert(mined(tokens, k = 63, divisor = 50L) === brute(tokens, 50L))
  }

  test("uniform stream: typically empty result, still exact") {
    val rnd = new Random(7)
    val tokens = Seq.fill(4000)(s"w${rnd.nextInt(2000)}")
    assert(mined(tokens, k = 127, divisor = 100L) === brute(tokens, 100L))
  }

  test("result is invariant under repartitioning (mergeable sketch)") {
    val rnd = new Random(11)
    val tokens = Seq.fill(1000)(s"hot${rnd.nextInt(3)}") ++
      Seq.fill(1000)(s"cold${rnd.nextInt(400)}")
    val df = tokens.toDF("word")
    val a = HeavyHitters.frequentTokens(df.repartition(1), "word", 63, 40L)
      .orderBy("word").collect().toSeq
    val b = HeavyHitters.frequentTokens(df.repartition(13), "word", 63, 40L)
      .orderBy("word").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("divisor >= k+1 is rejected (exactness precondition)") {
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentTokens(Seq("x").toDF("word"), "word", k = 9, divisor = 10L)
    }
  }

  test("misra_gries candidates cover everything above N/(k+1) by construction") {
    val rnd = new Random(3)
    val tokens = Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(1200)(s"t${rnd.nextInt(600)}")
    val k = 31
    val cand = tokens.toDF("word")
      .agg(HeavyHitters.misraGries(col("word"), k)).head().getSeq[String](0).toSet
    val n = tokens.size
    val mustSurvive = tokens.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > n.toDouble / (k + 1)).keySet
    assert(mustSurvive.subsetOf(cand))
    assert(cand.size <= k)
  }
}
