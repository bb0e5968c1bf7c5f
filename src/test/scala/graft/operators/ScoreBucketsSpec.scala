package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Sampling.scoreBuckets]] — the CCNet head/middle/tail split. */
class ScoreBucketsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("per-group terciles: equal counts, remainder to earlier buckets, order by score") {
    // lang a: 7 docs (3/2/2 split), lang b: 3 docs (1/1/1)
    val docs = ((1 to 7).map(i => ("a", i.toLong, i * 10L)) ++
      (1 to 3).map(i => ("b", 100L + i, 1000L - i))).toDF("lang", "doc_id", "score")
    val out = Sampling.scoreBuckets(docs, Seq("lang"), col("score"), col("doc_id"), 3)
      .select("lang", "doc_id", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a: scores 10..70 asc → docs 1,2,3 bucket 1; 4,5 bucket 2; 6,7 bucket 3
    assert(Seq(1L, 2L, 3L).forall(d => out(("a", d)) === 1L))
    assert(Seq(4L, 5L).forall(d => out(("a", d)) === 2L))
    assert(Seq(6L, 7L).forall(d => out(("a", d)) === 3L))
    // b: scores descend with id → highest id = lowest score = bucket 1
    assert(out(("b", 103L)) === 1L && out(("b", 102L)) === 2L && out(("b", 101L)) === 3L)
  }

  test("ties break deterministically on the tie column") {
    val docs = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L), ("a", 4L, 5L))
      .toDF("lang", "doc_id", "score")
    val out = Sampling.scoreBuckets(docs, Seq("lang"), col("score"), col("doc_id"), 2)
      .select("doc_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("k must be at least 2") {
    intercept[IllegalArgumentException] {
      Sampling.scoreBuckets(Seq(("a", 1L)).toDF("lang", "doc_id"),
        Seq("lang"), col("doc_id"), col("doc_id"), 1)
    }
  }
}
