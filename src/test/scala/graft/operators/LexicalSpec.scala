package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Lexical retrieval + LM scoring against hand-computed fixtures (the
  * DuckDB oracle re-checks both at sf0.01; these pin the semantics and
  * the backoff path the self-scoring gate never takes). */
class LexicalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry cherry cherry cherry"),
    (4L, "apple date")).toDF("doc_id", "text")

  test("bm25 ranks the tf-heavy doc first and respects k") {
    val qs = Seq((10L, "apple")).toDF("query_id", "query_text")
    val out = Lexical.bm25TopK(docs, qs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 2) // three docs contain 'apple'; k=2 truncates
    assert(out.map(_._2).toSeq === Seq(1L, 2L))
    // doc 1 (tf=3, len 4) outscores doc 4 (tf=1, len 2)
    assert(out.head._3 === 1L)
    assert(out.head._4 > out(1)._4)
  }

  test("bm25 is a per-term sum: multi-term query unions doc sets") {
    val qs = Seq((1L, "banana date")).toDF("query_id", "query_text")
    val hit = Lexical.bm25TopK(docs, qs, k = 10).collect()
      .map(r => r.getLong(2)).toSet
    assert(hit === Set(1L, 2L, 4L)) // docs containing banana or date
  }

  test("bm25 rarer term carries higher idf weight at equal tf") {
    // 'date' df=1 vs 'banana' df=2; doc 4 and doc 2 have tf=1, len 2
    val qs = Seq((1L, "banana"), (2L, "date")).toDF("query_id", "query_text")
    val byQ = Lexical.bm25TopK(docs, qs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byQ(2L) > byQ(1L))
  }

  test("lm score: seen transitions score c2/c1, fixed point") {
    val fit = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // c1: a=3 b=2 c=1, U=6; bigrams: (a,b)=2 (b,a)=1 (a,c)=1
    val out = Lexical.bigramLmScore(fit, fit).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: p(b|a)=2/3 → 666666, p(a|b)=1/2 → 500000, p(b|a) → 666666
    assert(out(1L) === ((3L, 3L, 666666L + 500000L + 666666L)))
    // doc 2: p(c|a)=1/3 → 333333
    assert(out(2L) === ((1L, 1L, 333333L)))
  }

  test("lm score backs off for unseen bigrams and zeroes unseen words") {
    val fit = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val probe = Seq((9L, "c b"), (8L, "a zz")).toDF("doc_id", "text")
    val out = Lexical.bigramLmScore(fit, probe).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // (c,b) unseen → α·c1(b)/U = (2·1e6·2)/(5·6) = 133333
    assert(out(9L) === ((1L, 0L, 133333L)))
    // (a,zz) unseen and zz not in vocab → 0
    assert(out(8L) === ((1L, 0L, 0L)))
  }

  test("lm score skips docs with fewer than two tokens") {
    val fit = Seq((1L, "a b")).toDF("doc_id", "text")
    val probe = Seq((2L, "a"), (3L, "a b")).toDF("doc_id", "text")
    val ids = Lexical.bigramLmScore(fit, probe).collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L))
  }

  test("hashed tf: same word always lands in one bucket with one sign") {
    val df = Seq((1L, "apple apple banana"), (2L, "apple")).toDF("doc_id", "text")
    val out = Lexical.hashedTfVectors(df, dim = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val appleBuckets = out.keys.filter(_._1 == 2L).map(_._2).toSeq
    assert(appleBuckets.size === 1)
    val b = appleBuckets.head
    val sign = out((2L, b))
    assert(math.abs(sign) === 1L)
    // doc 1 has apple twice: same bucket, 2× the sign (unless banana
    // collides into the same bucket, which this fixture avoids)
    if (!out.keys.exists(k => k._1 == 1L && k._2 != b))
      fail("fixture degenerate: banana collided with apple")
    assert(out((1L, b)) === 2L * sign)
  }

  test("hashed tf buckets stay inside [0, dim)") {
    val out = Lexical.hashedTfVectors(docs, dim = 8).collect()
    assert(out.forall(r => r.getLong(1) >= 0L && r.getLong(1) < 8L))
  }

  test("scores are invariant under input repartitioning") {
    val qs = Seq((1L, "apple banana")).toDF("query_id", "query_text")
    val a = Lexical.bm25TopK(docs, qs, k = 10).collect().toSeq
    val b = Lexical.bm25TopK(docs.repartition(7), qs, k = 10).collect().toSeq
    assert(a === b)
  }

  test("hashedLinearLogit equals the weight-dot-product of hashedTfVectors") {
    val dim = 16
    def w(b: Long): Long = (b * 2654435761L) % 17L - 8L
    val expected = Lexical.hashedTfVectors(docs, dim).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => r.getLong(2) * w(r.getLong(1))).sum
      }
    val got = Lexical.hashedLinearLogit(docs, dim).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, logit) =>
      assert(got(id)._1 === logit, s"doc $id")
      assert(got(id)._2 === (logit > 0L), s"doc $id keep bit")
    }
  }

  test("hashedLinearLogit is invariant under repartitioning") {
    val a = Lexical.hashedLinearLogit(docs, 16).orderBy("doc_id").collect().toSeq
    val b = Lexical.hashedLinearLogit(docs.repartition(5), 16).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
