package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** RRF fusion semantics ([[Retrieval.rrfFuse]]): the SIGIR'09 formula in
  * integer fixed point — contribution floor(10^12/(K+rank)) per list,
  * absent documents contribute nothing, ties break on doc id. */
class RetrievalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fp(rank: Long, k: Long = 60L): Long = Retrieval.RrfScale / (k + rank)

  test("fuses two lists with the fixed-point RRF formula") {
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 20L, 1L), (1L, 40L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, vec), rrfK = 60, topK = 10)
      .orderBy("rank")
      .as[(Long, Long, Long, Long)].collect()

    // doc 20 appears in both lists (ranks 2 and 1) and must win; then
    // 10 (fp(1)), then 40 (fp(2)) above 30 (fp(3))
    out.map(_._3).toSeq shouldBe Seq(20L, 10L, 40L, 30L)
    val byDoc = out.map(r => r._3 -> r._4).toMap
    byDoc(20L) shouldBe fp(2) + fp(1)
    byDoc(10L) shouldBe fp(1)
    byDoc(30L) shouldBe fp(3)
    byDoc(40L) shouldBe fp(2)
    out.map(_._2).toSeq shouldBe Seq(1L, 2L, 3L, 4L)
  }

  test("equal fused scores tie-break on doc id; topK truncates") {
    // two docs each rank 1 in exactly one list ⇒ identical scores
    val a = Seq((9L, 5L, 1L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((9L, 3L, 1L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), topK = 1)
      .as[(Long, Long, Long, Long)].collect()
    out.length shouldBe 1
    out.head._3 shouldBe 3L // lower doc id wins the tie at rank 1
  }

  test("queries fuse independently") {
    val lists = Seq(
      Seq((1L, 10L, 1L), (2L, 99L, 1L)).toDF("query_id", "doc_id", "rank"))
    val out = Retrieval.rrfFuse(lists, topK = 5)
      .orderBy("query_id").as[(Long, Long, Long, Long)].collect()
    out.map(r => (r._1, r._2, r._3)).toSeq shouldBe Seq((1L, 1L, 10L), (2L, 1L, 99L))
  }

  test("rankingOverlap counts per-query intersections, keeps zero-overlap and short lists") {
    // q1: a={1,2,3}, b={2,3,9} → 2 common; q2: disjoint → 0 common;
    // q3: a has only 2 candidates (short list), both kept by b
    // rank 4 rows must be cut by k=3 before any counting
    val a = Seq(
      (1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L), (1L, 99L, 4L),
      (2L, 10L, 1L), (3L, 7L, 1L), (3L, 8L, 2L)
    ).toDF("query_id", "neighbor_id", "rank")
    val b = Seq(
      (1L, 2L, 1L), (1L, 3L, 2L), (1L, 9L, 3L),
      (2L, 11L, 1L), (3L, 8L, 1L), (3L, 7L, 2L), (3L, 99L, 3L)
    ).toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.rankingOverlap(a, b, k = 3)
      .orderBy("query_id").as[(Long, Long, Long, Long)].collect()
    out.toSeq shouldBe Seq(
      (1L, 3L, 3L, 2L),
      (2L, 1L, 1L, 0L), // zero overlap still emits a row
      (3L, 2L, 3L, 2L)) // short exact list: n_a = 2 < k
  }

  test("relevanceEval: n_rel, first rank, floor-ppm RR, and hit flag per query") {
    val ranking = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 11L, 1L), (2L, 21L, 2L),
      (3L, 12L, 1L)).toDF("query_id", "neighbor_id", "rank")
    val qrels = Seq((1L, 20L), (1L, 30L), (2L, 99L))
      .toDF("query_id", "neighbor_id")
    val out = Retrieval.relevanceEval(ranking, qrels, k = 2)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // q1: top-2 {10,20} vs rels {20,30} -> one hit at rank 2 (30 is cut)
    // q2: its only rel (99) never retrieved; q3: no rels at all
    out shouldBe Seq(
      (1L, 1L, 2L, 500000L, 1L),
      (2L, 0L, 0L, 0L, 0L),
      (3L, 0L, 0L, 0L, 0L))
  }

  test("relevanceEval: rank-1 hit gives rr_ppm = 10^6; duplicate qrels don't double-count") {
    val ranking = Seq((7L, 5L, 1L), (7L, 6L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val qrels = Seq((7L, 5L), (7L, 5L), (7L, 6L)).toDF("query_id", "neighbor_id")
    val out = Retrieval.relevanceEval(ranking, qrels, k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq((7L, 2L, 1L, 1000000L, 1L))
  }

  test("relevanceEval: a query universe scores zero-result queries as 0, not missing") {
    val ranking = Seq((1L, 10L, 1L)).toDF("query_id", "neighbor_id", "rank")
    val qrels = Seq((1L, 10L), (2L, 20L)).toDF("query_id", "neighbor_id")
    val universe = Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("query_id")
    val out = Retrieval.relevanceEval(ranking, qrels, k = 5,
        queries = Some(universe))
      .orderBy("query_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // query 2 retrieved nothing, query 3 has no rels: both emit zero rows
    out shouldBe Seq(
      (1L, 1L, 1L, 1000000L, 1L),
      (2L, 0L, 0L, 0L, 0L),
      (3L, 0L, 0L, 0L, 0L))
  }
}
