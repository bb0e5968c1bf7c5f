package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring dedup via distributed suffix ranking
  * ([[SuffixDedup]]): prefix-doubling rank correctness (order-preserving,
  * sentinel-safe at document ends), variable-length span merging, and
  * the ≥-minLen domain boundary. */
class SuffixDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], minLen: Int) =
    SuffixDedup.duplicatedSpans(docs.toDF("doc_id", "text"), minLen = minLen)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("an exact cross-document copy is one maximal full-length span in both docs") {
    val text = "the quick brown fox jumps over the lazy dog"
    val out = spans(Seq((1L, text), (2L, text)), minLen = 10)
    assert(out === Array(
      (1L, 1L, text.length.toLong, text.length.toLong),
      (2L, 1L, text.length.toLong, text.length.toLong)))
  }

  test("variable length falls out of fixed-L ranking: a 17-char shared region, minLen 10") {
    // share exactly 'abcdefghijklmnopq' (17 chars) embedded in noise
    val out = spans(Seq(
      (1L, "xxxxabcdefghijklmnopqyyyyyyy"),
      (2L, "zzzzzzzzabcdefghijklmnopqwww")), minLen = 10)
    assert(out === Array((1L, 5L, 21L, 17L), (2L, 9L, 25L, 17L)))
  }

  test("overlapping repeats inside ONE document merge into a single span") {
    // 'aaaaaaaa': every 4-gram equals every other — positions 1..5 all
    // duplicated, one island, span 1..8
    val out = spans(Seq((1L, "aaaaaaaab")), minLen = 4)
    assert(out === Array((1L, 1L, 8L, 8L)))
  }

  test("a shared region SHORTER than minLen never fires, nor does a shared short tail") {
    val out = spans(Seq(
      (1L, "qqqqsharedzzzz"),   // 'shared' (6) < minLen 10
      (2L, "ppppsharedrrrr"),
      (3L, "uniquetail-common"), // common 7-char tail, still < 10
      (4L, "othertext-common")), minLen = 10)
    assert(out.isEmpty)
  }

  test("suffix ranks are ORDER-preserving over actual prefixes (the suffix-array property)") {
    val docs = Seq((1L, "banana"), (2L, "bandana")).toDF("doc_id", "text")
    val L = 4
    val got = SuffixDedup.suffixRanks(docs, prefixLen = L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val texts = Map(1L -> "banana", 2L -> "bandana")
    val withPrefix = got.map { case (d, pos, rank) =>
      val t = texts(d)
      (t.substring(pos.toInt - 1, math.min(pos.toInt - 1 + L, t.length)), rank)
    }
    // equal prefixes <=> equal ranks; rank order == lexicographic order
    withPrefix.combinations(2).foreach { case Array((pa, ra), (pb, rb)) =>
      assert((pa == pb) === (ra == rb), s"equality drift: $pa/$ra vs $pb/$rb")
      if (pa != pb)
        assert((pa < pb) === (ra < rb), s"order drift: $pa/$ra vs $pb/$rb")
    }
  }

  test("removal keeps the owner's text intact and cuts the copies' covered chars") {
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 40 chars
    // boundary chars DIFFER between the docs (1/2 vs 3/4), so the match
    // is exactly the 40 shared chars — a shared delimiter would extend it
    val out = SuffixDedup.removeDuplicatedSpans(Seq(
        (1L, "OWNER1" + shared + "2END"),
        (2L, "copyA3" + shared + "4tail"),
        (3L, "no duplication in this one at all, stays whole")
      ).toDF("doc_id", "text"), minLen = 20)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // owner (min doc_id) keeps everything
    assert(out(0) === (1L, "OWNER1" + shared + "2END", 0L, 0L))
    // the copy loses the full 40-char shared region (21 flagged 20-windows
    // covering chars 7..46), keeping its unique frame
    assert(out(1)._2 === "copyA3" + "4tail")
    assert(out(1)._3 === 40L && out(1)._4 === 21L)
    // untouched doc passes through
    assert(out(2) === (3L, "no duplication in this one at all, stays whole", 0L, 0L))
  }

  test("cutCovered interval complement matches the position-set reference (r16 rewrite)") {
    // exercises the gaps-and-islands merge directly: overlapping windows,
    // abutting windows (gap 0 chains), a disjoint second island, a
    // fully-covered document, and an untouched document
    import org.apache.spark.sql.functions.col
    val base = Seq(
      (1L, "0123456789" * 6),      // 60 chars, islands [1,25] ∪ [40,49]
      (2L, "a" * 20),              // fully covered
      (3L, "untouched")
    ).toDF("doc_id", "text").select(col("doc_id"), col("text").as("_t"))
    val flagged = Seq(
      (1L, 1L), (1L, 6L), (1L, 16L), // overlap + abut: [1,10]+[6,15]+[16,25] -> [1,25]
      (1L, 40L), (2L, 1L), (2L, 11L)
    ).toDF("doc_id", "pos")
    val out = SuffixDedup.cutCovered(base, flagged, minLen = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // reference: per doc, covered = union of [p, p+9]; kept = complement
    val texts = Map(1L -> "0123456789" * 6, 2L -> "a" * 20, 3L -> "untouched")
    val fl = Map(1L -> Seq(1L, 6L, 16L, 40L), 2L -> Seq(1L, 11L), 3L -> Seq())
    val expected = texts.toSeq.sortBy(_._1).map { case (d, t) =>
      val cov = fl(d).flatMap(p => p to (p + 9)).toSet
      val kept = t.zipWithIndex.collect {
        case (c, i) if !cov(i + 1L) => c
      }.mkString
      (d, kept, cov.size.toLong, fl(d).size.toLong)
    }
    assert(out.toSeq === expected)
  }

  test("within-ONE-document repeats are not cut (cross-document convention, dedupSpans parity)") {
    val rep = "zyxwvutsrqponmlkjihgfedcba" // 26 chars, repeated twice in one doc
    val out = SuffixDedup.removeDuplicatedSpans(
        Seq((7L, rep + "----" + rep)).toDF("doc_id", "text"), minLen = 20)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).head
    assert(out === (rep + "----" + rep, 0L, 0L))
  }

  test("multi-ROUND ranking (L beyond one fan-in round) still finds exact spans") {
    // L=70 needs two tuple rounds from the 8-char seed (8 -> 64 -> 70)
    val shared = (1 to 8).map(i => s"segment$i!").mkString // 72 chars
    val out = spans(Seq(
      (1L, "aaa" + shared + "bbb"),
      (2L, "ccc" + shared + "ddd")), minLen = 70)
    assert(out === Array((1L, 4L, 75L, 72L), (2L, 4L, 75L, 72L)))
  }

  test("matches a brute-force oracle on a randomized corpus") {
    val rnd = new scala.util.Random(1123)
    val alphabet = "ab" // tiny alphabet forces rich accidental repeats
    val L = 6
    val docs = (1L to 8L).map { i =>
      i -> (0 until (20 + rnd.nextInt(30))).map(_ => alphabet(rnd.nextInt(2))).mkString
    }
    val texts = docs.toMap
    // brute force: every L-gram, global multiset, islands merge
    val grams = docs.flatMap { case (d, t) =>
      (1 to t.length - L + 1).map(p => (d, p, t.substring(p - 1, p - 1 + L)))
    }
    val dup = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
    val expected = docs.flatMap { case (d, t) =>
      val marked = (1 to t.length - L + 1)
        .filter(p => dup(t.substring(p - 1, p - 1 + L)))
      // islands
      val runs = marked.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      runs.map { case (s, e) => (d, s.toLong, (e + L - 1).toLong, (e + L - s).toLong) }
    }.sortBy(x => (x._1, x._2))
    assert(spans(docs, minLen = L).toSeq === expected)
  }

  private def lrs(docs: Seq[(Long, String)], prefixLen: Int = 50): (Long, String) = {
    val r = SuffixDedup.longestRepeatedSubstring(
      docs.toDF("doc_id", "text"), prefixLen = prefixLen).head()
    (r.getLong(0), r.getString(1))
  }

  test("longest repeated substring via rank-neighbor LCP: the classic overlapping case") {
    // 'banana': "ana" repeats (overlapping, positions 2 and 4) — the
    // adjacency answer is only right if the ranks ARE the suffix order
    assert(lrs(Seq((1L, "banana"))) === (3L, "ana"))
  }

  test("LRS across documents, and the bounded-L cap") {
    val shared = "abcdefghijklmnop" // 16 chars shared by two docs
    assert(lrs(Seq((1L, "xx" + shared + "yy"), (2L, "zz" + shared + "ww")))
      === (16L, shared))
    // with prefixLen below the true repeat length, the answer caps at L
    assert(lrs(Seq((1L, "xx" + shared + "yy"), (2L, "zz" + shared + "ww")),
      prefixLen = 10) === (10L, shared.take(10)))
  }

  test("LRS tie-break is the lexicographically smallest max-length repeat") {
    // both "xy" and "ab" repeat with length 2; nothing longer repeats
    assert(lrs(Seq((1L, "xy1ab2xy3ab"))) === (2L, "ab"))
  }

  test("a repeat-free corpus answers (0, '') and matches brute force on a random one") {
    assert(lrs(Seq((1L, "abcdefg"), (2L, "hijklmn"))) === (0L, ""))
    // randomized cross-check against driver-side brute force
    val rnd = new scala.util.Random(20260817)
    val docs = (1L to 12L).map(i =>
      i -> (1 to 60).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val grams = for {
      (_, t) <- docs; l <- 1 to t.length; p <- 0 to t.length - l
    } yield t.substring(p, p + l)
    val repeated = grams.groupBy(identity).filter(_._2.size >= 2).keySet
    val expected =
      if (repeated.isEmpty) (0L, "")
      else {
        val maxLen = repeated.map(_.length).max
        (maxLen.toLong, repeated.filter(_.length == maxLen).min)
      }
    assert(lrs(docs, prefixLen = 50) === expected)
  }

  test("a shared region straddling the lead-window block boundary is found exactly (r17)") {
    // the r17 blocked lead window cuts documents into 32768-position
    // blocks with boundary-overlap ghosts; a duplicate placed ACROSS
    // pos 32768 exercises every lead offset through the block seam
    val rnd = new scala.util.Random(42)
    val shared = (1 to 100).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
    val noise = (1 to 33000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val bigDoc = noise.substring(0, 32699) + shared + noise.substring(32799)
    val smallDoc = "x" * 10 + shared + "y" * 10
    val out = spans(Seq((1L, bigDoc), (2L, smallDoc)), minLen = 50)
    assert(out === Array(
      (1L, 32700L, 32799L, 100L),
      (2L, 11L, 110L, 100L)))
  }

  test("empty and NULL documents emit no rank rows from the public suffixRanks surface") {
    // Spark's sequence(1, 0) DESCENDS ([1, 0]) — without the length
    // guard an empty doc emitted bogus pos=1/pos=0 rows at nonexistent
    // positions (r15 advice)
    val docs = (Seq((1L, Some("")), (2L, Some("abcd")), (3L, None))
      : Seq[(Long, Option[String])]).toDF("doc_id", "text")
    val ranks = SuffixDedup.suffixRanks(docs, prefixLen = 2).collect()
    assert(ranks.map(_.getLong(0)).toSet === Set(2L))
    assert(ranks.length === 4) // one row per position of "abcd", nothing else
    assert(ranks.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= 4L))
  }
}
