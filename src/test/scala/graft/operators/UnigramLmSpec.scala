package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer ([[UnigramLm]]): integer-exact Viterbi-EM
  * training, lexicographic-objective segmentation, id serving, and the
  * round-trip law — the reference-free rigor the BPE family carries
  * (`decode(encode(x)) == normalize(x)` pinned by randomized inputs). */
class UnigramLmSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("training keeps every single character (coverage) and scores by Viterbi usage") {
    val docs = docsOf("the cat the cat the", "cat hat the mat", "the the the")
    val pieces = UnigramLm.trainPieces(docs, iters = 2, seedMulti = 8)
    val byPiece = pieces.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every character of the corpus survives
    "thecamt".foreach(c => assert(byPiece.contains(c.toString), s"missing char $c"))
    // 'the' occurs 7x as a full word (3 + 1 + 3) — it must be a
    // surviving piece with usage 7 (Viterbi picks the 1-piece split)
    assert(byPiece.get("the").contains(7L))
    // piece ids are dense 1..n by (score desc, piece asc), 0 reserved
    val ids = pieces.orderBy("piece_id").collect().map(_.getLong(2))
    assert(ids.toSeq === (1L to ids.length).toSeq)
  }

  test("segmentation prefers fewest pieces, then greatest score, deterministically") {
    val pieces = Seq(
      ("abcd", 1L, 1L), ("ab", 50L, 2L), ("cd", 40L, 3L), ("bc", 99L, 4L),
      ("a", 5L, 5L), ("b", 5L, 6L), ("c", 5L, 7L), ("d", 5L, 8L))
      .toDF("piece", "score", "piece_id")
    val seg = UnigramLm.segmentWords(Seq("abcd").toDF("word"), pieces)
      .collect().head
    // 1-piece 'abcd' beats every 2-piece split regardless of scores
    assert(seg.getLong(1) === 1L)
    assert(seg.getString(3) === "abcd")
    // without the whole-word piece: 2-piece ab|cd (score 90) beats
    // a|bc|d (3 pieces, despite bc's 99) — k dominates s
    val seg2 = UnigramLm.segmentWords(Seq("abcd").toDF("word"),
        pieces.filter(col("piece") =!= "abcd"))
      .collect().head
    assert(seg2.getLong(1) === 2L)
    assert(seg2.getString(3) === "ab cd")
  }

  test("score ties break on the lexicographically smallest piece sequence") {
    val pieces = Seq(
      ("ab", 10L, 1L), ("cd", 10L, 2L), ("ac", 10L, 3L),
      ("a", 1L, 4L), ("b", 1L, 5L), ("c", 1L, 6L), ("d", 1L, 7L))
      .toDF("piece", "score", "piece_id")
    // 'abcd': ab|cd (k=2, s=20). No other 2-piece split exists in vocab
    // (a|bcd etc. missing pieces), so construct a REAL tie: 'aab' with
    // pieces aa(5) ab(5) a(5) b(5): aa|b (s=10) vs a|ab (s=10) — both
    // k=2, tie on s; 'a ab' < 'aa b' lexicographically
    val tied = Seq(("aa", 5L, 1L), ("ab", 5L, 2L), ("a", 5L, 3L), ("b", 5L, 4L))
      .toDF("piece", "score", "piece_id")
    val seg = UnigramLm.segmentWords(Seq("aab").toDF("word"), tied).collect().head
    assert(seg.getString(3) === "a ab")
    val seg2 = UnigramLm.segmentWords(Seq("abcd").toDF("word"), pieces).collect().head
    assert(seg2.getString(3) === "ab cd")
  }

  test("round-trip law: decode(encodeIds(x)) == normalized word sequence, randomized, widened domain") {
    val rnd = new scala.util.Random(4217)
    // r16 widened domain: punctuation, digits, a quote-bearing word
    // (the piece-escaping trap), and a backslash-bearing one
    val lexicon = Seq("the", "cat", "sat", "on", "a", "mat", "catsat",
      "zq", "xylophone", "aaaa", "b", "v1.2", "#tag", "c++", "don't",
      "a\\b", "[ok]", "x_9")
    val texts = (0 until 40).map { _ =>
      (0 until (1 + rnd.nextInt(12)))
        .map(_ => lexicon(rnd.nextInt(lexicon.length)))
        .mkString(" ") + (if (rnd.nextBoolean()) ", 42!" else "")
    }
    val docs = docsOf(texts: _*)
    val pieces = UnigramLm.trainPieces(docs, iters = 2, seedMulti = 24)
    val out = UnigramLm.decode(UnigramLm.encodeIds(docs, pieces), pieces)
      .select("doc_id", "decoded_text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val norm = docs.select(col("doc_id"),
        array_join(filter(split(lower(col("text")), "[^!-~]+"),
          w => length(w).between(1, UnigramLm.MaxWordLen)), " ").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    norm.foreach { case (id, expected) =>
      assert(out(id) === expected, s"round trip diverged for doc $id")
    }
  }

  test("full-base-alphabet coverage: corpus-unseen printable symbols still serve (r15 verdict #6)") {
    // train on a TINY pure-letter corpus...
    val pieces = UnigramLm.trainPieces(docsOf("cat cat dog"), iters = 1, seedMulti = 8)
    val byPiece = pieces.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ...every printable non-space non-upper symbol is still a piece
    UnigramLm.BaseAlphabet.foreach(ch =>
      assert(byPiece.contains(ch), s"missing base symbol '$ch'"))
    assert(byPiece("!") === 0L) // unseen symbols enter at score 0
    // and a serving document FULL of unseen symbols round-trips
    val served = docsOf("w0w! #new $5.00 100% a\\b 'q' ~x~")
    val out = UnigramLm.decode(UnigramLm.encodeIds(served, pieces), pieces)
      .select("decoded_text").head().getString(0)
    assert(out === "w0w! #new $5.00 100% a\\b 'q' ~x~")
  }

  test("maxPieceLen is configurable: longer pieces survive and the round trip holds") {
    val docs = docsOf("greeting greeting greeting farewell farewell")
    val pieces6 = UnigramLm.trainPieces(docs, iters = 2, seedMulti = 32,
      maxPieceLen = 6)
    val lens = pieces6.collect().map(_.getString(0).length)
    assert(lens.max === 6, s"no length-6 piece survived: max ${lens.max}")
    // default training caps at 4 on the same corpus
    val pieces4 = UnigramLm.trainPieces(docs, iters = 2, seedMulti = 32)
    assert(pieces4.collect().map(_.getString(0).length).max <= 4)
    // serving at the widened cap segments with the longer pieces and
    // still closes the round trip
    val enc = UnigramLm.encodeIds(docs, pieces6, maxPieceLen = 6)
    val out = UnigramLm.decode(enc, pieces6).select("decoded_text").head().getString(0)
    assert(out === "greeting greeting greeting farewell farewell")
    // fewest-pieces objective: 'greeting' (8 chars) needs only 2 pieces
    val seg = UnigramLm.segmentWords(
      Seq("greeting").toDF("word"), pieces6, maxPieceLen = 6).head()
    assert(seg.getLong(1) === 2L, s"expected 2 pieces: $seg")
  }

  test("encode (piece text) and encodeIds agree on counts; pieces concatenate to the words") {
    val docs = docsOf("the cat sat on the mat", "catsat mat")
    val pieces = UnigramLm.trainPieces(docs, iters = 2, seedMulti = 16)
    val byId = UnigramLm.encode(docs, pieces).orderBy("doc_id").collect()
    val ids = UnigramLm.encodeIds(docs, pieces).orderBy("doc_id").collect()
    byId.zip(ids).foreach { case (a, b) =>
      assert(a.getLong(a.fieldIndex("n_words")) === b.getLong(b.fieldIndex("n_words")))
      assert(a.getLong(a.fieldIndex("n_tokens")) === b.getLong(b.fieldIndex("n_tokens")))
      // stripping the piece separators reproduces the word sequence
      val joined = a.getString(a.fieldIndex("tokens_text"))
      assert(joined.replace(" ", "").nonEmpty)
    }
    val row0 = byId(0)
    val rebuilt = row0.getString(row0.fieldIndex("tokens_text")).replace(" ", "")
    assert(rebuilt === "thecatsatonthemat")
  }

  test("an unknown token id nulls the decoded text loudly") {
    val pieces = Seq(("a", 1L, 1L), ("b", 1L, 2L)).toDF("piece", "score", "piece_id")
    val df = Seq((1L, Seq(1L, 0L, 2L)), (2L, Seq(1L, 777L))).toDF("doc_id", "token_ids")
    val out = UnigramLm.decode(df, pieces).orderBy("doc_id")
      .select("decoded_text").collect()
    assert(out(0).getString(0) === "a b")
    assert(out(1).isNullAt(0))
  }

  test("n_tokens counts real pieces only; separators ride token_ids") {
    val docs = docsOf("the cat", "the")
    val pieces = UnigramLm.trainPieces(docs, iters = 1, seedMulti = 8)
    val enc = UnigramLm.encodeIds(docs, pieces).orderBy("doc_id").collect()
    val row0 = enc(0)
    val ids0 = row0.getSeq[Long](row0.fieldIndex("token_ids"))
    assert(ids0.count(_ == 0L) === row0.getLong(row0.fieldIndex("n_words")).toInt - 1)
    assert(ids0.count(_ != 0L) === row0.getLong(row0.fieldIndex("n_tokens")).toInt)
  }
}
