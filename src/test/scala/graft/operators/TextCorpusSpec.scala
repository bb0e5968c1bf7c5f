package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The corpus-level text operators against hand-computed fixtures (the
  * DuckDB oracle re-checks them at sf0.01; these pin the semantics with
  * inputs small enough to verify by eye). */
class TextCorpusSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("normalization canonicalizes case, punctuation, and whitespace") {
    val df = Seq(
      (1L, "Foo, bar!"),
      (2L, "foo bar"),
      (3L, "FOO   BAR"),
      (4L, "unrelated")).toDF("doc_id", "text")
    val out = TextCorpus.normalizeDocs(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // the three spellings collide post-normalization
    assert(out(1L) === out(2L))
    assert(out(2L) === out(3L))
    assert(out(1L) !== out(4L))
    assert(out(1L)._2 === 2L) // "foo bar" → 2 words
  }

  test("corpus diff classifies added, removed, and changed; drops unchanged") {
    val old = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val nw = Seq((2L, "y"), (3L, "zz"), (4L, "w")).toDF("doc_id", "text")
    val out = TextCorpus.corpusDiff(old, nw).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("repetition stats count total, distinct, and top word") {
    val df = Seq(
      (1L, "a a a b c"), // 5 words, 3 distinct, top 'a' ×3
      (2L, "x y z"), // no repetition
      (3L, "w w")).toDF("doc_id", "text")
    val out = TextCorpus.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((5L, 3L, 3L)))
    assert(out(2L) === ((3L, 3L, 1L)))
    assert(out(3L) === ((2L, 1L, 2L)))
  }

  test("top n-grams count across documents with deterministic ties") {
    val df = Seq(
      (1L, "a b a b"), // "a b"×2, "b a"×1
      (2L, "a b c"), // "a b", "b c"
      (3L, "solo")).toDF("doc_id", "text") // <2 words: no grams
    val out = TextCorpus.topNgrams(df, n = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.head === (("a b", 3L)))
    assert(out.toMap === Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
    // ties sort by gram text
    assert(out.map(_._1).toSeq === Seq("a b", "b a", "b c"))
  }

  test("source overlap counts shared exact texts per source pair") {
    val df = Seq(
      ("same text", "s1"), ("same text", "s2"), ("same text", "s3"),
      ("other", "s1"), ("other", "s2"),
      ("only in s1", "s1"),
      ("same text", "s1") // duplicate within s1: distinct() collapses it
    ).toDF("text", "source")
    val out = TextCorpus.sourceOverlap(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("s1", "s2") -> 2L, // same text + other
      ("s1", "s3") -> 1L,
      ("s2", "s3") -> 1L))
  }

  test("quality filter flags language, quality, and repetition independently") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val flags = TextCorpus.qualityFlags(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(flags.size === docs.count())
    // keep ⇔ flags == 0, always
    flags.values.foreach { case (f, keep) => assert(keep === (f == 0)) }
    // the synthetic corpus is in-language and non-degenerate: most keeps
    assert(flags.values.count(_._2) > flags.size / 2)

    // a degenerate doc (one word repeated) must flag repetition (bit 4)
    val bad = Seq((9001L, ("spam " * 50).trim, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val badFlags = TextCorpus.qualityFlags(bad).collect().head
    assert((badFlags.getInt(1) & 4) === 4, s"repetition not flagged: $badFlags")
  }

  test("normalization is idempotent (property)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val once = TextCorpus.normalizeDocs(docs)
    val twice = TextCorpus.normalizeDocs(
      docs.select(col("doc_id"), TextCorpus.normalized(col("text")).as("text")))
    assert(once.collect().toSeq.sortBy(_.getLong(0)) ===
      twice.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("connected components: min label propagates across chains and merges clusters") {
    // 1-2-3-4 chain (pairs only adjacent), {10,11,12} clique, isolated pair {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("near-dup groups: pairs become transitive clusters with min-id survivors") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(30)
    // x, exact copy x+1000, truncated near-copy x+2000: 3-clusters
    val corpus = docs
      .unionAll(docs.select((col("doc_id") + 1000).as("doc_id"), col("text")))
      .unionAll(docs.select((col("doc_id") + 2000).as("doc_id"),
        col("text").substr(lit(9), lit(1000000)).as("text")))
    val groups = Dedup.nearDupGroups(corpus, "text", "doc_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // base docs can near-dup EACH OTHER at 0.5 (synthetic word soup), so
    // assert cluster co-membership, not exact survivor ids: each family
    // {x, x+1000, x+2000} shares one group whose id is a base doc ≤ x
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { x =>
      assert(groups.contains(x), s"base doc $x must appear (its copy pairs with it)")
      assert(groups(x + 1000) === groups(x), s"exact copy of $x must join $x's group")
      assert(groups(x + 2000) === groups(x), s"near copy of $x must join $x's group")
      assert(groups(x) <= x, "group id must be the min reachable id")
    }
  }

  test("sharded shuffle: deterministic, dense per-shard positions, salt re-deals") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextCorpus.shardedShuffle(docs, shards = 4, salt = "e0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = TextCorpus.shardedShuffle(docs, shards = 4, salt = "e0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sorted.toSeq === b.sorted.toSeq, "same salt must be bit-deterministic")

    val n = docs.count()
    assert(a.length === n)
    assert(a.forall { case (_, s, _) => s >= 0 && s < 4 })
    // positions are dense 1..|shard| within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length.toLong))
    }
    // a different salt re-deals the order (at least one doc moves)
    val c = TextCorpus.shardedShuffle(docs, shards = 4, salt = "e1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sorted.toSeq !== c.sorted.toSeq)
  }

  test("span dedup strips duplicated spans everywhere but the owner doc") {
    val df = Seq(
      (1L, "a b c d e"), // owner of every duplicated span
      (2L, "x y a b c d q"), // shares "a b c" and "b c d" mid-document
      (3L, "a b c d e"), // exact copy: loses everything
      (4L, "p q") // shorter than n: untouched
    ).toDF("doc_id", "text")
    val out = TextCorpus.dedupSpans(df, n = 3, minDocs = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("a b c d e", 0L, 0L)), "min-id owner keeps its copy")
    // doc 2: spans "a b c"@2 and "b c d"@3 are duplicated → positions
    // {2,3,4,5} covered ONCE despite the overlap; "x y … q" survives
    assert(out(2L) === (("x y q", 4L, 2L)))
    assert(out(3L) === (("", 5L, 3L)), "whole-doc duplicate strips to empty")
    assert(out(4L) === (("p q", 0L, 0L)), "docs below n words have no spans")
  }

  test("vocabulary fit assigns dense ids by frequency with alphabetic ties") {
    val df = Seq((1L, "a a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val vocab = TextCorpus.buildVocab(df, vocabSize = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // a×3 → 0, b×2 → 1, then the c/d tie breaks alphabetically: c → 2
    assert(vocab.toSeq === Seq((0L, "a", 3L), (1L, "b", 2L), (2L, "c", 1L)))
  }

  test("encoding maps words to vocab ids in document order, OOV to -1") {
    val df = Seq((1L, "a a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val vocab = TextCorpus.buildVocab(df, vocabSize = 3)
    val out = TextCorpus.encodeDocs(df, vocab).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((4L, 0L, "0 0 1 2")))
    assert(out(2L) === ((3L, 1L, "0 1 -1"))) // d is out of vocabulary
  }

  test("span dedup ignores spans repeated only within one document") {
    val df = Seq(
      (1L, "a b c a b c a b c"), // internal repetition only
      (2L, "u v w x y z")
    ).toDF("doc_id", "text")
    val out = TextCorpus.dedupSpans(df, n = 3, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a b c a b c a b c",
      "minDocs counts DISTINCT documents, not occurrences")
    assert(out(2L) === "u v w x y z")
  }

  // --- dedupParagraphs ---

  test("paragraph dedup keeps the first occurrence in order") {
    val docs = Seq((1L, "a\nb\na\nc\nb\na")).toDF("doc_id", "text")
    val r = TextCorpus.dedupParagraphs(docs).collect().head
    assert(r.getString(1) === "a\nb\nc")
    assert(r.getLong(2) === 3L)
  }

  test("paragraph dedup passes unique-paragraph and separator-free docs through") {
    val docs = Seq(
      (1L, "x\ny\nz"),
      (2L, "no separators here")).toDF("doc_id", "text")
    val out = TextCorpus.dedupParagraphs(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("x\ny\nz", 0L)))
    assert(out(2L) === (("no separators here", 0L)))
  }

  test("paragraph dedup never mixes content across documents") {
    val docs = Seq((1L, "shared\nown1"), (2L, "shared\nown2")).toDF("doc_id", "text")
    val out = TextCorpus.dedupParagraphs(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'shared' appears in both docs but each keeps its own copy
    assert(out(1L) === "shared\nown1")
    assert(out(2L) === "shared\nown2")
  }

  test("paragraph dedup treats regex metacharacters in the separator literally") {
    val docs = Seq((1L, "a||b||a")).toDF("doc_id", "text")
    val r = TextCorpus.dedupParagraphs(docs, sep = "||").collect().head
    assert(r.getString(1) === "a||b")
    assert(r.getLong(2) === 1L)
  }

  // --- cdcChunks ---

  test("cdc chunks concatenate back to the document, in order") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val rebuilt = TextCorpus.cdcChunks(docs)
      .orderBy("doc_id", "chunk_idx")
      .groupBy("doc_id").agg(concat_ws("", collect_list("chunk_text")).as("joined"))
    val bad = rebuilt.join(docs, "doc_id")
      .filter(col("joined") =!= col("text")).count()
    assert(bad === 0L, "chunking must partition the text exactly")
  }

  test("cdc chunk boundaries re-align after an insertion (shift resistance)") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(20).collect().map(_.getString(1)).mkString(" ")
    val docs = Seq((1L, base), (2L, "an inserted prefix that shifts every offset " + base))
      .toDF("doc_id", "text")
    val chunks = TextCorpus.cdcChunks(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(3)).toSet).toMap
    val shared = chunks(1L).intersect(chunks(2L))
    assert(chunks(1L).size > 3, s"expected several chunks, got ${chunks(1L).size}")
    assert(shared.size >= chunks(1L).size / 2,
      s"boundaries did not re-align: only ${shared.size} of ${chunks(1L).size} chunks shared")
    // a fixed-width chunker shares nothing after the shift — prove the contrast
    val fixedA = base.grouped(64).toSet
    val fixedB = ("an inserted prefix that shifts every offset " + base).grouped(64).toSet
    assert(fixedA.intersect(fixedB).size < shared.size)
  }

  test("cdc native cut starts are bit-identical to the HOF/oracle formulation") {
    // the replaced formulation, kept as the executable reference (this is
    // also exactly what the DuckDB oracle computes)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(200)
      .unionAll(Seq((90001L, "tiny"), (90002L, ""), (90003L, "exactly8"),
        (90004L, "uniécode café text with some length to it padded out"))
        .toDF("doc_id", "text"))
    val text = col("text")
    val n = length(text)
    val positions = when(n >= 8, sequence(lit(1), n - 8 + 1))
      .otherwise(array().cast("array<int>"))
    def isCut(i: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(md5(text.substr(i, lit(8))), 1, 8), 16, 10)
        .cast("long") % 64 === 0
    val hof = concat(array(lit(1)), filter(positions, i => i > 1 && isCut(i)))
    val bad = docs.select(
        graft.functions.TextHash.cdcCutStarts(text, 8, 64).as("native"),
        hof.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(bad === 0L, "native cut starts must equal the HOF formulation")
  }

  test("cdc chunks: short and sub-gram documents are a single whole-text chunk") {
    val docs = Seq((1L, "tiny"), (2L, "")).toDF("doc_id", "text")
    val out = TextCorpus.cdcChunks(docs).collect()
    assert(out.length === 2)
    assert(out.forall(r => r.getLong(1) === 0L && r.getLong(2) === 1L))
    assert(out.map(r => r.getLong(0) -> r.getString(3)).toMap === Map(1L -> "tiny", 2L -> ""))
  }

  // --- corpusReport ---

  test("corpus report aggregates volumes, dups, and language mode per source") {
    val docs = Seq(
      (1L, "a b c", "en", "web"),
      (2L, "d e", "en", "web"),
      (3L, "a b c", "de", "web"),   // corpus-wide dup of doc 1
      (4L, "x y z w", "fr", "books"),
      (5L, "a b c", "fr", "books")) // dup of docs 1 and 3, other source
      .toDF("doc_id", "text", "lang", "source")
    val out = TextCorpus.corpusReport(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val web = out("web")
    assert(web.getLong(1) === 3L)           // n_docs
    assert(web.getLong(2) === 8L)           // total_tokens 3+2+3
    assert(web.getLong(4) === 2L)           // docs 1 and 3 are dup members
    assert(web.getLong(5) === 2L)           // en, de
    assert(web.getString(6) === "en")       // mode: en has 2
    val books = out("books")
    assert(books.getLong(4) === 1L)         // doc 5 duplicates a web text
    assert(books.getString(6) === "fr")
  }

  test("corpus report language-mode ties break to the first lang; no dups is zero") {
    val docs = Seq(
      (1L, "unique one", "en", "s"),
      (2L, "unique two", "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextCorpus.corpusReport(docs).collect().head
    assert(r.getLong(4) === 0L)
    assert(r.getString(6) === "de")
  }

  // --- chunkWindows ---

  test("chunk windows advance by stride and overlap") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextCorpus.chunkWindows(docs, windowSize = 4, stride = 2)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.head.getString(2) === "w1 w2 w3 w4")
    assert(out(1).getString(2) === "w3 w4 w5 w6")
    assert(out.last.getString(2) === "w7 w8 w9 w10")
    assert(out.forall(_.getLong(3) === 4L))
  }

  test("chunk windows cover every token with a short tail when needed") {
    val docs = Seq((1L, (1 to 7).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextCorpus.chunkWindows(docs, windowSize = 4, stride = 4)
      .orderBy("chunk_idx").collect()
    assert(out.length === 2)
    assert(out.last.getString(2) === "w5 w6 w7")
    assert(out.last.getLong(3) === 3L)
  }

  test("short documents yield exactly one chunk") {
    val docs = Seq((1L, "a b c"), (2L, "only")).toDF("doc_id", "text")
    val out = TextCorpus.chunkWindows(docs, windowSize = 8, stride = 4).collect()
    assert(out.length === 2)
    assert(out.forall(_.getLong(1) === 0L))
    assert(out.map(r => r.getLong(0) -> r.getString(2)).toMap ===
      Map(1L -> "a b c", 2L -> "only"))
  }

  test("non-overlapping chunking partitions the tokens exactly") {
    val docs = Seq((1L, (1 to 12).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextCorpus.chunkWindows(docs, windowSize = 3, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(out.length === 4)
    assert(out.flatMap(_.getString(2).split(" ")).toSeq === (1 to 12).map(i => s"w$i"))
  }

  // --- distinctiveTerms ---

  test("distinctive terms rank frequent-here-rare-elsewhere first") {
    val docs = Seq(
      (1L, "A", "jargon jargon jargon common common"),
      (2L, "A", "jargon filler common"),
      (3L, "B", "common common filler"),
      (4L, "B", "common slang slang slang slang")).toDF("doc_id", "source", "text")
    val out = TextCorpus.distinctiveTerms(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(4)) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // A: jargon 4× in A, in 2 docs corpus-wide; common 3× but in 4 docs
    assert(out(("A", 1L)) === (("jargon", 4L, 2L)))
    assert(out(("A", 2L)) === (("common", 3L, 4L)))
    // B: slang 4× beats common 3× (and slang's doc_freq is 1)
    assert(out(("B", 1L)) === (("slang", 4L, 1L)))
    assert(out(("B", 2L)) === (("common", 3L, 4L)))
  }

  test("distinctive terms: doc_freq counts distinct documents corpus-wide") {
    val docs = Seq(
      (1L, "A", "w w w"), // w appears 3 times in ONE doc
      (2L, "B", "w x")).toDF("doc_id", "source", "text")
    val out = TextCorpus.distinctiveTerms(docs, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(out(("A", "w")) === 2L) // 2 distinct docs despite 4 occurrences
    assert(out(("B", "x")) === 1L)
  }

  test("distinctive terms break count-and-frequency ties by word") {
    val docs = Seq((1L, "A", "zeta alpha")).toDF("doc_id", "source", "text")
    val out = TextCorpus.distinctiveTerms(docs, k = 2).collect()
      .sortBy(_.getLong(4)).map(_.getString(1)).toSeq
    assert(out === Seq("alpha", "zeta"))
  }

  test("bpePairCounts weights pairs by word frequency, not occurrence") {
    // "abab" ×2 docs → word freq 2; pairs per occurrence of "abab":
    // ab, ba, ab → ab gets 2·2 = 4, ba gets 1·2 = 2; "cd" ×1 → cd = 1;
    // single-letter "e" and non-alpha are ignored
    val docs = Seq((1L, "abab e 7!"), (2L, "abab cd")).toDF("doc_id", "text")
    val out = TextCorpus.bpePairCounts(docs, "text", topN = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out === Seq("ab" -> 4L, "ba" -> 2L, "cd" -> 1L))
  }

  test("bpeTrainMerges: rounds recount over REBUILT symbols; runs merge leftmost") {
    // round 1: (a,b)=4 wins; round 2: (a,a)=3 — and "aaaa" must become
    // [aa, aa] (greedy leftmost), so round 3 sees (ab,ab)=2 beating
    // (aa,aa)=1 on the lexicographic tie with (d,d)=2
    val docs = Seq((1L, "aaaa abab"), (2L, "abab cddd")).toDF("doc_id", "text")
    val m = TextCorpus.bpeTrainMerges(docs, "text", nMerges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m.toSeq === Seq(
      (1L, "a", "b", "ab", 4L),
      (2L, "a", "a", "aa", 3L),
      (3L, "ab", "ab", "abab", 2L)))
  }

  test("bpeEncode applies trained merges in rank order, greedy leftmost") {
    val docs = Seq((1L, "aaaa abab"), (2L, "abab cddd")).toDF("doc_id", "text")
    val merges = TextCorpus.bpeTrainMerges(docs, "text", nMerges = 3)
    val out = TextCorpus.bpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // merges: (a,b)→ab, (a,a)→aa, (ab,ab)→abab
    // "aaaa" → after ab: unchanged; after aa: [aa,aa]; after abab: same
    // "abab" → [ab,ab] → [abab]; "cddd" → [c,d,d,d] (no merge applies
    // to c/d pairs except none trained) → stays 4 symbols
    assert(out(1L) === ((2L, 3L, "aa aa abab")))
    assert(out(2L) === ((2L, 5L, "abab c d d d")))
  }

  test("bpeEncode: single-char and untrained words encode as themselves") {
    val docs = Seq((1L, "a zq")).toDF("doc_id", "text")
    val merges = Seq((1L, "z", "x", "zx")).toDF("rank", "sym_a", "sym_b", "merged")
    val out = TextCorpus.bpeEncode(docs, merges).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq((2L, 3L, "a z q")))
  }

  test("bpeEncode rejects merge symbols outside [a-z]+ and inconsistent merges") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextCorpus.bpeEncode(docs,
        Seq((1L, "a'", "b", "a'b")).toDF("rank", "sym_a", "sym_b", "merged"))
    }
    intercept[IllegalArgumentException] {
      TextCorpus.bpeEncode(docs,
        Seq((1L, "a", "b", "ba")).toDF("rank", "sym_a", "sym_b", "merged"))
    }
  }

  test("bpeEncodeIds: separator-0 layout, ids from the induced vocab, counts match bpeEncode") {
    val docs = Seq((1L, "aaaa abab"), (2L, "abab cddd")).toDF("doc_id", "text")
    val merges = TextCorpus.bpeTrainMerges(docs, "text", nMerges = 3)
    // induced vocab: a..z = 1..26, then ab=27, aa=28, abab=29
    val out = TextCorpus.bpeEncodeIds(docs, merges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    assert(out(1L) === ((2L, 3L, Seq(28L, 28L, 0L, 29L))))
    assert(out(2L) === ((2L, 5L, Seq(29L, 0L, 3L, 4L, 4L, 4L))))
  }

  test("bpeDecode round-trip law: decode(encode(x)) == normalized x, full domain") {
    // the base alphabet makes every [a-z]+ word encodable — no OOV
    // subset to carve out. Deterministic pseudo-random corpus.
    val rng = new scala.util.Random(421L)
    val alphabet = "abcdefgh" // small alphabet → merges actually fire
    def word() = (1 to (1 + rng.nextInt(6)))
      .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    val texts = (1 to 40).map { i =>
      val raw = (1 to (1 + rng.nextInt(12))).map(_ => word())
        .mkString(Seq(" ", ", ", "; ", "\n", " 7 ")(rng.nextInt(5)))
      (i.toLong, s"${raw.toUpperCase.take(8)}$raw!")
    }
    val docs = texts.toDF("doc_id", "text")
    val merges = TextCorpus.bpeTrainMerges(docs, "text", nMerges = 6)
    val decoded = TextCorpus.bpeDecode(
        TextCorpus.bpeEncodeIds(docs, merges), merges)
      .select("doc_id", "decoded_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def normalize(s: String): String =
      s.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).mkString(" ")
    texts.foreach { case (id, text) =>
      val norm = normalize(text)
      if (norm.isEmpty) assert(!decoded.contains(id))
      else assert(decoded(id) === norm, s"round trip broke for doc $id: '$text'")
    }
  }

  test("bpeDecode nulls the whole text on an out-of-vocab id, never skips it") {
    val merges = Seq((1L, "a", "b", "ab")).toDF("rank", "sym_a", "sym_b", "merged")
    val df = Seq((1L, Seq(27L, 0L, 3L)), (2L, Seq(27L, 999L))).toDF("doc_id", "token_ids")
    val out = TextCorpus.bpeDecode(df, merges).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(1L) === Some("ab c"))
    assert(out(2L) === None)
  }

  test("bpeTrainMerges stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = TextCorpus.bpeTrainMerges(docs, "text", nMerges = 5).collect()
    // after merging (a,b) every word is a single symbol — no more pairs
    assert(m.length === 1)
    assert(m.head.getString(3) === "ab")
  }

  test("bpePairCounts top-N cut uses the (count desc, pair asc) total order") {
    val docs = Seq((1L, "xy za za")).toDF("doc_id", "text")
    // za freq 1 (distinct word counted once per occurrence set: "za" twice
    // → freq 2) vs xy freq 1 → za=2, xy=1; topN=1 keeps za
    val out = TextCorpus.bpePairCounts(docs, "text", topN = 1).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq("za" -> 2L))
  }

  private val footerDocs = Seq(
    (1L, "unique alpha\nshared footer line\n\n  body one  "),
    (2L, "unique beta\nshared footer line"),
    (3L, "unique gamma\nanother page\nshared footer line"),
    (4L, "lonely page with nothing shared")).toDF("doc_id", "text")

  test("boilerplateStats: df counts distinct docs, empty lines never count") {
    val out = TextCorpus.boilerplateStats(footerDocs, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: lines {unique alpha, shared footer line, body one} — the
    // blank line is dropped; only the footer crosses df >= 2
    assert(out.toSeq === Seq(
      (1L, 3L, 1L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 1L, 0L)))
  }

  test("boilerplateStats: intra-doc stutter adds no document frequency") {
    val docs = Seq(
      (1L, "footer\nfooter\nfooter\nreal text"),
      (2L, "other content")).toDF("doc_id", "text")
    // footer appears 3x in ONE doc → df 1 → not boilerplate at minDocs 2
    val out = TextCorpus.boilerplateStats(docs, minDocs = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 0L), (2L, 0L)))
  }

  test("stripBoilerplate removes shared lines, keeps order, counts positions") {
    val out = TextCorpus.stripBoilerplate(footerDocs, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) === ((1L, "unique alpha\n\n  body one  ", 1L)))
    assert(out(1) === ((2L, "unique beta", 1L)))
    assert(out(2) === ((3L, "unique gamma\nanother page", 1L)))
    assert(out(3) === ((4L, "lonely page with nothing shared", 0L)))
  }

  test("stripBoilerplate counts repeated in-doc positions individually") {
    val docs = Seq(
      (1L, "shared\nbody\nshared"),
      (2L, "shared\nother")).toDF("doc_id", "text")
    val out = TextCorpus.stripBoilerplate(docs, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "body", 2L), (2L, "other", 1L)))
  }

  test("docKeywords ranks frequent-here-rare-everywhere first, ties by token") {
    val docs = Seq(
      (1L, "apple apple zebra common common common"),
      (2L, "common banana banana"),
      (3L, "common cherry")).toDF("doc_id", "text")
    val out = TextCorpus.docKeywords(docs, k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // doc 1: common tf=3 beats apple tf=2 on tf; apple (df=1) beats zebra on tf
    assert(out.toSeq === Seq(
      (1L, 1L, "common", 3L, 3L), (1L, 2L, "apple", 2L, 1L),
      (2L, 1L, "banana", 2L, 1L), (2L, 2L, "common", 1L, 3L),
      (3L, 1L, "cherry", 1L, 1L), (3L, 2L, "common", 1L, 3L)))
  }

  test("vocabRichness: spectrum and Chao1 rationals match brute force; f2=0 flagged by den") {
    val docs = Seq(
      "alpha beta beta gamma gamma gamma",
      "alpha delta epsilon").toDF("text")
    val r = TextCorpus.vocabRichness(docs).head()
    // spectrum: alpha 2, beta 2, gamma 3, delta 1, epsilon 1
    //   s_obs 5, f1 2, f2 2 -> chao1 = 5 + 4/4 = 6
    assert(r.getLong(0) === 5L && r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getDecimal(3).longValueExact() === 2L * 2 * 5 + 2 * 2)
    assert(r.getDecimal(4).longValueExact() === 4L)
    // no doubletons: den 0 signals the caller to use the corrected form
    val r2 = TextCorpus.vocabRichness(Seq("a b c").toDF("text")).head()
    assert(r2.getDecimal(4).longValueExact() === 0L)
  }
}
