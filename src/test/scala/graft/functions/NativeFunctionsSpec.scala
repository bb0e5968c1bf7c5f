package graft.functions

import graft.SparkTestSession
import graft.operators.TextAnalysis
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The native Catalyst expressions must be bit-identical to the built-in
  * HOF formulations they replaced (the HOF forms are kept here as the
  * executable reference). */
class NativeFunctionsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumped over the lazy dog",
    "completely different content here with other words",
    "short",
    "  padded   with   whitespace  ",
    "")

  // --- HOF reference implementations (the replaced formulations) ---

  private def hofMinHash(text: Column, k: Int, shingleSize: Int): Column = {
    val hashes = transform(
      array_distinct(TextAnalysis.charShingles(text, shingleSize)), s => xxhash64(s))
    transform(sequence(lit(0), lit(k - 1)), j => array_min(transform(hashes, h => xxhash64(h, j))))
  }

  private def hofSimHash(text: Column): Column = {
    val ts = TextAnalysis.tokens(text)
    val votes = aggregate(
      ts, array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(call_function("shiftright", h, i.cast("int")).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
  }

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("MinHashSig matches the HOF formulation bit-for-bit") {
    val df = texts.toDF("text")
    val rows = df.select(
      TextHash.minHashSignature(col("text"), 16, 5).as("native"),
      hofMinHash(col("text"), 16, 5).as("hof")).collect()
    rows.foreach { r =>
      r.getSeq[Long](0) shouldBe r.getSeq[Long](1)
    }
  }

  test("ShingleHashes matches the HOF formulation bit-for-bit") {
    val df = texts.toDF("text")
    val hof = array_sort(transform(
      array_distinct(TextAnalysis.charShingles(col("text"), 5)), s => xxhash64(s)))
    val rows = df.select(
      TextHash.shingleHashes(col("text"), 5).as("native"),
      hof.as("hof")).collect()
    rows.foreach(r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1))
  }

  test("WindowMd5s matches the split/slice/array_join/md5/unhex formulation bit-for-bit") {
    val win = 5
    val fixtures = texts ++ Seq("exact", "one more naïve café pad 中文テスト", "emoji \ud83d\ude42 pair 𝄞 clef!",
      "x" * 4) // one shorter-than-window text
    val df = fixtures.toDF("text")
    val len = org.apache.spark.sql.functions.length(col("text")) // scalatest Matchers shadows `length`
    val cs = filter(split(col("text"), ""), c => c =!= "")
    val hof = when(len >= win,
      transform(sequence(lit(1), len - win + 1),
        p => unhex(md5(array_join(slice(cs, p, lit(win)), "")))))
      .otherwise(array().cast("array<binary>"))
    val rows = df.select(
      TextHash.windowMd5s(col("text"), win).as("native"),
      hof.as("hof")).collect()
    rows.foreach { r =>
      r.getSeq[Array[Byte]](0).map(_.toSeq) shouldBe r.getSeq[Array[Byte]](1).map(_.toSeq)
    }
  }

  test("MinHashFromHashes over ShingleHashes equals MinHashSig") {
    val df = texts.toDF("text")
    val rows = df.select(
      TextHash.minHashFromHashes(TextHash.shingleHashes(col("text"), 5), 16).as("from_hashes"),
      TextHash.minHashSignature(col("text"), 16, 5).as("direct")).collect()
    rows.foreach(r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1))
  }

  test("SimHash64 matches the HOF formulation bit-for-bit") {
    val df = texts.toDF("text")
    val rows = df.select(
      TextHash.simHash64(col("text")).as("native"),
      hofSimHash(col("text")).as("hof")).collect()
    rows.foreach(r => r.getLong(0) shouldBe r.getLong(1))
  }

  test("DotProductF matches the HOF formulation bit-for-bit") {
    val vecs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f)),
      (Array.fill(64)(0.37f), Array.fill(64)(-1.21f)))
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => r.getDouble(0) shouldBe r.getDouble(1))
  }

  test("LangIdExpr matches the HOF formulation on multilingual and edge inputs") {
    val samples = Seq(
      "the quick brown fox is in the yard and it was fine",
      "der hund ist nicht mit der katze und das ist gut",
      "le chat est dans la maison pour que les choses aillent",
      "el perro no es para los gatos y una cosa por otra",
      "中文文本 with some english the and of",
      "la la la", // shared fr/es stopword: tie resolved in lang order
      "no stopwords here whatsoever xyzzy",
      "  padded   WITH   Whitespace the of and ",
      "")
    val df = samples.toDF("text")
    val rows = df.select(
      TextAnalysis.languageId(col("text")).as("native"),
      TextAnalysis.languageIdHof(col("text")).as("hof")).collect()
    rows.zip(samples).foreach { case (r, s) =>
      assert(r.getString(0) === r.getString(1), s"diverged on: '$s'")
    }
  }

  test("TextStatsExpr matches the per-metric HOF formulations bit-for-bit") {
    val samples = texts ++ Seq(
      "The fox. It was a fox! Or was it?",
      "\ttab-led   and of the  ",
      "punctuation!!! everywhere... ???")
    val df = samples.toDF("text")
    val rows = df.select(
      TextStats.textStats(col("text")).as("native"),
      TextAnalysis.alphaRatio(col("text")).as("alpha"),
      TextAnalysis.punctRatio(col("text")).as("punct"),
      TextAnalysis.stopwordRatio(col("text")).as("stop"),
      TextAnalysis.meanTokenLen(col("text")).as("mean")).collect()
    rows.foreach { r =>
      val st = r.getStruct(0)
      st.getDouble(0) shouldBe r.getDouble(1)
      st.getDouble(1) shouldBe r.getDouble(2)
      st.getDouble(2) shouldBe r.getDouble(3)
      st.getDouble(3) shouldBe r.getDouble(4)
    }
  }

  test("SQL registration exposes the native functions with identical results") {
    GraftFunctions.register(spark)
    texts.toDF("text").createOrReplaceTempView("nf_texts")
    val viaSql = spark.sql(
      """SELECT minhash_sig(text, 16, 5) AS sig, shingle_hashes(text, 5) AS sh,
                minhash_from_hashes(shingle_hashes(text, 5), 16) AS sig2,
                simhash64(text) AS code, lang_id(text) AS lang,
                text_stats(text).alpha_ratio AS alpha
         FROM nf_texts""").collect()
    val viaApi = texts.toDF("text").select(
      TextHash.minHashSignature(col("text"), 16, 5).as("sig"),
      TextHash.shingleHashes(col("text"), 5).as("sh"),
      TextHash.simHash64(col("text")).as("code"),
      graft.functions.LangId.languageId(col("text")).as("lang"),
      TextStats.textStats(col("text")).getField("alpha_ratio").as("alpha")).collect()
    viaSql.zip(viaApi).foreach { case (s, a) =>
      s.getSeq[Long](0) shouldBe a.getSeq[Long](0)
      s.getSeq[Long](1) shouldBe a.getSeq[Long](1)
      s.getSeq[Long](2) shouldBe a.getSeq[Long](0) // sig from hashes == direct sig
      s.getLong(3) shouldBe a.getLong(2)
      s.getString(4) shouldBe a.getString(3)
      s.getDouble(5) shouldBe a.getDouble(4)
    }
    val dotRow = spark.sql(
      "SELECT dot_f(array(cast(1.0 as float), cast(2.0 as float)), array(cast(3.0 as float), cast(4.0 as float))) AS d").head()
    dotRow.getDouble(0) shouldBe 11.0
    val interRow = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 7L), array(3L, 7L, 9L)) AS n").head()
    interRow.getInt(0) shouldBe 2
    val cutRow = spark.sql(
      "SELECT cdc_cut_starts('tiny', 8, 64) AS starts").head()
    cutRow.getSeq[Int](0) shouldBe Seq(1)
    val divRow = spark.sql(
      "SELECT char_diversity('Aab!') AS cd").head().getStruct(0)
    divRow.getLong(0) shouldBe 3L // a, a, b
    divRow.getLong(1) shouldBe 5L // 2² + 1²
  }

  test("CharDiversityExpr matches a per-character Scala fold on varied inputs") {
    def naive(s: String): (Long, Long) = {
      val counts = s.toLowerCase.filter(c => c >= 'a' && c <= 'z')
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      (counts.values.sum, counts.values.map(c => c * c).sum)
    }
    val inputs = texts ++ Seq("zzzzz", "AbCdE fGh!", "1234 !?", "")
    val out = inputs.toDF("text")
      .select(CharDiversity.charDiversity(col("text")).as("cd"))
      .collect().map(r => (r.getStruct(0).getLong(0), r.getStruct(0).getLong(1)))
    out.toSeq shouldBe inputs.map(naive)
    // a single repeated letter has zero diversity: c2 = n²
    val (n, c2) = naive("zzzzz")
    c2 shouldBe n * n
  }

  test("SortedIntersectCount matches array_intersect size on sorted shingle arrays") {
    // the verify kernel must equal the built-in set intersect on every
    // pair of ShingleHashes outputs (sorted distinct by construction)
    val docs = texts.filter(_.nonEmpty).toDF("text")
      .select(TextHash.shingleHashes(col("text"), 5).as("sh"))
    val pairs = docs.as("a").crossJoin(docs.as("b"))
      .select(
        TextHash.sortedIntersectCount(col("a.sh"), col("b.sh")).as("merge_n"),
        org.apache.spark.sql.functions.size(
          array_intersect(col("a.sh"), col("b.sh"))).as("hash_n"))
      .collect()
    pairs.length shouldBe 25
    pairs.foreach(r => r.getInt(0) shouldBe r.getInt(1))
    // edge cases: empty vs non-empty, identical arrays
    val edge = Seq((Array.empty[Long], Array(1L, 2L)), (Array(1L, 2L), Array(1L, 2L)))
      .toDF("a", "b")
      .select(TextHash.sortedIntersectCount(col("a"), col("b")).as("n"))
      .collect().map(_.getInt(0))
    edge.toSeq shouldBe Seq(0, 2)
  }

  test("native expressions stay inside whole-stage codegen") {
    // repartition so the projection sits over an exchange rather than a
    // LocalTableScan (which is evaluated without codegen)
    val df = texts.toDF("text").repartition(2).select(
      TextHash.minHashSignature(col("text"), 8, 5).as("sig"),
      TextHash.simHash64(col("text")).as("code"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString()
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage
    plan should include("*(1) Project [minhash_sig")
  }
}
