package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, document
  * fingerprinting. All pure `org.apache.spark.sql.functions` column
  * expressions (whole-stage-codegen'd, no UDFs), so they stay inside one
  * projection over the scan at any scale — no shuffle, no driver loop.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty text ⇒ single empty token,
    * matching SQL split semantics on both Spark and DuckDB). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword token estimate: counts matches of a GPT-2-style
    * pre-tokenizer pattern (letter runs, digit runs, single punctuation),
    * then charges one extra token per 6 letters of long words — the usual
    * cheap proxy for byte-pair-encoded token counts when the real
    * tokenizer can't run in the engine. Pure regexp, codegen'd. */
  def bpeTokenEstimate(text: Column): Column = {
    val pieces = regexp_extract_all(trim(text), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    aggregate(
      pieces, lit(0L),
      (acc, p) => acc + lit(1L) +
        when(p.rlike("^[A-Za-z]+$"), floor((length(p) - 1) / 6.0)).otherwise(lit(0L)))
  }

  /** Character n-gram shingles (sliding window, step 1).
    *
    * r17 (codegen/expressions — the collocations O(len²) lesson): the
    * old shape transformed an index sequence with a lambda CAPTURING
    * the trimmed text, and HOF lambda bodies are interpreted per
    * element — trim re-evaluated and substr walking from the string
    * start for every shingle, O(len²) per document. This shape builds
    * the shingles by (n−1) shifted zip_with concats whose lambdas touch
    * ONLY their lambda variables; every non-lambda input (the char
    * array, its slices) is evaluated once per row — O(n·len). The
    * null-text ([null]), short-text (one truncated gram) and
    * empty-text ([""]) semantics are unchanged (pinned bit-for-bit by
    * NativeFunctionsSpec's parity fixtures). */
  def charShingles(text: Column, n: Int): Column = {
    val t = trim(text)
    val cs = filter(split(t, ""), c => c =!= "")
    val acc = (1 until n).foldLeft(cs) { (a, k) =>
      zip_with(a, slice(cs, lit(k + 1), size(cs)),
        (x, y) => concat(x, coalesce(y, lit(""))))
    }
    when(t.isNull, array(lit(null).cast("string")))
      .when(length(t) <= n, array(substring(t, 1, n)))
      .otherwise(slice(acc, lit(1), length(t) - n + 1))
  }

  /** Word n-grams as joined strings (same zip_with shape as
    * [[charShingles]] — no captured expression in any lambda body). */
  def wordNgrams(text: Column, n: Int): Column = {
    val ts = tokens(text)
    val acc = (1 until n).foldLeft(ts) { (a, k) =>
      zip_with(a, slice(ts, lit(k + 1), size(ts)),
        (x, y) => when(y.isNull, x).otherwise(concat(x, lit(" "), y)))
    }
    when(ts.isNull, array(lit(null).cast("string")))
      .when(size(ts) <= n, array(array_join(ts, " ")))
      .otherwise(slice(acc, lit(1), size(ts) - n + 1))
  }

  // --- quality scoring (length / punctuation / stopword ratios) ---

  /** Fraction of characters that are ASCII letters. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(
        length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
          length(text).cast("double"))

  /** Fraction of characters that are terminal punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(
        length(regexp_replace(text, "[^.!?]", "")).cast("double") /
          length(text).cast("double"))

  /** Mean token length. */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0)
      .otherwise(
        aggregate(ts, lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double") /
          size(ts).cast("double"))
  }

  /** English stopword list used by the ratio heuristics (top function
    * words; public knowledge). */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val ts = tokens(text)
    val sw = typedlit(stopwords)
    when(size(ts) === 0, 0.0)
      .otherwise(
        size(filter(ts, t => array_contains(sw, t))).cast("double") /
          size(ts).cast("double"))
  }

  /** Composite quality score in [0,1]: favors alphabetic, sentence-like,
    * stopword-bearing text of reasonable length — the usual cheap
    * pre-filter before expensive model-based scoring. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    (alphaRatio(text) * 0.4 + stopwordRatio(text) * 0.3 +
      least(punctRatio(text) * 20.0, lit(1.0)) * 0.1 + lenScore * 0.2)
  }

  // --- language identification (stopword-hit heuristic) ---

  private val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "que", "una", "para"))

  /** N-gram/stopword-heuristic language ID: picks the language whose
    * function words hit the most tokens; CJK detected by codepoint class.
    * Lightweight stand-in for fastText-style LID over 100 TB of text —
    * one pass, no shuffle. Native single-pass Catalyst expression
    * ([[graft.functions.LangId]]); the HOF formulation below is the
    * executable reference (one interpreted lambda per token × language —
    * it dominated this operator's round-1 bench time). */
  def languageId(text: Column): Column = graft.functions.LangId.languageId(text)

  /** The replaced HOF formulation, kept for the bit-parity spec. */
  private[graft] def languageIdHof(text: Column): Column = {
    val ts = tokens(lower(text))
    val hits: Seq[(String, Column)] = LangStopwords.map { case (lang, words) =>
      lang -> size(filter(ts, t => array_contains(typedlit(words), t)))
    }
    val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    val best = hits.tail.foldLeft((hits.head._2, lit(hits.head._1))) {
      case ((bestN, bestL), (lang, n)) =>
        (greatest(bestN, n), when(n > bestN, lang).otherwise(bestL))
    }
    when(cjk > 0, "zh").when(best._1 === 0, "unknown").otherwise(best._2)
  }

  // --- fingerprinting ---

  /** Content fingerprint: hash of the sorted distinct token set (order-
    * and duplication-insensitive, catches shuffled near-identical docs). */
  def tokenSetFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Rolling-hash fingerprint: min of 64-bit hashes over character
    * shingles (a 1-permutation MinHash; winnowing's keep-min idea). */
  def minShingleFingerprint(text: Column, n: Int = 8): Column =
    array_min(transform(charShingles(text, n), s => xxhash64(s)))

  // --- compression signal ---

  /** Per-document compression signal: `(id, n_bytes, deflate_len)` —
    * UTF-8 byte count and its zlib-deflated size at a pinned level
    * ([[graft.functions.Compress]]). The CCNet-style repetitiveness/
    * quality measure: templated or looping text compresses far below
    * prose, random noise barely compresses; pipelines threshold the
    * `deflate_len/n_bytes` ratio from both sides. Counts, not the ratio,
    * so consumers pick the cutoff and gates hash integers. Pure
    * stateless projection — one codegen'd Deflater pass per row in the
    * scan, no shuffle; at 100 TB cost is scan + O(bytes) CPU per row,
    * trivially partition-parallel. */
  def compressionStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(textCol)).cast("long").as("n_bytes"),
      graft.functions.Compress.deflateLen(col(textCol)).as("deflate_len"))

  /** Convenience: full text-analysis projection over a documents frame. */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    df.withColumn("n_tokens", tokenCount(c))
      .withColumn("alpha_ratio", alphaRatio(c))
      .withColumn("punct_ratio", punctRatio(c))
      .withColumn("stopword_ratio", stopwordRatio(c))
      .withColumn("quality", qualityScore(c))
      .withColumn("lang_id", languageId(c))
      .withColumn("fingerprint", tokenSetFingerprint(c))
  }
}
