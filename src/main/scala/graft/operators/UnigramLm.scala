package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer — the OTHER production
  * tokenizer next to BPE (Kudo 2018, "Subword Regularization"): a piece
  * VOCABULARY with per-piece scores, trained by EM over segmentations,
  * served by Viterbi decoding. Where BPE grows a vocabulary bottom-up by
  * merges, unigram-LM starts from a large seed of candidate substrings
  * and prunes — and serving picks, per word, the best segmentation under
  * the pieces' scores rather than replaying a merge history.
  *
  * INTEGER-EXACT variant (the hash-gate discipline): the float
  * log-likelihood Viterbi is replaced by a lexicographic objective —
  * fewest pieces, then greatest total piece score, then lexicographically
  * smallest piece sequence — and EM's expected counts by hard (Viterbi)
  * counts. The objective is translation-invariant (every completion adds
  * the same (Δk, Δs) to competing prefixes; a (k, s) tie forces equal
  * piece counts, so the seq tie-break is prefix-safe), which gives the
  * DP optimal substructure and makes training/serving bit-reproducible
  * in any engine — the property the cross-engine oracle gates hash.
  * The unigram character is preserved: segmentation quality is a
  * function of per-piece statistics only (no merge order anywhere).
  *
  * Training (fixed EM horizon, the `bpe_merges` unrolled-chain pattern):
  *   1. collapse the corpus ONCE to its word-frequency table (words =
  *      printable-ASCII runs, `[!-~]{1,[[MaxWordLen]]}` after case
  *      folding — the Heaps'-law plateau; widened from [a-z] per r15
  *      verdict #6);
  *   2. seed pieces = every substring of length 1..maxPieceLen
  *      (configurable, default [[MaxPieceLen]]) weighted by occurrence
  *      × word frequency; keep the FULL [[BaseAlphabet]] as single
  *      characters — corpus-unseen symbols enter at score 0 — (the
  *      coverage guarantee: no in-domain word is ever OOV, the
  *      SentencePiece byte-fallback role) plus the top `seedMulti`
  *      multi-character pieces (freq desc, piece);
  *   3. per EM round: Viterbi-segment every vocab word under current
  *      scores (E), re-score each piece by its usage — word-frequency-
  *      weighted occurrence count in the chosen segmentations (M), and
  *      prune multi-character pieces whose usage dropped to zero
  *      (single characters survive at score 0 — coverage again).
  *
  * 100 TB shape: ONE corpus-sized shuffle (the word-frequency collapse);
  * every EM round is corpus-free — a Viterbi projection + piece-usage
  * aggregation over the |vocab| frame, with the piece table (≤
  * |BaseAlphabet| + seedMulti rows, bounded by construction) collected into a literal
  * map so segmentation is a pure codegen'd projection. Serving
  * ([[encodeIds]]) segments the DISTINCT-word table and joins back —
  * the [[TextCorpus.bpeEncode]] shape exactly. */
object UnigramLm {

  /** DEFAULT longest candidate piece (overridable per call since r16).
    * 4 keeps the seed grid O(len·4) per word and the DuckDB oracle's
    * per-position DP at ≤ 4 branches. */
  val MaxPieceLen = 4

  /** Longest word the trainer/serving segments — also the unroll depth
    * of the oracle's positional DP. Longer symbol runs are out of the
    * tokenizer's domain (both engines filter identically). */
  val MaxWordLen = 12

  /** The tokenizer's BASE alphabet (r15 verdict #6 — widened from
    * [a-z]): every printable-ASCII symbol that can appear in a word
    * after case folding — codes 33..126 minus the uppercase range the
    * `lower()` normalization removes. [[trainPieces]] ALWAYS includes
    * each as a single-character piece (score 0 when the corpus never
    * uses it), the SentencePiece character-coverage guarantee: no
    * in-domain word is ever unsegmentable, trained on any corpus. */
  val BaseAlphabet: Seq[String] =
    (33 to 126).filterNot(c => c >= 'A'.toInt && c <= 'Z'.toInt)
      .map(_.toChar.toString)

  /** Words = maximal runs of printable non-space ASCII (`[!-~]`) after
    * lowercasing; everything else — whitespace, control, non-ASCII —
    * separates. The Java and RE2 spellings of this class coincide, so
    * the oracle splits identically. */
  private[graft] val WordSplitRegex = "[^!-~]+"

  /** Word-frequency collapse: the ONE corpus-sized aggregation.
    * `(word, cnt)`, words from the printable-ASCII domain at length
    * 1..MaxWordLen. */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), WordSplitRegex)).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Candidate-piece seed frequencies over a word-frequency table:
    * every substring of length 1..maxPieceLen, each OCCURRENCE weighted
    * by the word's frequency. Runs on the |vocab| frame. */
  def seedPieces(wf: DataFrame, maxPieceLen: Int = MaxPieceLen): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= MaxWordLen,
      s"maxPieceLen out of range: $maxPieceLen")
    wf.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, least($maxPieceLen, length(word))),
              L -> transform(sequence(1, length(word) - L + 1),
                i -> substring(word, i, L))))""")).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("score"))
  }

  /** Train the piece table: `(piece, score, piece_id)` where `score` is
    * the final round's Viterbi usage (word-frequency-weighted) and
    * `piece_id` numbers pieces 1.. by (score desc, piece asc) — id 0 is
    * RESERVED as the word separator ([[encodeIds]]/[[decode]]), the
    * [[TextCorpus.bpeVocabIds]] convention. */
  def trainPieces(
      docs: DataFrame, textCol: String = "text",
      iters: Int = 2, seedMulti: Int = 120,
      maxPieceLen: Int = MaxPieceLen): DataFrame = {
    require(iters >= 1 && iters <= 4, s"iters out of range: $iters")
    require(seedMulti >= 1 && seedMulti <= 4096, s"seedMulti out of range: $seedMulti")
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = wordFreq(docs, textCol).localCheckpoint()
    val seeds = seedPieces(wf, maxPieceLen)
    // the piece table is bounded (|BaseAlphabet| + seedMulti rows) BY
    // CONSTRUCTION — these collects are vocab-sized, never data-sized
    val corpusSingles = seeds.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // character coverage over the FULL base alphabet, not just the
    // corpus-seen characters: an unseen symbol enters at score 0, so
    // serving never meets an unsegmentable in-domain word (r15
    // verdict #6 — the SentencePiece byte-fallback role)
    val singles = BaseAlphabet.map(ch => ch -> corpusSingles.getOrElse(ch, 0L))
    val multi = seeds.filter(length(col("piece")) > 1)
      .orderBy(col("score").desc, col("piece")).limit(seedMulti)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var vocab: Map[String, Long] = (singles ++ multi).toMap
    (1 to iters).foreach { _ =>
      val seg = wf.select(col("cnt"),
        expr(viterbiExpr(vocab, maxPieceLen)).getField("seq").as("seq"))
      val usage = seg
        .select(col("cnt"), explode(split(col("seq"), " ")).as("piece"))
        .groupBy("piece").agg(sum("cnt").as("usage"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // M-step + prune: multi pieces live on usage alone; single chars
      // survive at 0 so every word stays segmentable
      vocab = vocab.iterator.flatMap { case (p, _) =>
        val u = usage.getOrElse(p, 0L)
        if (u > 0L || p.length == 1) Some(p -> u) else None
      }.toMap
    }
    val ordered = vocab.toSeq.sortBy { case (p, s) => (-s, p) }
    ordered.zipWithIndex
      .map { case ((p, s), i) => (p, s, i.toLong + 1L) }
      .toDF("piece", "score", "piece_id")
  }

  /** The Viterbi fold (one `aggregate` HOF per word, the
    * [[TextCorpus]] mergeFoldExpr discipline): dp over positions
    * 0..length(word), each position keeping the single best
    * (k = pieces used, negs = −(score sum), seq = piece sequence)
    * under ascending (k, negs, seq) — i.e. fewest pieces, then
    * greatest score, then lexicographic. Pieces come from an inlined
    * literal map (vocab is bounded); coverage is guaranteed because
    * every single character is in the vocabulary, so each position is
    * reachable and `element_at(array_sort(...), 1)` never sees an
    * empty array. Evaluates as one codegen'd projection — the column
    * `word` must exist on the input frame. */
  private[graft] def viterbiExpr(
      vocab: Map[String, Long], maxPieceLen: Int = MaxPieceLen): String = {
    require(vocab.nonEmpty, "empty unigram vocabulary")
    // pieces are inlined into SQL text: the domain is printable ASCII
    // minus space (words never contain the separator), with quote and
    // backslash escaped below
    require(vocab.keysIterator.forall(_.forall(c => c >= '!' && c <= '~')),
      "unigram pieces must be printable non-space ASCII")
    def esc(p: String): String =
      p.replace("\\", "\\\\").replace("'", "\\'")
    val entries = vocab.toSeq.sorted
      .map { case (p, s) => s"'${esc(p)}', ${s}L" }.mkString(", ")
    val vm = s"map($entries)"
    s"""aggregate(
          sequence(1, length(word)),
          array(named_struct('k', 0L, 'negs', 0L, 'seq', '')),
          (acc, i) -> concat(acc, array(
            element_at(
              array_sort(
                transform(
                  filter(
                    transform(sequence(1, least($maxPieceLen, i)),
                      L -> named_struct('L', L,
                        'cnt', element_at($vm, substring(word, i - L + 1, L)))),
                    t -> t.cnt IS NOT NULL),
                  t -> named_struct(
                    'k', element_at(acc, i - t.L + 1).k + 1L,
                    'negs', element_at(acc, i - t.L + 1).negs - t.cnt,
                    'seq', CASE WHEN element_at(acc, i - t.L + 1).seq = ''
                           THEN substring(word, i - t.L + 1, t.L)
                           ELSE concat(element_at(acc, i - t.L + 1).seq, ' ',
                                       substring(word, i - t.L + 1, t.L)) END))),
              1))),
          acc -> element_at(acc, length(word) + 1))"""
  }

  /** Collect a trained piece table into the (bounded) driver maps the
    * serving projections inline. */
  private def collectPieces(pieces: DataFrame): Seq[(String, Long, Long)] =
    pieces.select("piece", "score", "piece_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  /** Viterbi-segment a frame of distinct `word`s with a trained piece
    * table: `(word, n_pieces, score, pieces_text)` — the serving
    * primitive (and the segmentation gate's surface). */
  def segmentWords(
      words: DataFrame, pieces: DataFrame,
      maxPieceLen: Int = MaxPieceLen): DataFrame = {
    val vocab = collectPieces(pieces).map(t => t._1 -> t._2).toMap
    words.select(col("word"), expr(viterbiExpr(vocab, maxPieceLen)).as("vit"))
      .select(col("word"),
        col("vit.k").as("n_pieces"),
        (-col("vit.negs")).as("score"),
        col("vit.seq").as("pieces_text"))
  }

  /** Encode documents to piece TEXT — [[TextCorpus.bpeEncode]]'s
    * surface under unigram segmentation: per document `(n_words,
    * n_tokens, tokens_text)` where `tokens_text` is every word's piece
    * sequence in word order, space-joined. Same shape as [[encodeIds]]
    * (one corpus collapse, corpus-free Viterbi over the distinct-word
    * table, one keyed join back). */
  def encode(
      docs: DataFrame, pieces: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      maxPieceLen: Int = MaxPieceLen): DataFrame = {
    val vocab = collectPieces(pieces).map(t => t._1 -> t._2).toMap
    val words = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), WordSplitRegex)))
      .select(col("doc_id"), col("pos"), col("col").as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
    val segmented = words.select("word").distinct()
      .select(col("word"), expr(viterbiExpr(vocab, maxPieceLen)).as("vit"))
      .select(col("word"),
        col("vit.k").as("n_pieces"), col("vit.seq").as("seq"))
    words.join(segmented, Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("seq").as("t")))),
            x => x.getField("t")),
          " ").as("tokens_text"))
  }

  /** Encode documents to token ids: per document `(n_words, n_tokens,
    * token_ids)` with the reserved separator id 0 between words and
    * `n_tokens` counting real pieces only — [[TextCorpus.bpeEncodeIds]]'
    * contract, under unigram segmentation. Same 100 TB shape: one
    * corpus collapse to the distinct-word table, a corpus-free Viterbi
    * projection over it, one keyed join back. */
  def encodeIds(
      docs: DataFrame, pieces: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      maxPieceLen: Int = MaxPieceLen): DataFrame = {
    val collected = collectPieces(pieces)
    val vocab = collected.map(t => t._1 -> t._2).toMap
    val idOf = typedLit(collected.map(t => t._1 -> t._3).toMap)
    val words = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), WordSplitRegex)))
      .select(col("doc_id"), col("pos"), col("col").as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
    val segmented = words.select("word").distinct()
      .select(col("word"), expr(viterbiExpr(vocab, maxPieceLen)).as("vit"))
      .select(col("word"),
        col("vit.k").as("n_pieces"),
        transform(split(col("vit.seq"), " "), p => element_at(idOf, p)).as("ids"))
    val flat = flatten(transform(
      array_sort(collect_list(struct(col("pos"), col("ids").as("ids")))),
      x => concat(x.getField("ids"), array(lit(0L)))))
    words.join(segmented, Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_tokens"),
        slice(flat, lit(1), size(flat) - 1).as("token_ids"))
  }

  /** Decode token ids back to text — closes the round-trip law
    * `decode(encodeIds(x)) == normalize(x)` over the tokenizer's
    * domain (words re-joined with single spaces), which holds for EVERY
    * input because single-character coverage makes no word OOV and a
    * word's pieces concatenate back to the word exactly. An unknown id
    * nulls the whole text loudly ([[TextCorpus.bpeDecode]]'s rule). */
  def decode(
      df: DataFrame, pieces: DataFrame,
      idsCol: String = "token_ids", outCol: String = "decoded_text"): DataFrame = {
    val symOf: Map[Long, String] = collectPieces(pieces)
      .map(t => t._3 -> t._1).toMap + (0L -> " ")
    val m = typedLit(symOf)
    val syms = transform(col(idsCol), id => element_at(m, id))
    df.withColumn(outCol,
      when(forall(syms, s => s.isNotNull), array_join(syms, ""))
        .otherwise(lit(null)))
  }
}
