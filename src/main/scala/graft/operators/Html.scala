package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML→text extraction — the stage between the URL-level crawl
  * curation ([[Web]]) and every text-level filter this engine already
  * has ([[TextCorpus.qualityFlags]], line boilerplate, langid, dedup):
  * a crawl delivers markup, the corpus wants content. Modeled on the
  * block-level content-density heuristics of jusText (Pomikálek 2011)
  * and trafilatura (Barbaresi 2021), re-expressed RELATIONALLY:
  *
  *  1. drop `<script>`/`<style>` payloads and comments (their text is
  *     code, not content — and scripts legally contain `<`, `&`, and
  *     even block tags in strings, so they go first),
  *  2. split the document into BLOCKS at block-level tag boundaries
  *     (`p`, `div`, `li`, headings, `br`, table rows, …),
  *  3. per block: strip inline tags (they count toward MARKUP length),
  *     decode the common entities, collapse whitespace,
  *  4. score each block — text/raw length ratio (the link/markup
  *     density test: navigation chrome is mostly tags), word count
  *     (titles/footers are short), stopword count (jusText's
  *     function-word signal, optional) — and keep the content blocks.
  *
  * EVERYTHING is codegen'd string/array expressions (`regexp_replace`,
  * higher-order `transform`/`filter`, `array_join`) — the whole
  * document→content map is ONE zero-shuffle projection, linear at any
  * scale; no parser library, no UDF. The regex subset is the
  * Java∩RE2 intersection (non-greedy, inline flags, no backreferences)
  * so the DuckDB oracle runs the identical patterns.
  *
  * The reference has no HTML layer (its payloads are JSON messages —
  * `reference/src/SqlStreamStore/Streams/NewStreamMessage.cs`); this
  * family belongs to the SURVEY §2 "beyond the reference"
  * training-pipeline mandate.
  */
object Html {

  /** Function words for the stopword-density signal (jusText §4.2 uses
    * language-specific lists; this is the English core — swap per
    * language upstream of the call). */
  val DefaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for",
    "with", "that", "as", "at", "it", "by", "this", "be", "are")

  /** `<script>`/`<style>` payload and comment removal. RE2 has no
    * backreferences, so script and style are two patterns rather than
    * `<(script|style)>.*?</\1>`. */
  private def deChrome(html: Column): Column = {
    val noScript =
      regexp_replace(html, """(?is)<script[^>]*>.*?</script>""", " ")
    val noStyle =
      regexp_replace(noScript, """(?is)<style[^>]*>.*?</style>""", " ")
    regexp_replace(noStyle, """(?s)<!--.*?-->""", " ")
  }

  /** Block-level tag boundaries → newline. Longer alternatives sit
    * before their prefixes (`header` before `head`, `pre` before `p`)
    * — RE2 alternation is leftmost-first, same as Java. The block tag
    * itself is consumed by the split; INLINE tags (`a`, `span`, `em`,
    * …) stay inside their block and count toward its markup length —
    * that asymmetry IS the density signal. */
  private val BlockTagRe: String =
    """(?i)<(?:br|hr)\s*/?>|</?(?:blockquote|article|section|header|footer|nav|html|head|body|title|table|tr|td|th|ul|ol|li|pre|p|div|h[1-6])(?:\s[^>]*)?/?>"""

  /** Raw block array of one document: chrome dropped, block tags →
    * `\n`, split. Blocks still carry their inline tags. */
  def rawBlocks(html: Column): Column =
    split(regexp_replace(deChrome(html), BlockTagRe, "\n"), "\n")

  /** The bounded entity-decode table: each named entity with its
    * decimal and lowercase-hex numeric character references (r13
    * advice — `&#160;`-style tokens otherwise leak into extracted text
    * and inflate `text_len`/`n_words` in the keep rule). Every pattern
    * is a LITERAL (both engines decode with plain string replacement,
    * so oracle parity holds by construction over this one shared
    * table). The amp family sits LAST so `&amp;lt;` renders `&lt;` and
    * never double-decodes. Documented gaps of the heuristic: uppercase
    * hex digits / `&#X` forms, leading-zero decimals (`&#0039;`), and
    * references outside this table pass through verbatim. */
  val EntityTable: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&#160;" -> " ", "&#xa0;" -> " ",
    "&lt;" -> "<", "&#60;" -> "<", "&#x3c;" -> "<",
    "&gt;" -> ">", "&#62;" -> ">", "&#x3e;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"", "&#x22;" -> "\"",
    "&apos;" -> "'", "&#39;" -> "'", "&#x27;" -> "'",
    "&ndash;" -> "–", "&#8211;" -> "–",
    "&mdash;" -> "—", "&#8212;" -> "—",
    "&lsquo;" -> "‘", "&#8216;" -> "‘",
    "&rsquo;" -> "’", "&#8217;" -> "’", "&#x2019;" -> "’",
    "&ldquo;" -> "“", "&#8220;" -> "“",
    "&rdquo;" -> "”", "&#8221;" -> "”",
    "&hellip;" -> "…", "&#8230;" -> "…",
    "&#38;" -> "&", "&#x26;" -> "&", "&amp;" -> "&")

  /** One block's TEXT: inline tags → space, the [[EntityTable]]
    * entities decoded (amp family LAST — see the table doc), whitespace
    * collapsed, trimmed. Decode happens AFTER tag-stripping so decoded
    * `<`/`>` can't be eaten as markup. */
  def blockText(block: Column): Column = {
    val noTags = regexp_replace(block, "<[^>]*>", " ")
    val decoded = EntityTable.foldLeft(noTags) { case (c, (from, to)) =>
      // plain literal substitution (overlay-free): expr-level replace,
      // codegen'd, no regex engine in the loop
      org.apache.spark.sql.functions.call_function("replace", c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, """\s+""", " "))
  }

  private def wordsOf(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  private def stopCount(text: Column, stopwords: Seq[String]): Column = {
    val stops = array(stopwords.map(lit): _*)
    size(filter(wordsOf(lower(text)), w => array_contains(stops, w))).cast("long")
  }

  /** The keep rule, all-integer (cross-multiplied — no float density
    * anywhere, so both engines agree bit-for-bit):
    * `text_len·10 ≥ raw_len·densityX10` (markup-light),
    * `n_words ≥ minWords` (not a title/footer stub), and — when
    * `minStopPct > 0` — `n_stop·100 ≥ n_words·minStopPct` (reads like
    * prose, jusText's function-word test). */
  private def keepRule(
      rawLen: Column, textLen: Column, nWords: Column, nStop: Column,
      densityX10: Int, minWords: Int, minStopPct: Int): Column = {
    val base = textLen * 10L >= rawLen * densityX10.toLong &&
      nWords >= minWords.toLong
    if (minStopPct <= 0) base
    else base && nStop * 100L >= nWords * minStopPct.toLong
  }

  /** Per-block detail frame: `(doc_id, block_no, raw_len, text_len,
    * n_words, n_stop, keep, text)` — the audit surface (what got
    * dropped and why). `block_no` is the 1-based position among
    * NON-EMPTY raw blocks. One narrow posexplode off the scan — no
    * shuffle, no join; every emitted value an exact integer or the
    * extracted string. */
  def htmlBlocks(
      docs: DataFrame, idCol: String, htmlCol: String,
      densityX10: Int = 3, minWords: Int = 4, minStopPct: Int = 0,
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    require(densityX10 >= 0 && densityX10 <= 10, "densityX10 in [0,10]")
    require(minWords >= 1, "minWords >= 1")
    // filter BEFORE numbering so block_no is stable against empty
    // splits (adjacent block tags produce empty fragments)
    val nonEmpty = filter(rawBlocks(col(htmlCol)), b => length(trim(b)) > 0)
    docs
      .select(col(idCol).as("doc_id"), posexplode(nonEmpty))
      .select(
        col("doc_id"),
        (col("pos") + 1L).cast("long").as("block_no"),
        trim(col("col")).as("raw"))
      .withColumn("text", blockText(col("raw")))
      .select(
        col("doc_id"), col("block_no"),
        length(col("raw")).cast("long").as("raw_len"),
        length(col("text")).cast("long").as("text_len"),
        size(wordsOf(col("text"))).cast("long").as("n_words"),
        stopCount(col("text"), stopwords).as("n_stop"),
        col("text"))
      .withColumn("keep",
        keepRule(col("raw_len"), col("text_len"), col("n_words"),
          col("n_stop"), densityX10, minWords, minStopPct))
  }

  /** Outlink extraction — the crawl-frontier / link-graph stage: every
    * `<a href="…">` (double- OR single-quoted) from the chrome-stripped
    * document, IN DOCUMENT ORDER, as ONE zero-shuffle array column:
    * match whole `<a …>` open tags in order, then extract each tag's
    * href (either quoting) per element — so a position index over the
    * result is the anchor's true document position among
    * href-carrying anchors. Script/style/comment payloads are removed
    * FIRST, so an href-shaped string inside JavaScript never becomes an
    * edge; hrefless anchors and empty `href=""` values drop. Values
    * come back verbatim (relative links included — [[Web.hostOf]]
    * yields '' for those, which is the downstream absolute-only
    * filter); compose with [[Web.normalizeUrl]]/[[Web.hostOf]] for the
    * host→host graph that feeds [[Graph.pageRank]]/[[Graph.hits]].
    * Java∩RE2 regexes, same contract as the extraction pipeline. */
  def extractLinks(html: Column): Column = {
    val anchors = regexp_extract_all(
      deChrome(html), lit("""(?is)<a\s[^>]*>"""), lit(0))
    val hrefOf = (a: Column) => {
      val dq = regexp_extract(a, """(?is)href\s*=\s*"([^"]*)"""", 1)
      val sq = regexp_extract(a, """(?is)href\s*=\s*'([^']*)'""", 1)
      when(dq =!= "", dq).otherwise(sq)
    }
    filter(transform(anchors, a => hrefOf(a)), u => u =!= "")
  }

  /** Anchor (href, text) pairs in document order — the link-CONTEXT
    * extraction behind anchor-text corpora and retrieval training
    * pairs (the anchor's text is a human-written description of the
    * target page): whole `<a …>…</a>` elements matched in order from
    * the chrome-stripped document, each element's href (either
    * quoting) and its inner text (inline tags stripped, entities
    * decoded, whitespace collapsed — [[blockText]]) extracted per
    * element. Anchors without an href (or with an empty one) drop;
    * empty TEXT is kept ('' — image links etc., the href still
    * matters). One zero-shuffle array-of-struct column. */
  def extractAnchors(html: Column): Column = {
    val anchors = regexp_extract_all(
      deChrome(html), lit("""(?is)<a\s[^>]*>.*?</a>"""), lit(0))
    val hrefOf = (a: Column) => {
      val dq = regexp_extract(a, """(?is)href\s*=\s*"([^"]*)"""", 1)
      val sq = regexp_extract(a, """(?is)href\s*=\s*'([^']*)'""", 1)
      when(dq =!= "", dq).otherwise(sq)
    }
    filter(
      transform(anchors, a =>
        struct(hrefOf(a).as("href"), blockText(a).as("text"))),
      s => s.getField("href") =!= "")
  }

  /** `<link rel="canonical">` href of a document — the page's OWN
    * statement of its canonical URL (RefinedWeb-style pipelines dedup
    * on the canonical, not the fetch URL, because mirrors/tracking
    * variants/mobile subdomains all declare the same one). The FIRST
    * canonical link wins (duplicate declarations are malformed; first
    * is the de-facto browser rule); `''` when the document declares
    * none. `rel` and `href` match independently, so attribute order
    * and either quoting both work; chrome is stripped first, so a
    * commented-out or script-quoted link can never match. Zero-shuffle
    * scalar projection. Compose with [[Web.resolveCanonical]] +
    * [[Web.canonicalCollapse]]. */
  def extractCanonical(html: Column): Column = {
    val links = regexp_extract_all(
      deChrome(html), lit("""(?is)<link\s[^>]*>"""), lit(0))
    val canon = filter(links,
      l => l.rlike("""(?is)rel\s*=\s*("canonical"|'canonical')"""))
    val hrefOf = (l: Column) => {
      val dq = regexp_extract(l, """(?is)href\s*=\s*"([^"]*)"""", 1)
      val sq = regexp_extract(l, """(?is)href\s*=\s*'([^']*)'""", 1)
      when(dq =!= "", dq).otherwise(sq)
    }
    val hrefs = filter(transform(canon, l => trim(hrefOf(l))), u => u =!= "")
    when(size(hrefs) > 0, element_at(hrefs, 1)).otherwise(lit(""))
  }

  /** Sitemap `<loc>` extraction — the third crawl-discovery surface
    * next to outlinks and robots rules (sitemaps.org protocol: one
    * `<loc>` per `<url>` entry): every `<loc>` value in document order,
    * trimmed, comments removed first (a commented-out entry is not a
    * URL). Zero-shuffle array column; compose with
    * [[Web.normalizeUrl]]/[[Web.policyFilter]] exactly like extracted
    * links. */
  def extractSitemapLocs(xml: Column): Column =
    filter(
      transform(
        regexp_extract_all(
          regexp_replace(xml, """(?s)<!--.*?-->""", " "),
          lit("""(?is)<loc>([^<]*)</loc>"""), lit(1)),
        u => trim(u)),
      u => u =!= "")

  /** The zero-shuffle extraction: document → content as ONE column
    * expression (nested higher-order functions over the block array —
    * no explode, no aggregation, no exchange; the 100 TB path is a
    * plain projection riding the scan). Kept blocks' text re-joined
    * with `\n` in document order. Composes directly into
    * [[TextCorpus.qualityFlags]] / boilerplate / langid downstream. */
  def extractedText(
      html: Column, densityX10: Int = 3, minWords: Int = 4,
      minStopPct: Int = 0,
      stopwords: Seq[String] = DefaultStopwords): Column = {
    val texts = transform(
      filter(rawBlocks(html), b => length(trim(b)) > 0),
      b => struct(blockText(b).as("t"), length(trim(b)).cast("long").as("rl")))
    val kept = filter(texts, s => {
      val t = s.getField("t")
      val words = wordsOf(t)
      keepRule(s.getField("rl"), length(t).cast("long"),
        size(words).cast("long"), stopCount(t, stopwords),
        densityX10, minWords, minStopPct)
    })
    array_join(transform(kept, s => s.getField("t")), "\n")
  }
}
