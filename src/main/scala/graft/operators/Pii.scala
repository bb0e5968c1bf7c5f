package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass a training-data
  * pipeline runs before anything leaves the raw corpus (emails, IP
  * addresses, phone numbers, long id-like digit runs). The reference's
  * message log has no text ops; this belongs to the "beyond the
  * reference" pipeline family of SURVEY §2.12.
  *
  * Everything here is `regexp_count`/`regexp_replace` over dialect-
  * neutral patterns (the Java-regex ∩ RE2 subset: character classes,
  * bounded quantifiers, no lookaround, no backreferences), so the same
  * pattern text drives Spark and the DuckDB oracle, and the whole
  * operator is a codegen'd projection in the scan — zero shuffle, which
  * is exactly what a 100 TB scrub pass must be. Redaction is staged
  * (email → IPv4 → phone → digit-run) and each count is taken on the
  * PREVIOUS stage's output, so a phone's digits are never double-counted
  * as an id run; placeholders are letters-only so later stages can't
  * re-match inside them.
  *
  * Patterns expect lower-cased text (run [[TextCorpus.normalized]]-style
  * lowercasing upstream if the corpus is mixed-case); they are detectors
  * tuned for recall on machine-formatted PII, not validators (an IPv4
  * octet of 999 still redacts — wrong as a parser, right as a scrubber).
  */
object Pii {

  /** `user.name+tag@host.example` — local part, host labels, 2-6 letter TLD. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,6}"

  /** Four dot-separated 1-3 digit octets (recall-tuned, not range-checked). */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** International-format number: `+` followed by 7-12 digits. */
  val PhonePattern = "\\+[0-9]{7,12}"

  /** Bare digit runs of 9+ (account / national-id shaped). Counted after
    * phone redaction so a phone body is not re-counted. */
  val IdNumPattern = "[0-9]{9,}"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"
  val IdTag = "<ID>"

  /** Redaction stages in application order: later patterns run on the
    * output of earlier ones. */
  private val Stages: Seq[(String, String)] = Seq(
    EmailPattern -> EmailTag,
    Ipv4Pattern -> IpTag,
    PhonePattern -> PhoneTag,
    IdNumPattern -> IdTag)

  /** The fully-redacted text: one chained `regexp_replace` projection. */
  def redact(text: Column): Column =
    Stages.foldLeft(text) { case (c, (pat, tag)) => regexp_replace(c, pat, tag) }

  /** Per-document PII counts and the redacted text:
    * `(id, n_emails, n_ipv4, n_phones, n_idnums, redacted)`. Counts are
    * per-stage (each on the previous stage's redacted output) so a
    * document's PII budget sums exactly: the four counts equal the
    * number of tags in `redacted`. Pure stateless projection — the plan
    * is a single whole-stage-codegen map over the scan, no shuffle, no
    * UDFs; at 100 TB it is bounded by scan bandwidth alone. */
  def piiStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailPattern, EmailTag)
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, IpTag)
    val afterPhone = regexp_replace(afterIp, PhonePattern, PhoneTag)
    val afterId = regexp_replace(afterPhone, IdNumPattern, IdTag)
    docs.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(Ipv4Pattern)).cast("long").as("n_ipv4"),
      regexp_count(afterIp, lit(PhonePattern)).cast("long").as("n_phones"),
      regexp_count(afterPhone, lit(IdNumPattern)).cast("long").as("n_idnums"),
      afterId.as("redacted"))
  }

  /** Documents whose PII count crosses `maxPii` — the quarantine set a
    * pipeline routes to manual review instead of training. Same single
    * projection plus a codegen'd filter. */
  def quarantine(docs: DataFrame, maxPii: Long = 0L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    piiStats(docs, idCol, textCol)
      .withColumn("n_pii",
        col("n_emails") + col("n_ipv4") + col("n_phones") + col("n_idnums"))
      .filter(col("n_pii") > maxPii)

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002): the
    * equivalence classes of `qiCols` with their sizes and whether each
    * class falls below `k` — a release containing a sub-k class lets its
    * rows be singled out by the QI combination alone, so those classes
    * must be suppressed or generalized before the data ships. Output:
    * the QI columns + `(class_size, suppressed)`.
    *
    * ONE groupBy shuffle on the QI tuple, collapsed map-side to
    * |classes| rows by partial aggregation — at 100 TB the exchange
    * moves class counts, not rows, and the audit costs the same as any
    * distinct-count over the release. */
  def kAnonymityClasses(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("suppressed", col("class_size") < k)
  }

  /** The enforcement twin: rows whose QI class has ≥ `k` members (the
    * k-anonymous release); sub-k classes drop entirely. The class-size
    * frame re-joins on the QI key — same hash partitioning as the audit
    * aggregation, so the planner reuses one exchange per side and
    * nothing broadcasts corpus-sized state. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    df.join(
      kAnonymityClasses(df, qiCols, k).filter(!col("suppressed"))
        .select(qiCols.map(col): _*),
      qiCols)

  /** Distinct l-diversity audit (Machanavajjhala et al., ICDE'06): a
    * k-anonymous class still leaks when every member shares the same
    * SENSITIVE value — homogeneity attack. Per QI class: size, number
    * of distinct sensitive values, and whether it fails `l` (fewer than
    * `l` distinct sensitive values ⇒ the release must generalize
    * further). Same single QI-keyed shuffle as [[kAnonymityClasses]];
    * the distinct-count partial-aggregates map-side, so the exchange
    * carries (class, value) pairs at worst — bounded by the release's
    * distinct surface, not its row count. */
  def lDiversityClasses(
      df: DataFrame, qiCols: Seq[String], sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** t-closeness audit (Li et al., ICDE'07 — the third rung of the
    * privacy ladder after k-anonymity and l-diversity): a diverse class
    * still leaks when its sensitive DISTRIBUTION skews far from the
    * corpus's (skewness attack: "this class is 90% high-balance" is a
    * disclosure even with many distinct values). For an ORDERED
    * sensitive attribute the distance is the Earth Mover's Distance,
    * which over the ordered support is just prefix sums:
    * EMD = (1/(m−1))·Σ_i |P_class(≤ v_i) − P_global(≤ v_i)|. Kept
    * exact-integer by cross-multiplying the two denominators:
    *
    *   emd_num = Σ_i |n_total·cpref_i − n_class·gpref_i|
    *   close  ⇔ emd_num·tDen ≤ tNum·n_class·n_total·(m−1)
    *
    * so t = tNum/tDen never becomes a float and no division happens.
    * Products run in decimal(38,0): n_total·cpref reaches n² — int64
    * dies at ~3 G rows, well inside 100 TB.
    *
    * Shape: one (QI, v) cell aggregate is the only corpus-sized pass;
    * the global distribution (m rows, one per sensitive value — BAND
    * the attribute upstream so m stays window-friendly) broadcasts
    * onto the |classes| frame, and the dense |classes|×m grid (missing
    * cells are zero — they still accumulate |prefix| distance, which a
    * sparse join would silently drop) carries the per-class prefix
    * window. */
  def tClosenessClasses(
      df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      tNum: Long, tDen: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tNum >= 0 && tDen >= 1, s"need t = tNum/tDen >= 0: $tNum/$tDen")
    val qi = qiCols.map(col)
    val d = "decimal(38,0)"
    val cells = df.groupBy(qi :+ col(sensitiveCol).as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val global = df.groupBy(col(sensitiveCol).as("_v"))
      .agg(count(lit(1)).as("_g"))
      .withColumn("gpref",
        sum(col("_g")).over(Window.orderBy(col("_v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_total", sum(col("_g")).over(Window.partitionBy()))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
      .select("_v", "gpref", "n_total", "m")
    val classes = df.groupBy(qi: _*).agg(count(lit(1)).as("class_size"))
    val grid = classes.crossJoin(broadcast(global)) // dense |classes| × m
      .join(cells, qiCols :+ "_v", "left")
      .na.fill(0L, Seq("_c"))
    val cpref = sum(col("_c")).over(
      Window.partitionBy(qi: _*).orderBy(col("_v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grid
      .withColumn("term", abs(col("n_total").cast(d) * cpref -
        col("class_size").cast(d) * col("gpref")))
      .groupBy(qi :+ col("class_size") :+ col("n_total") :+ col("m"): _*)
      .agg(sum(col("term")).cast(d).as("emd_num"))
      .withColumn("close",
        col("emd_num") * tDen <=
          lit(tNum).cast(d) * col("class_size") * col("n_total") * (col("m") - 1L))
      .select(qi :+ col("class_size") :+ col("m") :+ col("n_total") :+
        col("emd_num") :+ col("close"): _*)
  }
}
