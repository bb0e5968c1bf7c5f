package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the contract check a pipeline
  * runs before promoting a batch (the Deequ/Great-Expectations shape,
  * built as plain aggregates): each rule is a row predicate, the report
  * is one row per rule with checked/violation counts. Schema-on-write
  * guards the reference enforces imperatively per append (message id
  * format, expected-version preconditions — ref:
  * src/SqlStreamStore/Streams/NewStreamMessage.cs argument checks)
  * become declarative corpus-wide audits here.
  *
  * 100 TB shape: ALL row rules evaluate in ONE scan — each rule is a
  * `sum(case when violated)` pair inside a single global aggregate, so
  * the cost is the scan plus a few counters per partition (classic
  * partial aggregation; adding a rule adds a counter, not a pass).
  * Cross-row rules can't ride a row predicate: uniqueness is one
  * groupBy on the checked key counting keys seen more than once;
  * referential integrity is one left-anti probe of the (pre-aggregated,
  * usually broadcastable) referenced key set. Both report through the
  * same (rule, n_checked, n_violations) schema so downstream gating is
  * uniform. */
object Validation {

  /** A named row-level predicate; `ok` evaluates per row, null counts
    * as a violation (null-hostile like SQL CHECK semantics would NOT
    * be — a constraint that cannot be proven true is a violation). */
  final case class Rule(name: String, ok: Column)

  /** One-scan report for row-level rules: (rule, n_checked, n_violations). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val counters = rules.flatMap { r =>
      Seq(count(lit(1)).as(s"c__${r.name}"),
        sum(when(coalesce(r.ok, lit(false)), 0L).otherwise(1L)).as(s"v__${r.name}"))
    }
    val agg = df.agg(counters.head, counters.tail: _*)
    // pivot the single counter row to one row per rule without touching
    // the data again: explode over a literal rule-name array
    val pairs = rules.map(r =>
      struct(lit(r.name).as("rule"), col(s"c__${r.name}").as("n_checked"),
        col(s"v__${r.name}").as("n_violations")))
    agg.select(explode(array(pairs: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_checked").as("n_checked"),
        col("r.n_violations").as("n_violations"))
  }

  /** Uniqueness rule as the same report row: keys checked, keys that
    * appear more than once (violations count KEYS, not rows — the
    * number a dedup step would have to resolve). */
  def uniqueReport(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .agg(lit(name).as("rule"), count(lit(1)).as("n_checked"),
        sum(when(col("_n") > 1, 1L).otherwise(0L)).as("n_violations"))
      .select("rule", "n_checked", "n_violations")

  /** Functional-dependency audit — approximate-FD profiling (the
    * Tane/Metanome family's verification step, run over candidate
    * pairs): does lhs → rhs hold, and if not, how badly is it broken?
    * One row per candidate: distinct lhs keys, keys mapping to more
    * than one distinct rhs (the violating keys a normalization or
    * golden-record step would have to resolve), the worst key's rhs
    * fan-out, and total rows. `n_violating_keys = 0` certifies the
    * dependency; the fan-out says whether violations are near-misses
    * (2) or free-for-alls.
    *
    * 100 TB shape: each candidate is a two-column projection (column
    * pruning reaches the scan) into a two-level aggregate — groupBy lhs
    * with an exact count_distinct(rhs) (expands to the (lhs, rhs)
    * distinct pre-aggregate, map-side combined), then a |keys|-row
    * roll-up to ONE row. k candidates = k independent pruned passes
    * unioned; no pass ever shuffles more than the (lhs, rhs) distinct
    * pairs. Deliberately NOT one Expand-based multi-distinct pass — the
    * per-candidate plan keeps each shuffle pruned to its own two
    * columns (the `table_profile` lesson: Expand multiplies the corpus
    * by k before the first combine). */
  def fdAudit(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "at least one candidate")
    candidates.map { case (lhs, rhs) =>
      df.select(col(lhs), col(rhs))
        .groupBy(col(lhs))
        .agg(count_distinct(col(rhs)).as("_d"), count(lit(1)).as("_n"))
        .agg(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          count(lit(1)).as("n_keys"),
          sum(when(col("_d") > 1, 1L).otherwise(0L)).as("n_violating_keys"),
          max(col("_d")).as("max_fanout"),
          sum(col("_n")).as("n_rows"))
        .select("lhs", "rhs", "n_keys", "n_violating_keys", "max_fanout", "n_rows")
    }.reduce(_ union _)
  }

  /** Order-dependency audit: within each partition key, ordered by a
    * sequence column, count adjacent pairs where `valCol` DECREASES —
    * the sortedness contract check (is ship date nondecreasing along
    * the line numbers of an order? did the clock ever run backwards
    * within a session?). Reports (rule, n_checked, n_violations) like
    * every other rule, where n_checked counts adjacent pairs (rows with
    * a predecessor) so a violation-free audit reads 0/npairs.
    *
    * Shape: one shuffle on the partition key for the lag window (sort
    * runs bounded by group size), then a global count pair — never a
    * corpus-global sort. NULL values never count as violations (a
    * constraint over missing data is vacuous, matching [[report]]'s
    * CHECK semantics on the comparison itself being null).
    *
    * `seqCols` must be a TOTAL order per partition for the count to be
    * engine-deterministic; when the natural sequence column has ties,
    * append the audited value itself as the tiebreaker (tie-block pairs
    * then compare equal — never a violation — and the value sequence is
    * the same under any permutation of equal keys). */
  def orderAudit(
      df: DataFrame, name: String, partCols: Seq[String], seqCols: Seq[String],
      valCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*).orderBy(seqCols.map(col): _*)
    df.withColumn("_prev", lag(col(valCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .agg(lit(name).as("rule"), count(lit(1)).as("n_checked"),
        sum(when(col(valCol) < col("_prev"), 1L).otherwise(0L)).as("n_violations"))
      .select("rule", "n_checked", "n_violations")
  }

  /** Inclusion-dependency audit — the foreign-key DISCOVERY twin of
    * [[fkReport]]: does every distinct value of lhsCol appear in
    * rhsCol? One row per candidate: distinct lhs values and how many
    * are missing from the rhs (0 certifies the IND — together with
    * [[fdAudit]]'s key certification this is the schema-discovery
    * pair: INDs find the edges, FDs find the keys). Distinct-VALUE
    * semantics, not row counts: "3 orphaned customer ids" is the
    * discovery answer even when they cover a million rows — row-volume
    * impact is [[fkReport]]'s job.
    *
    * Shape: both sides pre-aggregate to distinct values (map-side
    * combined, the shuffle carries value sets, not rows), then one
    * value-keyed anti-join and a one-row roll-up. At dimension scale
    * the rhs set broadcasts; value-set sizes, not table sizes, bound
    * every exchange. */
  def indAudit(
      name: String, lhs: DataFrame, lhsCol: String,
      rhs: DataFrame, rhsCol: String): DataFrame = {
    val lv = lhs.select(col(lhsCol).as("_v")).distinct()
    val rv = rhs.select(col(rhsCol).as("_v")).distinct()
    val missing = lv.join(rv, Seq("_v"), "left_anti")
      .agg(count(lit(1)).as("n_missing_values"))
    lv.agg(count(lit(1)).as("n_values")).crossJoin(missing)
      .select(lit(name).as("candidate"), col("n_values"), col("n_missing_values"))
  }

  /** Bucketed table digest for anti-entropy sync (the Merkle-exchange
    * idea flattened to one level, the Cassandra/DynamoDB repair
    * primitive): each row hashes to a 48-bit integer (md5 prefix — both
    * engines parse hex exactly), rows bucket by key mod `nBuckets`, and
    * a bucket's digest is the plain SUM of its row hashes — commutative
    * and associative, so it map-side combines, never sorts, and two
    * replicas can compare 256 rows instead of a billion. 48-bit hashes
    * keep a billion-row bucket's sum under 2⁶³; a colliding pair that
    * ALSO survives the sum is ~2⁻⁴⁸ per bucket — the standard
    * anti-entropy trade, stated rather than hidden.
    *
    * Payload columns are cast to string and joined with a \u0001 separator before
    * hashing; callers must pick columns whose string form is
    * engine-stable (ints, strings — not raw doubles). A NULL payload
    * hashes as a \u0000 sentinel: concat_ws SKIPS null fields, so
    * without it (null, "x") and ("x", null) would digest identically
    * and a real replica difference could vanish — the one failure an
    * integrity checker must not have. (A literal NUL payload value
    * still collides with NULL; keep NUL out of payload text, the
    * usual hygiene rule.) */
  def syncDigest(
      df: DataFrame, keyCol: String, payloadCols: Seq[String],
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1)
    val payload = concat_ws("\u0001",
      (keyCol +: payloadCols).map(c =>
        coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    df.select(pmod(col(keyCol), lit(nBuckets)).cast("long").as("bucket"),
        conv(substring(md5(payload), 1, 12), 16, 10).cast("long").as("_h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), sum(col("_h")).as("digest"))
  }

  /** The comparison half of anti-entropy: bucket digests of two table
    * versions full-outer-joined, emitting ONLY the buckets that differ
    * (count or digest) — the 1/nBuckets-th keyspace slices a repair
    * pass must re-read. Missing buckets surface as n_rows = 0 /
    * digest = 0 rather than nulls so the report is arithmetic-friendly.
    *
    * Shape: two independent digest passes (each one scan + one
    * |buckets|-row aggregate) and a |buckets|-row join — the whole
    * comparison moves 2·nBuckets rows regardless of table size, which
    * is the entire point at 100 TB. */
  def syncDiff(
      a: DataFrame, b: DataFrame, keyCol: String, payloadCols: Seq[String],
      nBuckets: Int): DataFrame = {
    val da = syncDigest(a, keyCol, payloadCols, nBuckets)
      .withColumnRenamed("n_rows", "n_rows_a").withColumnRenamed("digest", "digest_a")
    val db = syncDigest(b, keyCol, payloadCols, nBuckets)
      .withColumnRenamed("n_rows", "n_rows_b").withColumnRenamed("digest", "digest_b")
    da.join(db, Seq("bucket"), "full")
      .na.fill(0L, Seq("n_rows_a", "n_rows_b", "digest_a", "digest_b"))
      .filter(col("n_rows_a") =!= col("n_rows_b") ||
        col("digest_a") =!= col("digest_b"))
  }

  /** Referential-integrity rule: rows of `df` whose `fkCol` has no match
    * in `ref.pkCol`. The referenced keys pre-aggregate to distinct before
    * the anti-join, so the probe side is the small dimension-key set
    * (broadcastable at dimension scale) and the fact side never
    * shuffles more than once. */
  def fkReport(
      df: DataFrame, name: String, fkCol: String,
      ref: DataFrame, pkCol: String): DataFrame = {
    val keys = ref.select(col(pkCol).as("_pk")).distinct()
    val missing = df.join(keys, col(fkCol) === col("_pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val total = df.agg(count(lit(1)).as("n_checked"))
    total.crossJoin(missing)
      .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
  }

  /** Pairwise clustering evaluation — the quality score for any
    * grouping operator (near-dup groups, entity-resolution clusters,
    * k-means cells) against a gold assignment: of all same-cluster
    * item PAIRS, how many does the prediction get right? Emits the
    * exact pair counts (pairwise precision = tp/pred, recall = tp/gold
    * at render time; B³ and ARI derive from the same cells):
    *
    *   pred_pairs = Σ_pred C(n,2),  gold_pairs = Σ_gold C(n,2),
    *   tp_pairs   = Σ_(pred,gold) C(n,2),  fp = pred−tp,  fn = gold−tp
    *
    * Every id must carry BOTH labels (coalesce singletons to their own
    * id upstream — an absent prediction is a singleton claim, and
    * leaving those rows out would silently inflate precision).
    *
    * 100 TB shape: three keyed counts over the assignment frame (each
    * map-side combined) reduced to one row apiece and cross-joined as
    * broadcasts — nothing data-sized moves twice, no pair ever
    * materializes (the C(n,2) arithmetic replaces the self-join every
    * naive pair eval plans). Counts accumulate in decimal(38,0):
    * C(n,2) passes int64 once a cluster exceeds ~6·10⁹ members. */
  def pairwiseClusterEval(
      assign: DataFrame, idCol: String, predCol: String, goldCol: String): DataFrame = {
    val d = "decimal(38,0)"
    def pairsOf(keys: Seq[String], out: String): DataFrame = assign
      .groupBy(keys.map(col): _*).agg(count(lit(1)).cast(d).as("n"))
      .agg(coalesce(sum(col("n") * (col("n") - 1)), lit(0).cast(d)).as("x"))
      .select((col("x") / 2).cast(d).as(out))
    val n = assign.agg(count(lit(1)).as("n_items"))
    n.crossJoin(broadcast(pairsOf(Seq(predCol), "pred_pairs")))
      .crossJoin(broadcast(pairsOf(Seq(goldCol), "gold_pairs")))
      .crossJoin(broadcast(pairsOf(Seq(predCol, goldCol), "tp_pairs")))
      .select(col("n_items"), col("pred_pairs"), col("gold_pairs"), col("tp_pairs"),
        (col("pred_pairs") - col("tp_pairs")).cast(d).as("fp_pairs"),
        (col("gold_pairs") - col("tp_pairs")).cast(d).as("fn_pairs"))
  }

  /** BLEU's modified n-gram precision COUNTS (Papineni et al., ACL
    * 2002 §2.1): per (candidate, reference) pair and per n ≤ maxN,
    * `match_cnt` = Σ over candidate n-gram types of
    * min(count_cand, count_ref) — the CLIPPING that stops "the the
    * the" from scoring — `total_cnt` = candidate n-gram tokens, and
    * `ref_total_cnt` = reference n-gram tokens, so the SAME frame
    * yields BLEU-N precision (match/total) AND ROUGE-N recall
    * (match/ref_total). Plus n=0 rows carrying (cand_len, cand_len,
    * ref_len) for the brevity penalty. Exact integers: corpus BLEU derives downstream as
    * exp(Σ log(Σmatch/Σtotal)/N)·BP — the floats live at render time,
    * the counts hash cross-engine.
    *
    * Use: regression-scoring a generation/translation/summarization
    * model against references, or measuring how much of a reference
    * doc a near-dup candidate reproduces (n-gram containment with
    * clipping).
    *
    * 100 TB shape: n-grams build row-locally (transform over the token
    * array — no explode until the per-(pair, gram) count, which is
    * word-count shaped and map-side combined); one (id, gram) equi-join
    * between the two count frames per n; everything downstream is
    * |pairs|-sized. */
  def ngramPrecisionCounts(
      pairs: DataFrame, candCol: String, refCol: String, idCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 6, "maxN in [1,6]")
    val base = pairs.select(col(idCol).as("id"),
      graft.operators.TextAnalysis.tokens(col(candCol)).as("ct"),
      graft.operators.TextAnalysis.tokens(col(refCol)).as("rt"))
    def gramsExpr(tok: String, n: Int): String =
      s"""transform(sequence(1, size($tok) - ${n - 1}),
         |  i -> ${if (n == 1) s"element_at($tok, i)"
                  else (0 until n).map(k => s"element_at($tok, i + $k)")
                    .mkString("concat_ws(' ', ", ", ", ")")})""".stripMargin
    // size filter FIRST: Spark's sequence(1, 0) yields a DESCENDING
    // [1, 0], not an empty array (the distinctNgramStats guard)
    def counts(tok: String, n: Int): DataFrame = base
      .filter(size(col(tok)) >= n)
      .select(col("id"), explode(expr(gramsExpr(tok, n))).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
    val perN = (1 to maxN).map { n =>
      val c = counts("ct", n)
      val r = counts("rt", n).withColumnRenamed("c", "rc")
      // reference totals ride along so the SAME counts serve ROUGE-N
      // recall (match/ref_total) next to BLEU precision (match/total)
      val refTot = r.groupBy("id").agg(sum(col("rc")).as("ref_total_cnt"))
      c.join(r, Seq("id", "g"), "left")
        .groupBy("id")
        .agg(
          sum(least(col("c"), coalesce(col("rc"), lit(0L)))).as("match_cnt"),
          sum(col("c")).as("total_cnt"))
        .join(refTot, Seq("id"), "full")
        .na.fill(0L, Seq("match_cnt", "total_cnt", "ref_total_cnt"))
        .select(col("id"), lit(n.toLong).as("n"), col("match_cnt"),
          col("total_cnt"), col("ref_total_cnt"))
    }
    // n = 0 row: lengths for the brevity penalty (match = total = |cand|,
    // ref_total = |ref| — a naming convenience, documented)
    val lens = base.select(col("id"), lit(0L).as("n"),
      size(col("ct")).cast("long").as("match_cnt"),
      size(col("ct")).cast("long").as("total_cnt"),
      size(col("rt")).cast("long").as("ref_total_cnt"))
    // candidates shorter than n contribute a (0, 0) row via the left
    // join path only when they have >= 1 n-gram; re-anchor on all ids
    // so every (id, n) pair exists — missing rows would silently skew
    // a corpus-level Σmatch/Σtotal
    val ids = base.select("id").distinct()
    val full = (1 to maxN).map { n =>
      ids.withColumn("n", lit(n.toLong))
    }.reduce(_.unionByName(_))
    full
      .join(perN.reduce(_.unionByName(_)), Seq("id", "n"), "left")
      .na.fill(0L, Seq("match_cnt", "total_cnt", "ref_total_cnt"))
      .unionByName(lens)
  }
}
