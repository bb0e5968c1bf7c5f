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
}
