package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the message log — the funnel / cohort
  * reports an OLAP user runs against the same events a store serves
  * (reference read model: `ReadonlyStreamStoreBase.cs` positions +
  * per-stream ordering; these operators consume that order).
  *
  * Both operators are pure integer/count pipelines (timestamps stay
  * micros-since-epoch longs end to end), so results are bit-exact and
  * DuckDB-oracle-checkable.
  */
object Behavioral {

  /** Ordered funnel: for each prefix of `steps`, how many entities
    * completed the whole prefix IN ORDER (first-touch semantics: step i
    * must occur strictly after the EARLIEST qualifying occurrence of
    * step i−1). Returns one row per step: (step, event_type, entities).
    *
    * Shape: one conditional-min aggregation per step, each a shuffle on
    * `idCol` over a monotonically SHRINKING frontier — the classic
    * warehouse funnel, not a per-entity sort. At 100 TB: the events scan
    * repeats per step but with `event_type = stepᵢ` pushed into the
    * parquet scan (a selective dictionary filter), and every join keys
    * on the same `idCol`, so a bucketed-by-id layout
    * ([[graft.sources.BucketedTables]]) makes all k passes exchange-free
    * on the frontier side. Frontiers only shrink, and broadcast once
    * under the AQE threshold. k is funnel length (3-6), not data-sized.
    *
    * First-touch (min-ts) funnels can under-count re-entrant paths
    * (an entity that aborts after step 1 and later re-runs the full
    * funnel still anchors at its first step-1 touch); that is the
    * standard trade for a deterministic single-anchor definition and
    * matches the oracle exactly.
    */
  def funnel(
      events: DataFrame, idCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    funnelFrontiers(events, idCol, typeCol, tsCol, steps)
      .zip(steps).zipWithIndex.map { case ((f, step), i) =>
        f.agg(count(lit(1)).as("entities"))
          .select(lit(i + 1).cast("int").as("step"),
            lit(step).as("event_type"), col("entities"))
      }.reduce(_.unionAll(_))
  }

  /** The funnel's per-step frontier frames — frontier(i) has one row per
    * entity that completed steps 0..i, with the earliest completion time
    * of step i given the step i−1 anchor. Exposed so the exchange-free
    * claim over a bucketed-by-id layout is a pinned plan-shape test
    * (PlanShapeSpec), not a doc-comment assertion. */
  def funnelFrontiers(
      events: DataFrame, idCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(idCol), col(typeCol), col(tsCol))
    val first = ev.filter(col(typeCol) === steps.head)
      .groupBy(idCol).agg(min(tsCol).as("t"))
    steps.tail.scanLeft(first) { (prev, step) =>
      ev.filter(col(typeCol) === step)
        .join(prev.select(col(idCol), col("t").as("prev_t")), idCol)
        .filter(col(tsCol) > col("prev_t"))
        .groupBy(idCol).agg(min(tsCol).as("t"))
    }
  }

  /** Cohort retention: entities are cohorted by the epoch-week of their
    * first activity; each (cohort_week, week_offset) cell counts the
    * distinct entities from that cohort active `offset` weeks later.
    * Weeks are `floor(us / 7·86400·10⁶)` — integer division on the raw
    * micros, no calendar/timezone semantics to diverge on.
    *
    * Shape: distinct on (id, week) first — that one shuffle collapses
    * the event volume to ≤ |entities|·|weeks| rows and every later step
    * runs on the collapsed frame: the per-entity min is a partial-agg
    * shuffle on id (same key ⇒ co-located), and the final cell count is
    * an agg over (cohort, offset) — a frame bounded by weeks², tiny at
    * any corpus size. `count(distinct id)` inside the final agg is safe
    * because (id, week) is already unique ⇒ Spark plans it as a plain
    * count after the existing distinct, no expand-node blowup. */
  def cohortRetention(
      events: DataFrame, idCol: String, tsCol: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // `div` is exact long division (DuckDB `//`); `/` would detour
    // through double
    val idWeek = events
      .select(col(idCol), expr(s"CAST($tsCol AS BIGINT) div $weekUs").as("week"))
      .distinct()
    val cohorts = idWeek.groupBy(idCol).agg(min("week").as("cohort_week"))
    idWeek.join(cohorts, idCol)
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col(idCol)).as("active_entities"))
  }
}
