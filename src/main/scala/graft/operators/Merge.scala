package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert + delete) — the snapshot-maintenance primitive:
  * apply a change set to a base table, latest-wins per key, producing
  * the next snapshot. The lakehouse formats' MERGE INTO, expressed as
  * one co-partitioned full-outer join:
  *
  *   - matched + update  → update columns win (`coalesce` update-side
  *     first);
  *   - matched + delete  → row dropped;
  *   - unmatched update  → inserted;
  *   - unmatched base    → carried unchanged.
  *
  * 100 TB shape: ONE shuffle of each side on the merge key (with both
  * sides bucketed by the key — [[graft.sources.BucketedTables]] — even
  * that exchange disappears); no window, no driver state. The change
  * set must be key-unique (one verdict per key per batch — the same
  * precondition real MERGE INTO enforces with a cardinality check);
  * [[dedupeChanges]] collapses a raw change LOG to latest-wins first. */
object Merge {

  /** Collapse a change log to one row per key: greatest `versionCol`
    * wins, ties broken by `tieCol` — deterministic under replays. */
  def dedupeChanges(
      changes: DataFrame, keyCols: Seq[String], versionCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(tieCol).desc)
    changes.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Next snapshot of `base` after applying `updates`.
    *
    * @param keyCols   merge key (unique in both inputs)
    * @param deleteCol optional boolean column in `updates`: true = delete
    *                  the key; other update columns ignored for that row
    */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    val dataCols = base.columns.filterNot(keyCols.contains)
    val upd = deleteCol.map(d => updates.withColumnRenamed(d, "_del"))
      .getOrElse(updates.withColumn("_del", lit(false)))
      .withColumn("_hit", lit(true))
    val renamed = upd.columns.foldLeft(upd) { (df, c) =>
      if (keyCols.contains(c) || c == "_del" || c == "_hit") df
      else df.withColumnRenamed(c, s"_u_$c")
    }
    val joined = base.join(renamed, keyCols, "full_outer")
      .filter(coalesce(col("_del"), lit(false)) === false)
    val out = dataCols.foldLeft(joined) { (df, c) =>
      if (renamed.columns.contains(s"_u_$c"))
        df.withColumn(c, when(coalesce(col("_hit"), lit(false)), col(s"_u_$c")).otherwise(col(c)))
      else df
    }
    out.select(base.columns.map(col).toIndexedSeq: _*)
  }

  /** Incremental maintenance of a sum/count rollup — the
    * self-maintainable-view primitive (Gupta & Mumick's classic
    * taxonomy: SUM and COUNT are distributive, so the next state of the
    * aggregate is a function of the OLD AGGREGATE plus the DELTA alone;
    * the base data is never rescanned). `baseAgg` is the materialized
    * rollup (`keyCols` ++ `sumCols` ++ `countCol`), `deltaRows` are raw
    * inserted rows carrying `keyCols` ++ `sumCols`; the result is the
    * next rollup snapshot.
    *
    * Implementation: aggregate the delta (map-side combined — the only
    * pass over new data), then union with the old rollup and re-aggregate
    * over the UNION OF AGGREGATES, which costs |baseAgg| + |deltaAgg|
    * rows — at 100 TB the rollup is megabytes while the base data is the
    * 100 TB, which is the entire point: nightly maintenance touches the
    * delta partition and a tiny summary frame, never the history. Sums
    * must be over exact types (decimal/long) for the merge to be
    * bit-equal to a full recompute regardless of grouping order; pass
    * doubles pre-cast to decimal. AVG-style ratios derive from
    * (sum, count) downstream; MIN/MAX are insert-only-maintainable the
    * same way, but not under deletes — deletes require the
    * [[upsert]]-style full recompute of the touched keys only. */
  def maintainAgg(
      baseAgg: DataFrame,
      deltaRows: DataFrame,
      keyCols: Seq[String],
      sumCols: Seq[String],
      countCol: String = "n"): DataFrame = {
    require(keyCols.nonEmpty && sumCols.nonEmpty,
      "maintainAgg needs at least one key column and one sum column")
    val aggOf: DataFrame => DataFrame = df =>
      df.groupBy(keyCols.map(col): _*)
        .agg(sum(col(sumCols.head)).as(sumCols.head),
          (sumCols.tail.map(c => sum(col(c)).as(c)) :+
            count(lit(1)).as(countCol)): _*)
    val deltaAgg = aggOf(deltaRows)
    baseAgg.select((keyCols ++ sumCols :+ countCol).map(col): _*)
      .unionByName(deltaAgg)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        (sumCols.tail.map(c => sum(col(c)).as(c)) :+
          sum(col(countCol)).as(countCol)): _*)
  }

  /** Join-view delta maintenance — the IVM algebra for inner joins
    * (the [[maintainAgg]] idea one operator up the plan): with base
    * relations split into old + insert-delta (A = A₀ ∪ ΔA, B = B₀ ∪ ΔB,
    * deltas disjoint from bases),
    *
    *   A ⋈ B = V₀ ∪ (ΔA ⋈ B₀) ∪ (A₀ ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    *
    * exactly — set algebra, no approximation — so a nightly refresh
    * joins the deltas against the (indexed, usually much larger) bases
    * and appends, instead of re-joining two full histories. The gate
    * proves the identity against a full-recompute oracle.
    *
    * Shape: three delta-sided joins instead of one history×history
    * join; each delta side is small by definition, so the planner
    * broadcasts it and the big sides stream through untouched — the
    * cost asymmetry that makes materialized-view maintenance viable at
    * 100 TB. `unionByName` guards the column alignment a positional
    * union would silently scramble. */
  def maintainJoin(
      v0: DataFrame, a0: DataFrame, dA: DataFrame,
      b0: DataFrame, dB: DataFrame, joinCols: Seq[String]): DataFrame =
    v0.unionByName(dA.join(b0, joinCols))
      .unionByName(a0.join(dB, joinCols))
      .unionByName(dA.join(dB, joinCols))
}
