package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture log replay — turn an ORDERED change log (each row
  * an insert/update/delete against a key) into the current snapshot, or
  * into per-key change statistics. This is the ingest half of the
  * lakehouse loop: [[Merge.upsert]] applies a one-batch change SET to an
  * existing snapshot; `applyChangeLog` collapses an arbitrarily long
  * change HISTORY (a Debezium-style feed, an event-sourced entity log —
  * exactly the reference's stream-per-entity model, ref:
  * src/SqlStreamStore/Streams/ReadStreamPage.cs reading one entity's
  * ordered history) straight to final state with no per-batch loop.
  *
  * Implementation: one `row_number` window per key over the log order
  * DESCENDING — the newest row per key decides existence (delete ⇒ the
  * key is absent) and carries the final values. Latest-wins needs a
  * TOTAL order, so callers pass tie-break columns; replays pick the same
  * row every time.
  *
  * 100 TB shape: ONE shuffle of the log on the key, per-key sort bounded
  * by that key's history length (entity histories are short; a skewed
  * entity is a data bug this surfaces rather than hides). No join at
  * all — contrast MERGE's full-outer join — because the log IS the whole
  * state. Snapshot-plus-tail reads compose as
  * `applyChangeLog(snapshotAsInserts ∪ tail)` with the snapshot ordered
  * before the tail. */
object Cdc {

  /** Final snapshot after replaying the whole change log.
    *
    * @param opCol     string column: "d" = delete, anything else upserts
    * @param orderCols log order per key, later = newer; must be total
    *                  (include a unique id as the last tiebreak)
    * @return one row per surviving key, with the key columns and the
    *         newest row's remaining columns (minus `opCol`)
    */
  def applyChangeLog(
      log: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      opCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "d")
      .drop("_rn", opCol)
  }

  /** Per-key churn report over the same single shuffle: how many
    * upserts/deletes each key saw, whether it currently exists, and the
    * log position of its newest change — the feed-health numbers a CDC
    * pipeline alarms on (delete storms, hot keys, resurrection counts). */
  def churnStats(
      log: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      opCol: String): DataFrame = {
    val newestOp = {
      // max_by over the total order: struct-ordering trick keeps this a
      // plain partial-aggregable max, no window needed
      val ord = struct(orderCols.map(col) :+ col(opCol): _*)
      max(ord).getField(opCol)
    }
    log.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_changes"),
        sum(when(col(opCol) === "d", 1L).otherwise(0L)).as("n_deletes"),
        (newestOp =!= "d").as("exists"))
  }
}
