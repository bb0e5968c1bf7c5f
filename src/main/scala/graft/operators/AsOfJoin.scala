package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier) join: for each left row, attach the most
  * recent right row per key whose time is at or before the left row's
  * time — the temporal-state lookup analytics engines ship natively
  * (DuckDB `ASOF JOIN`, which is the correctness oracle for the
  * `asof_join` gate query) and Spark lacks.
  *
  * Spark-first plan: instead of a range join (O(left × right-per-key))
  * or a per-key driver loop, tag both sides, union them, and carry the
  * right payload forward with a running `last(ignoreNulls)` window —
  * ONE shuffle on the key, one sort within partitions (the distributed
  * merge-join shape), no broadcast, no driver state. Cost is
  * O((|L|+|R|) log) per partition and scales with keys × time, so the
  * plan survives 100× data: the window never looks beyond the current
  * row, whole-stage codegen covers the union+filter, and skew follows
  * per-key row counts exactly like any keyed aggregation.
  *
  * Tie semantics: a right row at exactly the left row's time IS visible
  * (`_side` orders right before left at equal timestamps), matching
  * DuckDB's `l.ts >= r.ts`. The right side must be unique per
  * (key, time) — pre-aggregate duplicates, or the carried payload is
  * whichever duplicate sorted last.
  */
object AsOfJoin {

  /** Left rows with `payload` columns of the latest right row at or
    * before `leftTs`, null when no right row precedes. Right payload
    * columns are prefixed with `prefix` in the output.
    *
    * @param keys     equi-join key columns, present on both sides
    * @param leftTs   left event-time column (any orderable type; use the
    *                 same domain as `rightTs` — e.g. both long nanos)
    * @param rightTs  right event-time column
    * @param payload  right columns to carry (must not collide with left
    *                 columns once prefixed)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asOf needs at least one key column")
    val prefixed = payload.map(prefix + _)
    require(!prefixed.exists(left.columns.contains),
      s"prefixed payload collides with left columns: ${prefixed.mkString(",")}")
    require(!left.columns.exists(_.startsWith("_asof_")),
      "left columns must not use the reserved _asof_ prefix")

    val l = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_side", lit(1))
    // the whole right payload rides ONE struct: a right row's struct is
    // never null (even when every field inside is), so the running
    // last(ignoreNulls) picks the latest right ROW atomically — a null
    // field is carried as null instead of falling through to an older
    // row, and multi-column payloads can never stitch together values
    // from different right rows
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("_asof_ts"), lit(0).as("_asof_side"),
          struct(payload.map(col): _*).as("_asof_payload")): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts").asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof_payload", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
    payload.zip(prefixed)
      .foldLeft(filled) { case (df, (c, p)) =>
        df.withColumn(p, col("_asof_payload").getField(c))
      }
      .drop("_asof_ts", "_asof_side", "_asof_payload")
  }

  /** Convenience: latest value of `valueCol` from `right` at or before
    * each left row, as a single `asof_<valueCol>` column. */
  def asOfValue(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      valueCol: String): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, Seq(valueCol))
}
