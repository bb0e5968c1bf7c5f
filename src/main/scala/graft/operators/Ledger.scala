package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Clamped running balance — the stock-ledger / credit-balance fold:
  * per key, apply signed deltas in order with the balance BOUNDED to
  * [lo, hi] after every step (overdrafts floor, capacity caps). This is
  * the canonical NON-WINDOWABLE fold: clamping makes each step depend
  * on the clamped PREVIOUS result, so no prefix-sum/window rewrite
  * exists (`greatest(lo, least(hi, cumsum))` is a different, wrong
  * function — it clamps the unclamped prefix, losing every
  * intermediate saturation). Engines express it only as recursion
  * (the oracle's recursive CTE) or a sequential fold.
  *
  * Spark-first shape: the secondary-sort pattern — ONE hash exchange on
  * the key, `sortWithinPartitions(key, order…)` so each key's history
  * is contiguous and ordered inside its partition, then ONE
  * `mapPartitions` pass holding a single (key, balance) register that
  * resets on key change. No per-group materialization (a
  * `flatMapGroups` would buffer each group), no driver state, O(1)
  * memory per task — the shape survives keys with million-row
  * histories. The streaming twin is `mapGroupsWithState` carrying the
  * same one-register state; this batch fold IS its replay.
  *
  * Determinism: callers supply a TOTAL per-key order (ts + unique tie);
  * replays and engines fold identically. */
object Ledger {

  /** (key, ts, tie, delta, balance) — balance after each step, clamped
    * to [lo, hi]; fold starts at `clamp(0 + first delta)` per key.
    *
    * All four columns must already be integral: under non-ANSI SQL a
    * silent `cast(string as long)` turns every unparseable key into
    * NULL, merging those rows into ONE null-key fold — silent balance
    * corruption. So the types are validated up front; hash a
    * string/UUID key yourself (`xxhash64(key)`) and scale a decimal
    * delta to integral minor units (micros) before calling. */
  def clampedBalance(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      deltaCol: String, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"empty clamp range: [$lo, $hi]")
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    Seq(keyCol, tsCol, tieCol, deltaCol).foreach { c =>
      val dt = df.schema(c).dataType
      require(integral(dt),
        s"clampedBalance needs an integral '$c', got ${dt.simpleString}: " +
          "hash string/UUID keys (xxhash64) and scale decimal deltas to " +
          "integral minor units before calling — a silent cast would " +
          "merge unparseable rows into one null-key fold")
    }
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(tsCol).cast("long"),
        col(tieCol).cast("long"), col(deltaCol).cast("long"))
      .as[(Long, Long, Long, Long)]
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol), col(tieCol))
      .mapPartitions { it =>
        var curKey = 0L
        var bal = 0L
        var started = false
        it.map { case (k, ts, tie, d) =>
          if (!started || k != curKey) { curKey = k; bal = 0L; started = true }
          bal = math.min(hi, math.max(lo, bal + d))
          (k, ts, tie, d, bal)
        }
      }
      .toDF(keyCol, tsCol, tieCol, deltaCol, "balance")
  }
}
