package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual answer to join skew for the cases AQE's
  * runtime skew-split doesn't reach (deterministic plans, bucketed
  * exchanges it won't touch, skew present at write time). A hot key that
  * hashes 30% of a 100 TB fact table into one shuffle partition
  * serializes the whole stage on one executor; salting splits every key
  * across `salts` partitions at the cost of replicating the other side
  * `salts`×.
  *
  * Semantics are EXACTLY the plain inner equi-join (the gate's oracle is
  * the unsalted SQL join): each fact row carries one deterministic salt,
  * the other side carries every salt, so each matching pair meets exactly
  * once. The salt is md5-derived from a unique column — engine-portable,
  * stable under re-sharding, and uniform even when the join key isn't.
  *
  * 100 TB sizing: replication multiplies the OTHER side's shuffle bytes
  * by `salts`, so pick the smaller side as `other` and `salts` ≈ the
  * hot-partition blowup factor (8-32 covers most skew). When the other
  * side is itself huge, salt only the hot keys: split the fact on a
  * driver-known hot-key list (one cheap count query), salted-join the
  * hot slice, plain-join the rest, union — same operator, two calls.
  */
object SkewJoin {

  /** Inner-join `fact` (the skewed side) with `other` on
    * `factKey == otherKey`, spreading each fact key over `salts` shuffle
    * partitions. `factUniqueCol` names any unique-ish fact column the
    * per-row salt derives from. Output columns: fact's then other's,
    * minus `otherKey` (it duplicates `factKey`) and the salt. */
  def saltedJoin(
      fact: DataFrame, other: DataFrame,
      factKey: String, otherKey: String,
      salts: Int, factUniqueCol: String): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(factKey != otherKey,
      "key columns must be named differently (drop() would strip both)")
    // first 8 md5 hex chars → BIGINT in [0, 2^32): non-negative, so %
    // is floor-consistent (the shardedShuffle trick)
    val f = fact.withColumn("graft_salt",
      conv(substring(md5(col(factUniqueCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % salts)
    val o = other.withColumn("graft_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    f.join(o, f(factKey) === o(otherKey) && f("graft_salt") === o("graft_salt"))
      .drop("graft_salt").drop(otherKey)
  }

  /** The "salt only the hot keys" form the [[saltedJoin]] Scaladoc
    * promises, as ONE operator: fact keys whose row count reaches
    * `hotThreshold` take the BROADCAST path (their matching `other` rows
    * are by construction few enough to ship — a hot key on the fact side
    * is exactly the key you cannot let a hash exchange serialize), and
    * the cold remainder takes the ordinary shuffle join. Semantics are
    * EXACTLY the plain inner equi-join (each fact row is in precisely
    * one slice; the gate's oracle is the plain SQL join).
    *
    * 100 TB shape: hot-key detection is one partial-aggregated count
    * (≤|distinct keys| rows cross the exchange) reduced to a tiny
    * driver-broadcastable hot-key frame; the hot slice never shuffles —
    * its dimension rows broadcast — and the cold slice's hash exchange
    * is skew-free BECAUSE the heavy keys were carved out. Versus
    * full salting, no `salts`× replication of the other side; versus
    * AQE skew-join, it works in deterministic/bucketed plans AQE won't
    * touch and on the map side before any exchange exists. */
  def hotKeyHybridJoin(
      fact: DataFrame, other: DataFrame,
      factKey: String, otherKey: String,
      hotThreshold: Long): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be positive")
    require(factKey != otherKey,
      "key columns must be named differently (drop() would strip both)")
    val hot = fact.groupBy(col(factKey).as("graft_hk"))
      .agg(count(lit(1)).as("graft_cnt"))
      .filter(col("graft_cnt") >= hotThreshold)
      .select("graft_hk")
    val factHot = fact.join(broadcast(hot), col(factKey) === col("graft_hk"), "left_semi")
    val factCold = fact.join(broadcast(hot), col(factKey) === col("graft_hk"), "left_anti")
    val otherHot = other.join(broadcast(hot), col(otherKey) === col("graft_hk"), "left_semi")
    factHot.join(broadcast(otherHot), factHot(factKey) === otherHot(otherKey))
      .drop(otherKey)
      .unionByName(
        factCold.join(other, factCold(factKey) === other(otherKey)).drop(otherKey))
  }
}
