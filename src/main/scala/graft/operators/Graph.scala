package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation as repeated join+aggregate — the Pregel
  * pattern expressed in DataFrames (same altitude as GraphX's
  * `staticPageRank`, Malewicz et al. SIGMOD'10), complementing the
  * pointer-jumping connected components in [[Dedup.connectedComponents]].
  * Training-data use: importance-weighting documents/sources by the
  * centrality of their citation/link graph before mixture planning
  * (web-corpus curation keeps high-centrality hosts; cf. the quality
  * signals surveyed in RefinedWeb, Penedo et al. 2023).
  */
object Graph {

  /** Fixed-point scale for rank mass: 10^6 ≙ rank 1.0. */
  val Scale = 1000000L

  /** PageRank with a FIXED iteration count in exact fixed-point integer
    * arithmetic (damping 0.85 as the rational 85/100, GraphX-style
    * un-normalized formulation, init 1.0 per node):
    * {{{
    *   contrib(e)    = rank_fp(src) div outdeg(src)        per edge
    *   rank_fp'(v)   = (15·Scale + 85·Σ contrib) div 100
    * }}}
    * Every operation is integer, so results are bit-identical across
    * engines — the DuckDB oracle unrolls the same recurrence. Dangling
    * nodes keep receiving the reset mass but re-emit nothing (their
    * outgoing mass vanishes), matching GraphX's convention.
    *
    * 100 TB shape: per iteration ONE shuffle join of edges against the
    * current ranks on `src` and ONE aggregation onto `dst` — both
    * hash-partitioned on graph keys, nothing ever broadcast or
    * collected. Out-degrees are attached to the edge list ONCE up
    * front and the frame is pinned (`localCheckpoint`) because every
    * iteration re-reads it; ranks are pinned per iteration, which also
    * cuts the logical-plan lineage that would otherwise double per
    * round (the same discipline as [[Dedup.connectedComponents]]).
    * Iteration count is a parameter, not convergence-detected: rank
    * deltas are floats in spirit and a fixed horizon keeps the gate
    * deterministic; callers wanting convergence can compare successive
    * frames themselves.
    */
  def pageRank(
      edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = e0.join(deg, Seq("src")).localCheckpoint() // re-read every iteration
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint() // re-read every iteration
    var ranks = nodes.withColumn("rank_fp", lit(Scale))
    for (_ <- 1 to iters) {
      val inbound = e.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("rank_fp div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("inmass"))
      ranks = nodes
        .join(inbound, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"(15 * $Scale + 85 * coalesce(inmass, 0L)) div 100").as("rank_fp"))
        .localCheckpoint()
    }
    ranks
  }
}
