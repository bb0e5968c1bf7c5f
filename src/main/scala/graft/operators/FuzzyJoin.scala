package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) matching — the entity-resolution join:
  * find record pairs whose names differ by at most `maxDist` edits
  * without ever forming the corpus cross product. The classic blocking
  * construction (Fellegi–Sunter record linkage; Christen, "Data
  * Matching", 2012): a cheap deterministic block key partitions the
  * candidate space, the quadratic compare runs only WITHIN a block, and
  * a necessary-condition length filter prunes before the O(n·m) distance
  * kernel runs at all.
  */
object FuzzyJoin {

  /** All unordered pairs (a < b by id) sharing `blockKey` whose `nameCol`
    * values are within `maxDist` Levenshtein edits. `blockKey` is any
    * deterministic column expression (e.g. the last token of a product
    * name, a phonetic code, a sorted-bigram key); recall is bounded by
    * the block key — pairs in different blocks are never compared, the
    * standard blocking trade.
    *
    * Cost shape at 100 TB: the distance kernel runs on DISTINCT (name,
    * block) pairs, not record pairs — real-world name columns repeat
    * heavily (at sf0.1, 64 distinct names cover 20k parts: ~25M
    * record-pair DP calls collapse to 224 distinct-pair calls, and the
    * record expansion back is two equi-joins producing exactly the
    * output rows). The expansion is therefore OUTPUT-bound, and at
    * `minDist` 0 the dist-0 class dominates it: Σ C(name-freq, 2)
    * identical-name record pairs (~3.1M at sf0.1 — the whole gate cost
    * was this materialization, not the DP). So the per-block quadratic is
    * |distinct names in block|², with block-key selectivity the capacity
    * knob (the LSH-band role; a skewed block can be split further by a
    * second key, e.g. a length band). Before the DP runs, the codegen'd
    * `|len(a) − len(b)| ≤ maxDist` filter discards name pairs that
    * cannot possibly match (length difference lower-bounds edit
    * distance); the kernel itself is Spark's built-in codegen'd
    * THRESHOLDED `levenshtein(a, b, maxDist)` — banded DP, O(maxDist·n)
    * per pair with early −1 exit — while every kept pair's distance is
    * the true Levenshtein value — identical to DuckDB's `levenshtein`,
    * so the gate hashes exactly. The `id_a < id_b` triangle predicate
    * keeps each unordered record pair once. */
  /** `minDist` floors the match band: 0 (default) includes identical
    * strings — every record pair of a repeated name, an OUTPUT-bound
    * cost that explodes with name frequency (Σ C(freq, 2) dist-0 pairs)
    * and that exact hash dedup already finds for free; 1 restricts to
    * the properly-fuzzy band, pruning equal-name pairs BEFORE the
    * record expansion, so the output tracks true near-matches. */
  def editDistancePairs(
      df: DataFrame, idCol: String, nameCol: String, blockKey: org.apache.spark.sql.Column,
      maxDist: Int, minDist: Int = 0): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(minDist >= 0 && minDist <= maxDist, "need 0 <= minDist <= maxDist")
    val side = df.select(col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("blk"))
    val namePairs = distinctNamePairs(side, maxDist, minDist)
    // the record expansion is output-bound (every matching record pair
    // is emitted); spread it across the cluster by hash-repartitioning
    // the probe side — matched name pairs and the build side broadcast
    // under AQE, so the expansion's parallelism must come from the probe
    // partitioning, not the (possibly single) input split of a small
    // dimension file. One O(records) shuffle, noise next to the output.
    side.repartition(col("id"))
      .select(col("id").as("id_a"), col("name").as("name_a"), col("blk"))
      .join(namePairs, Seq("blk", "name_a"))
      .join(side.select(col("id").as("id_b"), col("name").as("name_b"), col("blk")),
        Seq("blk", "name_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"), col("dist"))
  }

  /** Distance once per distinct ORDERED name pair within a block (both
    * orientations kept so id-ordered record joins never swap labels;
    * name_a == name_b covers exact-duplicate records at dist 0).
    * `side` must carry (name, blk). */
  private def distinctNamePairs(side: DataFrame, maxDist: Int, minDist: Int): DataFrame = {
    val names = side.select(col("name"), col("blk")).distinct()
    names.select(col("name").as("name_a"), col("blk"))
      .join(names.select(col("name").as("name_b"), col("blk")), Seq("blk"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0) // thresholded kernel returns -1 when over the bound
      .filter(col("dist") >= minDist)
  }

  /** Golden-record survivorship — the MERGE step of record linkage
    * (Christen 2012 ch. 6): matched names cluster transitively, every
    * record maps to its name's cluster, and each cluster elects ONE
    * canonical record by a total deterministic rule — longest name
    * (completeness-first, the standard survivorship heuristic), ties by
    * lexicographically smallest name, then smallest id. Output: one row
    * per cluster (survivor_id, survivor_name, n_records, n_names),
    * singleton records included (their own cluster).
    *
    * The cluster graph is built over DISTINCT NAMES, not records — the
    * [[editDistancePairs]] lesson taken one step further: real name
    * columns repeat heavily, so components over the ≤|distinct names|
    * node set converge in O(log d) pointer-jumping rounds on a graph
    * orders of magnitude smaller than the record-pair expansion (which
    * survivorship never needs — records attach to their name's label by
    * one equi-join). A name lives in exactly one block (the block key
    * derives from the name), so blocking loses no cluster edges.
    *
    * 100 TB shape: the name-pair DP is |distinct names in block|² per
    * block, components shuffle the name-edge frame (2 joins/round,
    * [[Dedup.connectedComponents]]), and the record pass is one
    * (blk, name)-keyed join plus one cluster-keyed aggregate — the
    * corpus is scanned once and shuffled twice, nothing quadratic in
    * records anywhere. */
  def goldenRecords(
      df: DataFrame, idCol: String, nameCol: String,
      blockKey: org.apache.spark.sql.Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1 for a non-trivial match band")
    val side = df.select(col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("blk"))
    // name-level cluster labels: components over near-match name pairs
    // (minDist 1 — identical names are the same node already)
    val nameEdges = distinctNamePairs(side, maxDist, minDist = 1)
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
    val comp = Dedup.connectedComponents(nameEdges)
      .select(col("id").as("name"), col("component").as("cluster_name"))
    side.join(comp, Seq("name"), "left")
      .withColumn("cluster_name", coalesce(col("cluster_name"), col("name")))
      .groupBy("cluster_name")
      .agg(
        min(struct((-length(col("name"))).as("nl"), col("name").as("nm"),
          col("id").as("id"))).as("best"),
        count(lit(1)).as("n_records"),
        count_distinct(col("name")).as("n_names"))
      .select(col("best.id").as("survivor_id"), col("best.nm").as("survivor_name"),
        col("n_records"), col("n_names"))
  }
}
