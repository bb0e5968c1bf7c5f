package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column — the corpus
  * bucketing step behind semantic dedup sharding, topic-balanced mixture
  * sampling, and cluster-holdout splits (the reference's store has no
  * clustering; this is pipeline-extension surface like
  * [[Similarity.semanticDedup]], which CONSUMES a cluster column this
  * operator can produce).
  *
  * Determinism (what makes this oracle-able, unlike MLlib KMeans):
  *   - seed = the k lowest-id vectors, not a random sample;
  *   - per-dimension squared differences are computed in IEEE double and
  *     immediately cast to decimal, so the per-centroid distance is a SUM
  *     OF DECIMALS — associative, order-independent, bit-identical across
  *     engines and across partitionings;
  *   - round-2 centroids are kept as EXACT decimal sums plus counts, and
  *     the mean is never materialized: distances to the mean s/n are
  *     compared via the n-scaled form Σ(n·x − s)² / n², which costs one
  *     correctly-rounded double division at the very end;
  *   - argmin ties break to the lowest centroid id.
  *
  * Decimal scales are chosen so every sum's unscaled value stays under
  * 2^53: the final decimal→double casts are then single correctly-rounded
  * conversions in both Spark (BigDecimal.doubleValue) and DuckDB
  * (exact integer → one IEEE division), so the oracle can reproduce the
  * doubles bit-for-bit.
  *
  * Cost shape at 100 TB: assignment is a PURE PROJECTION — the k×dim
  * centroid table (a few KB) rides into the closure as literals, exactly
  * like [[Similarity]]'s IVF coarse quantizer, so no shuffle and no join
  * touches the corpus. The centroid update is one posexplode + groupBy
  * (cluster, dim): partial aggregation reduces the map side to
  * partitions×k×dim rows, so the shuffle is tiny regardless of corpus
  * size. Driver state is k×dim decimals per round — constant. Rounds are
  * sequential by nature of Lloyd; each added round costs one more
  * projection + tiny shuffle, not a corpus reshuffle. */
object Clustering {

  private val DistDec = "decimal(30,10)" // r1 terms: compared as decimal, never cast to double
  private val NumDec = "decimal(30,6)"   // r2 terms: summed then cast to double — scale 6
                                         // keeps the unscaled sum < 2^53 (see Scaladoc)

  private def decSum(terms: Column, dec: String): Column =
    aggregate(terms,
      lit(new java.math.BigDecimal(0)).cast(dec),
      (acc, x) => (acc + x).cast(dec))

  /** Shared round-1 machinery: project (id, v), collect the k lowest-id
    * seed vectors (bounded: k x dim doubles — the IVF coarse-quantizer
    * pattern), and assign every vector to its nearest seed with the
    * exact decimal squared distance (ties to the lowest cluster id).
    * Used by BOTH [[kmeansTwoRounds]] and [[prototypeDistances]] so the
    * seeding contract can never silently diverge between them.
    * Returns (id, best(d, cid)). */
  private def seedAssignments(
      df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val vecs = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // id >= 0 too: a negative id would pass a bare `id < k` count check
    // and then blow up as a missing seed key with no diagnostic
    val init: Map[Int, Array[Double]] = vecs
      .filter(col("id") >= 0 && col("id") < k)
      .collect()
      .map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toArray)
      .toMap
    require(init.size == k, s"need vectors with $idCol 0..${k - 1} as seeds")
    def dist1(c: Array[Double]): Column =
      decSum(zip_with(col("v"), lit(c), (a, b) => ((a - b) * (a - b)).cast(DistDec)), DistDec)
    vecs.withColumn("best",
      array_min(array((0 until k).map(c =>
        struct(dist1(init(c)).as("d"), lit(c.toLong).as("cid"))): _*)))
  }

  /** Two Lloyd rounds from the deterministic seed; returns one row per
    * vector: (idCol, c1, c2) with the round-1 and round-2 assignments. */
  def kmeansTwoRounds(
      df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 4): DataFrame = {
    require(k >= 1, "k must be positive")
    val a1 = seedAssignments(df, idCol, vecCol, k)
      .withColumn("c1", col("best").getField("cid"))
      .drop("best")
      // pinned (r16, guide §1.2): consumed TWICE (the centroid-sum
      // collect and the round-2 assignment projection) — the k-way
      // interpreted decimal distance HOF must not run twice. The
      // checkpoint carries (id, v, c1); v must ride through because
      // round 2 re-reads the vectors, so this trades ~input-sized
      // storage for halving the operator's dominant projection.
      .localCheckpoint()

    // Round-2 centroids as exact (Σx as decimal, n) per (cluster, dim).
    // Partial agg makes this shuffle k×dim rows per map partition.
    val sums = a1.select(col("c1"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("c1", "d")
      .agg(sum(col("x").cast(DistDec)).as("s"), count(lit(1)).as("n"))
      .collect()
    val cents2: Seq[(Long, Long, Array[Double])] = sums
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (cid, rows) =>
        val n = rows.head.getLong(3)
        val s = rows.map(r => r.getInt(1) -> r.getDecimal(2).doubleValue()).sortBy(_._1).map(_._2)
        (cid, n, s.toArray)
      }

    def dist2(n: Long, s: Array[Double]): Column = {
      val num = decSum(zip_with(col("v"), lit(s), (x, sd) => {
        val diff = lit(n.toDouble) * x - sd
        (diff * diff).cast(NumDec)
      }), NumDec)
      num.cast("double") / lit((n * n).toDouble)
    }

    a1.withColumn("c2",
        array_min(array(cents2.map { case (cid, n, s) =>
          struct(dist2(n, s).as("d"), lit(cid).as("cid"))
        }: _*)).getField("cid"))
      .select(col("id").as(idCol), col("c1"), col("c2"))
  }

  /** Prototype-distance pruning facts (Sorscher et al. 2022, "Beyond
    * neural scaling laws": rank examples by distance to their cluster
    * prototype — prune EASY/near points on big data, prune far outliers
    * when cleaning) — per vector, its seed-prototype assignment, the
    * exact decimal squared distance, the cluster's lower-median
    * distance, and the `is_far` flag `dist² · kDen > med² · kNum`
    * (cross-multiplied decimals — no division, engine-identical). The
    * same deterministic seeds and decimal-sum distances as
    * [[kmeansTwoRounds]]'s round 1, so assignment ties and the median
    * pick (total order through the id) are oracle-able.
    *
    * 100 TB shape: assignment + distance is a pure projection (the
    * k×dim seed matrix rides as literals); the median is one keyed
    * window over the corpus partitioned BY CLUSTER (parallel across
    * the k clusters — for very small k over very large corpora, swap
    * in the [[Stats.exactQuantilesBisect]] cut points); the |k|-row
    * median frame broadcasts back. */
  def prototypeDistances(
      df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      k: Int = 4, kNum: Long = 3L, kDen: Long = 2L): DataFrame = {
    require(k >= 1, "k must be positive")
    require(kNum >= 0 && kDen >= 1, s"need factor kNum/kDen >= 0: $kNum/$kDen")
    val withD = seedAssignments(df, idCol, vecCol, k)
      .select(col("id"), col("best").getField("cid").as("c1"),
        col("best").getField("d").as("dist2"))
      // pinned (r16, guide §1.2): consumed TWICE (the median window and
      // the final join) and the k-way decimal distance projection is an
      // interpreted HOF — without the pin the most expensive projection
      // of the operator executes twice. The checkpoint holds 3 narrow
      // columns per vector (id, cid, dist2) — far smaller than the
      // embedding input it replaces on the second read.
      .localCheckpoint()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c1").orderBy(col("dist2"), col("id"))
    val med = withD
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("c1")))
      .filter(col("rn") === expr("(n + 1L) div 2L"))
      .select(col("c1"), col("dist2").as("med2"))
    withD.join(broadcast(med), Seq("c1")) // |k| rows
      .select(col("id").as(idCol), col("c1"), col("dist2"), col("med2"),
        (col("dist2") * kDen > col("med2") * kNum).as("is_far"))
  }
}
