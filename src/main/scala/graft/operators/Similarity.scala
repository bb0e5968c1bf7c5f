package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design: the baseline is brute-force top-k with the query set
  * broadcast — one pass over the corpus, no corpus shuffle, per-query
  * top-k via window rank on (query, score). That is already the right
  * plan for "N queries × 100 TB corpus" when N is small. The scale path
  * for large N is sign-LSH bucketing ([[signBits]] / [[lshTopK]]): both
  * sides hash to buckets, the join touches only same-bucket pairs.
  * Dot products are `zip_with`+`aggregate` column expressions —
  * codegen'd, strict left-to-right summation (deterministic results).
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double in
    * element order (deterministic). Native Catalyst expression
    * ([[graft.functions.DotProductF]]) — same left-to-right math as the
    * `zip_with`+`aggregate` HOF form (bit-identical results) but one
    * JIT'd loop per pair instead of per-element interpreted lambdas. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Brute-force cosine top-k: for each query row, the k nearest corpus
    * rows. Queries are broadcast; the corpus streams through once.
    * Output: (query_id, neighbor_id, score, rank). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      metric: (Column, Column) => Column = cosine): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", metric(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Sign-LSH bucket code: the first `bits` dimensions' signs packed into
    * a long — a deterministic hyperplane sketch (axis-aligned planes).
    * Fewer bits ⇒ bigger buckets ⇒ higher recall, more compute. */
  def signBits(vec: Column, bits: Int = 8): Column =
    aggregate(
      zip_with(slice(vec, 1, bits), sequence(lit(0), lit(bits - 1)),
        (x, i) => when(x > 0, call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))

  /** LSH-bucketed ANN top-k: candidates limited to the query's bucket.
    * Trades recall for a join that only touches same-bucket pairs —
    * the 100 TB path when the query set itself is large. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 8): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      signBits(col(vecCol), bits).as("bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      signBits(col(vecCol), bits).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  // ------------------------------------------------------------------
  // IVF (inverted-file) ANN — the learned-partition scale path
  // ------------------------------------------------------------------

  /** A trained coarse quantizer: k centroids in the embedding space. */
  final case class IvfModel(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length
  }

  /** Nearest-centroid ids for one vector (by cosine), top `n`. */
  private[graft] def nearestCentroids(model: IvfModel, vec: Seq[Float], n: Int): Seq[Int] = {
    def cos(c: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < c.length && i < vec.length) {
        dot += c(i).toDouble * vec(i); na += c(i).toDouble * c(i); nb += vec(i).toDouble * vec(i)
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    model.centroids.indices.sortBy(i => -cos(model.centroids(i))).take(n)
  }

  /** Train an IVF coarse quantizer with Lloyd iterations, Spark-side:
    * deterministic seeding (k lowest-id vectors), assignment in a typed
    * map over broadcast centroids, centroid update as an element-wise
    * mean via posexplode + groupBy — all distributed; only the k×dim
    * centroid matrix ever reaches the driver. */
  def trainIvf(
      corpus: DataFrame, k: Int, iterations: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var centroids = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
    (1 to iterations).foreach { _ =>
      val bc = spark.sparkContext.broadcast(IvfModel(centroids))
      val assigned = corpus
        .select(col(idCol).as("id"), col(vecCol).as("vec"))
        .as[(Long, Array[Float])]
        .map { case (_, vec) => (nearestCentroids(bc.value, vec.toSeq, 1).head, vec) }
        .toDF("cluster", "vec")
      val means = assigned
        .select(col("cluster"), posexplode(col("vec")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(avg(col("v")).as("m"))
        .groupBy("cluster")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ms"))
        .collect()
      means.foreach { r =>
        val cluster = r.getInt(0)
        val ms = r.getSeq[Row](1).map(_.getDouble(1).toFloat).toArray
        if (ms.nonEmpty) centroids(cluster) = ms
      }
      bc.destroy()
    }
    IvfModel(centroids)
  }

  /** Assign every row to its nearest centroid cell:
    * (cluster, neighbor_id, c_vec) — the index side of [[ivfTopK]],
    * exposed so an INCREMENTAL index ([[graft.streaming.OnlineAnn]]) can
    * persist assignments batch by batch instead of re-assigning the
    * corpus per probe. */
  def assignCells(
      corpus: DataFrame, model: IvfModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .as[(Long, Array[Float])]
      .map { case (id, vec) => (nearestCentroids(bc.value, vec.toSeq, 1).head, id, vec) }
      .toDF("cluster", "neighbor_id", "c_vec")
  }

  /** Score queries against an already-assigned cell table
    * ([[assignCells]] output): each query probes its `nprobe` nearest
    * cells; only those cells' vectors are scored. */
  def probeCells(
      cells: DataFrame, queries: DataFrame, model: IvfModel, k: Int,
      nprobe: Int = 2, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val probed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, vec) =>
        nearestCentroids(bc.value, vec.toSeq, nprobe).map(c => (c, id, vec))
      }
      .toDF("cluster", "query_id", "q_vec")
    val scored = cells.join(broadcast(probed), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** IVF ANN top-k: corpus rows are assigned to their nearest centroid
    * once; each query probes its `nprobe` nearest centroids and scores
    * only those partitions' vectors — the learned-partition counterpart
    * of [[lshTopK]] (better recall per candidate at the cost of
    * training). Output: (query_id, neighbor_id, score, rank). */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, model: IvfModel, k: Int,
      nprobe: Int = 2, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    probeCells(assignCells(corpus, model, idCol, vecCol), queries, model, k,
      nprobe, idCol, vecCol)

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * LSH-bucketed so only same-bucket pairs are compared. */
  def cosineNearDupPairs(
      df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 8): DataFrame = {
    val v = df.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      signBits(col(vecCol), bits).as("bucket"))
    val l = v.as("l"); val r = v.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("score", cosine(col("l.vec"), col("r.vec")))
      .filter(col("score") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("score"))
  }

  /** Per-label mean embedding — the "class prototype" fit step of the
    * nearest-class-mean classifier. Dimensions explode once and
    * partial-aggregate map-side; per-dimension sums run in
    * `decimal(30,6)` (exact, order-independent — a double sum would make
    * the means nondeterministic under Spark's partition order and
    * un-oracle-able), divided once at the end. Output: (label,
    * mean_vec: array<double>). Only k×dim values ever leave the
    * aggregate, whatever the corpus size. */
  def classMeans(
      df: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    df.select(col(labelCol).cast("int").as("label"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg((sum(col("v").cast("double").cast("decimal(30,6)")).cast("double")
        / count(lit(1))).as("m"))
      .groupBy("label")
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), transform(col("pm"), _.getField("m")).as("mean_vec"))

  /** Nearest-class-mean classification — the fastText-style model-based
    * scorer (quality/domain/topic filtering) served Spark-side: every
    * vector gets the label of the prototype with the highest dot score
    * (ties break to the lowest label). The k×dim prototype table packs
    * into ONE broadcast row, so classification is a pure map — ZERO
    * shuffle over the corpus; the per-row argmax is a codegen'd
    * `array_max` over a struct whose ordering (score DESC, label ASC via
    * negation) encodes the tie rule. Output: (id, pred_label, score). */
  def nearestClassMean(
      df: DataFrame, means: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val packed = means.agg(
      sort_array(collect_list(struct(col("label"), col("mean_vec")))).as("classes"))
    // float corpus vector × double prototype: widen once and take the
    // zip_with+aggregate dot (same left-to-right math as dot_f)
    def dotD(a: Column, b: Column): Column =
      aggregate(zip_with(a.cast("array<double>"), b, (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(packed))
      .withColumn("best", array_max(transform(col("classes"), c =>
        struct(
          dotD(col(vecCol), c.getField("mean_vec")).as("score"),
          (-c.getField("label")).as("neg_label")))))
      .select(
        col(idCol),
        (-col("best.neg_label")).as("pred_label"),
        col("best.score").as("score"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): assign every vector to its nearest centroid,
    * then WITHIN each cluster greedily drop any vector whose cosine to a
    * lower-id cluster-mate is at or above `threshold` — the first
    * occurrence survives, exactly like the text dedup family.
    *
    * This is the scale answer to [[cosineNearDupPairs]]' random sign
    * buckets when a trained partition exists: the corpus shuffles ONCE
    * on the cluster id (the model rides a broadcast, k×dim floats), and
    * the quadratic compare is confined to one cluster's rows — the
    * cluster count grows with the corpus, holding per-cluster cost
    * bounded, which is the published algorithm's own cost model. No
    * all-pairs, no cross-cluster traffic; skew in one hot cluster is an
    * AQE-splittable self-join, not a driver problem.
    *
    * Output: (id, cluster_rep, kept) where `cluster_rep` is the lowest
    * id in the vector's cluster — an engine-portable cluster label
    * (centroid ARRAY indices are not). */
  def semanticDedup(
      df: DataFrame, model: IvfModel, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    // three consumers (both self-join sides + the verdict join): pin the
    // assignment pass once — AQE's broadcast conversions defeat
    // ReuseExchange, which would otherwise re-run the centroid map per
    // consumer (the same reason the LSH shingle frames checkpoint)
    val assigned = df
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, vec) => (nearestCentroids(bc.value, vec.toSeq, 1).head, id, vec) }
      .toDF("cluster", "id", "vec")
      .localCheckpoint()
    val l = assigned.select(col("cluster"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = assigned.select(col("cluster"), col("id").as("id_b"), col("vec").as("vec_b"))
    val dropped = l
      .join(r, Seq("cluster"))
      .filter(col("id_a") < col("id_b") && cosine(col("vec_a"), col("vec_b")) >= threshold)
      .select(col("id_b").as("id")).distinct()
      .withColumn("hit", lit(1))
    assigned
      .withColumn("cluster_rep", min("id").over(Window.partitionBy("cluster")))
      .join(dropped, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        col("cluster_rep"),
        col("hit").isNull.as("kept"))
  }

  /** Symmetric int8 quantization of an embedding column — the 4×
    * storage/bandwidth reduction a 100 TB vector corpus takes before
    * ANN serving: per vector, `scale = max|x_i|` and
    * `q_i = round(127 · x_i / scale)` (zero vectors quantize to zeros).
    * Returns (id, scale, q) with `q` as `array<tinyint>`-ranged longs in
    * an int array — a stateless codegen'd projection, no shuffle.
    *
    * Determinism note (why this is oracle-able): every arithmetic step
    * is IEEE-754 double with a fixed evaluation order (`(x·127)/scale`),
    * `max` is order-independent, and round-half-up on doubles agrees
    * with DuckDB's round-half-away for non-negative ties (and both round
    * away from zero on negative ties). */
  def quantizeInt8(
      df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    quantized(df, idCol, vecCol).select("vec_id", "scale", "q")

  /** (vec_id, vec, scale, q) — the shared quantization projection. */
  private def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    val q = when(col("scale") === 0d, transform(col("vec"), _ => lit(0L)))
      .otherwise(transform(col("vec"),
        x => round(x.cast("double") * 127d / col("scale")).cast("long")))
    df.select(col(idCol).as("vec_id"), col(vecCol).as("vec"), scale.as("scale"))
      .withColumn("q", q)
  }

  /** Brute-force cosine top-k over the INT8 codes — the quantized
    * serving path: cosine is scale-invariant, so the per-vector scale
    * cancels and ranking quality depends only on the rounding error
    * (recall measured ≥ 0.9 @ 10 on real embeddings in OperatorsSpec;
    * typically 1.0). The corpus side reads a quarter of the bytes of the
    * float index — the point of quantizing at 100 TB, where ANN probe
    * cost is bandwidth-bound. */
  def quantizedCosineTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def codes(df: DataFrame) = quantizeInt8(df, idCol, vecCol)
      .select(col("vec_id").as(idCol),
        transform(col("q"), _.cast("float")).as(vecCol))
    bruteForceTopK(codes(corpus), codes(queries), k, idCol, vecCol)
  }

  /** Embedding-space mean-shift drift between two snapshots — the
    * embedding member of the drift triad ([[graft.operators.Stats
    * .ksDrift]] scans ordered values, [[graft.operators.Stats
    * .chiSquareDrift]] category mixes, THIS the representation space):
    * did a new corpus snapshot's embedding centroid move? Per
    * dimension, the exact micro-quantized coordinate sums of both
    * sides and the cross-multiplied squared mean gap
    * `num_d = (s_a,d·n_b − s_b,d·n_a)²` over the shared denominator
    * `(n_a·n_b)²` — so ‖μ_a − μ_b‖² = Σ_d num_d / den exactly, no
    * float accumulation anywhere (coordinates are rounded to integer
    * micros FIRST, the `quantizeInt8Stats` device, so sums are
    * order-independent and engine-identical). Exact while each side
    * stays under ~10⁹ vectors (s·n reaches n²·coord); past that feed
    * a deterministic sample — standard for a drift check.
    *
    * Shape: one posexplode + map-side-combined groupBy(dim) per side
    * (|dim| rows out), a |dim|-frame join, no data-sized join. */
  def embeddingMeanShift(
      a: DataFrame, b: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val d = "decimal(38,0)"
    def dims(df: DataFrame) = df
      .select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(col("d"),
        round(col("x").cast("double") * 1000000d).cast("long").as("xm"))
      .groupBy("d")
      .agg(sum("xm").cast(d).as("s"), count(lit(1)).cast(d).as("n"))
    val da = dims(a).select(col("d"), col("s").as("s_a"), col("n").as("n_a"))
    val db = dims(b).select(col("d"), col("s").as("s_b"), col("n").as("n_b"))
    da.join(db, Seq("d"), "full_outer")
      .select(col("d").cast("long").as("d"),
        coalesce(col("s_a"), lit(0).cast(d)).as("s_a"),
        coalesce(col("s_b"), lit(0).cast(d)).as("s_b"),
        coalesce(col("n_a"), lit(0).cast(d)).as("n_a"),
        coalesce(col("n_b"), lit(0).cast(d)).as("n_b"))
      .select(col("d"),
        col("s_a").cast("string").as("s_a"),
        col("s_b").cast("string").as("s_b"),
        col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        ((col("s_a") * col("n_b") - col("s_b") * col("n_a")) *
          (col("s_a") * col("n_b") - col("s_b") * col("n_a")))
          .cast(d).cast("string").as("shift2_num"),
        (col("n_a") * col("n_b") * col("n_a") * col("n_b"))
          .cast(d).cast("string").as("shift2_den"))
  }

  /** Quantization quality summary per vector, in engine-exact integer
    * space: the int8 code sums plus the reconstruction error
    * `Σ round(|q_i·scale/127 − x_i| · 1e6)` (micro-units) — the
    * dequantization residual, order-independent because each term is
    * rounded to an integer BEFORE summing. One projection, no shuffle. */
  def quantizeInt8Stats(
      df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sumLong = (a: Column) => aggregate(a, lit(0L), (acc, e) => acc + e)
    val err = zip_with(col("q"), col("vec"), (qi, xi) =>
      round(abs(qi.cast("double") * col("scale") / 127d - xi.cast("double")) * 1000000d)
        .cast("long"))
    quantized(df, idCol, vecCol).select(
      col("vec_id"), col("scale"),
      sumLong(col("q")).as("q_sum"),
      sumLong(transform(col("q"), e => abs(e))).as("q_abs_sum"),
      sumLong(err).as("err_micro_sum"))
  }

  // ------------------------------------------------------------------
  // Product quantization (Jégou, Douze, Schmid, TPAMI 2011) — the
  // standard billion-scale ANN compression: m sub-quantizers of k
  // centroids turn a dim-float vector into m small codes (here m bytes),
  // and queries score candidates via an m-lookup table sum (asymmetric
  // distance, ADC) instead of dim multiplies.
  // ------------------------------------------------------------------

  /** A PQ codebook: `m` subspaces of `subDim` dims, `k` centroids each;
    * `codebook` is flattened as `[(j·k + t)·subDim + i]`. */
  final case class PqModel(m: Int, k: Int, subDim: Int, codebook: Array[Double]) {
    require(codebook.length == m * k * subDim, "codebook shape mismatch")
  }

  /** Seeded (untrained) PQ codebook: centroid (j, t) is subspace j of
    * the t-th lowest-id vector — deterministic and SQL-replicable, the
    * `ivf_topk` iterations=0 idiom, so the whole encode/ADC path can be
    * oracle-checked. (Lloyd refinement per subspace — the `trainIvf`
    * loop applied m times — yields real codebooks but has no closed-form
    * SQL twin; the gate pins the machinery, not the training.) Only
    * k·dim doubles ever reach the driver. */
  def pqCodebook(
      corpus: DataFrame, m: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): PqModel = {
    val seeds = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(seeds.length == k, s"corpus has fewer than k=$k vectors")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val cb = new Array[Double](m * k * subDim)
    for (j <- 0 until m; t <- 0 until k; i <- 0 until subDim)
      cb((j * k + t) * subDim + i) = seeds(t)(j * subDim + i)
    PqModel(m, k, subDim, cb)
  }

  /** PQ codes for a materialized double-array column `xd`: for each
    * subspace, the centroid minimizing squared L2 distance (ties → the
    * lowest centroid id, via the (dist, t) struct-min idiom). Distances
    * accumulate left-to-right in double — deterministic, and exactly
    * DuckDB's `list_sum(list_transform(...))` order. Everything is
    * native HOF expressions over a broadcast-literal codebook: a
    * codegen'd projection, zero shuffle at any corpus size. */
  private def pqCodesExpr(xd: Column, model: PqModel): Column = {
    val cb = lit(model.codebook)
    transform(sequence(lit(0), lit(model.m - 1)), j =>
      array_min(transform(sequence(lit(0), lit(model.k - 1)), t =>
        struct(
          aggregate(sequence(lit(0), lit(model.subDim - 1)), lit(0d), (acc, i) => {
            val d = element_at(xd, j * lit(model.subDim) + i + 1) -
              element_at(cb, (j * lit(model.k) + t) * lit(model.subDim) + i + 1)
            acc + d * d
          }).as("dist"),
          t.as("t")))).getField("t"))
  }

  /** Encode the corpus to PQ codes: (vec_id, codes array<int>) — the
    * 4·dim-byte float vector becomes m small ints (dim/m·32× smaller
    * with byte packing), which is what a 100 TB ANN index actually
    * stores. Pure projection. */
  def pqEncode(
      df: DataFrame, model: PqModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast("double")).as("_xd"))
      .withColumn("codes", pqCodesExpr(col("_xd"), model))
      .select("vec_id", "codes")

  /** ADC top-k: each query precomputes its m×k lookup table (squared L2
    * to every centroid, flattened [j·k + t]); a candidate's approximate
    * distance is then m array lookups summed in subspace order — no
    * per-pair vector math at all. The tiny (queries × m·k) LUT frame
    * BROADCASTS; the corpus side reads only the codes column. Top-k by
    * (score asc, neighbor_id) per query — same window shape as
    * [[bruteForceTopK]]. Recall vs exact is the PQ trade (measured in
    * OperatorsSpec); raise k (re-rank the top candidates with true
    * distances) when it matters. */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame, model: PqModel, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = lit(model.codebook)
    val luts = queries
      .select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast("double")).as("_qd"))
      .withColumn("lut", flatten(
        transform(sequence(lit(0), lit(model.m - 1)), j =>
          transform(sequence(lit(0), lit(model.k - 1)), t =>
            aggregate(sequence(lit(0), lit(model.subDim - 1)), lit(0d), (acc, i) => {
              val d = element_at(col("_qd"), j * lit(model.subDim) + i + 1) -
                element_at(cb, (j * lit(model.k) + t) * lit(model.subDim) + i + 1)
              acc + d * d
            })))))
      .select("query_id", "lut")
    val codes = pqEncode(corpus, model, idCol, vecCol)
      .select(col("vec_id").as("neighbor_id"), col("codes"))
    val scored = codes.crossJoin(broadcast(luts))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        aggregate(sequence(lit(0), lit(model.m - 1)), lit(0d), (acc, j) =>
          acc + element_at(col("lut"),
            j * lit(model.k) + element_at(col("codes"), j + 1) + 1)))
    val w = Window.partitionBy("query_id").orderBy(col("score").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Two-stage retrieval — the standard PQ serving pattern: the
    * compressed index shortlists `shortlist` candidates per query by
    * ADC ([[pqTopK]]), then EXACT squared-L2 re-ranks just those to the
    * final k. Recall is the shortlist's, precision of the final order
    * is exact — the knob that buys back PQ's quantization error for a
    * |q|·shortlist-sized cost instead of a corpus-sized one.
    *
    * Shape: the shortlist frame is tiny and BROADCASTS into the corpus
    * to fetch the surviving full vectors (the corpus streams, only
    * |q|·shortlist vectors come out); queries broadcast for the exact
    * distance; the final window ranks |q|·shortlist rows. Exact
    * left-to-right double math end to end, so the gate hash-matches. */
  def pqRerankTopK(
      corpus: DataFrame, queries: DataFrame, model: PqModel, k: Int, shortlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val cands = pqTopK(corpus, queries, model, shortlist, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val exact = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("_nv"))
      .join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))),
        Seq("query_id"))
      .withColumn("score", l2DistanceSq(col("_qv"), col("_nv")))
    val w = Window.partitionBy("query_id").orderBy(col("score").asc, col("neighbor_id").asc)
    exact
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }
}
