package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the LLM-pipeline operators (the paths the DuckDB
  * oracle can't express: engine-hash MinHash/SimHash/LSH, multimodal). */
class OperatorsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup keeps min-id per duplicate group") {
    val dup = docs.select("doc_id", "text").unionAll(
      docs.select((col("doc_id") + 1000).as("doc_id"), col("text")))
    val out = Dedup.exactDedup(dup, "text", "doc_id")
    assert(out.count() === docs.count())
    assert(out.agg(max("doc_id")).head().getLong(0) < 1000)
  }

  test("minhash signatures: identical texts identical, length k") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
                 (2L, "the quick brown fox jumps over the lazy dog"),
                 (3L, "completely different content with other words entirely"))
      .toDF("doc_id", "text")
      .withColumn("sig", Dedup.minHashSignature(col("text"), k = 16))
    val rows = df.select("doc_id", "sig").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L) !== rows(3L))
    assert(rows(1L).length === 16)
  }

  test("minhash-LSH near-dup pipeline finds planted near-duplicates") {
    val base = docs.select("doc_id", "text").limit(50)
    val planted = base.select((col("doc_id") + 10000).as("doc_id"),
      col("text").substr(lit(9), lit(1000000)).as("text"))
    val pairs = Dedup.nearDupPairs(base.unionAll(planted), "text", "doc_id",
      threshold = 0.5, k = 32, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // most planted pairs (x, x+10000) must be recovered
    val recovered = (0L until 50L).count(i => pairs.contains((i, i + 10000)))
    assert(recovered >= 40, s"recovered only $recovered/50 planted near-dups")
    // and no wildly-false positives between unrelated docs dominate
    assert(pairs.size <= 200)
  }

  test("minhash-LSH measured recall vs exact Jaccard is >= 0.9 on the dup corpus") {
    // the constructed gate corpus: exact copies (j=1.0) + prefix-truncated
    // near-dups (j ~ 0.9) — the pipeline's designed operating range
    val d = docs.select("doc_id", "text")
    val dd = d
      .unionAll(d.filter(col("doc_id") < 100).select((col("doc_id") + 10000).as("doc_id"), col("text")))
      .unionAll(d.filter(col("doc_id") < 40).select((col("doc_id") + 20000).as("doc_id"),
        col("text").substr(lit(11), lit(100000)).as("text")))
    val found = Dedup.nearDupPairs(dd, "text", "doc_id", threshold = 0.5, maxBucketSize = 10000)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = dd.select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 5).as("sh"))
    val exact = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), col("id_a") < col("id_b"))
      .withColumn("j", Dedup.jaccardFromHashSets(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (exact.isEmpty) 1.0 else (exact & found).size.toDouble / exact.size
    info(f"minhash-LSH recall@j>=0.5 = $recall%.3f (${(exact & found).size}/${exact.size})")
    assert(recall >= 0.9, f"recall $recall%.3f below the 0.9 gate")
    // found pairs are exact-verified, so they are a subset of the exact set
    assert((found -- exact).isEmpty, "verified output must not contain false positives")
  }

  test("prefix-filter pairs equal the brute-force all-pairs join exactly") {
    val d = docs.select("doc_id", "text")
    val dd = d
      .unionAll(d.filter(col("doc_id") < 60).select((col("doc_id") + 10000).as("doc_id"), col("text")))
      .unionAll(d.filter(col("doc_id") < 25).select((col("doc_id") + 20000).as("doc_id"),
        col("text").substr(lit(11), lit(100000)).as("text")))
    val fast = Dedup.prefixFilterPairs(dd, "text", "doc_id", tNum = 7, tDen = 10, shingleSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sh = dd.select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
    val brute = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), col("id_a") < col("id_b"))
      .withColumn("j", Dedup.jaccardFromHashSets(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.7)
      .select("id_a", "id_b", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast === brute) // the filter is lossless: same pairs, same values
    assert(fast.nonEmpty, "the planted copies must be found")
  }

  test("prefix-filter pairs: lossless on adversarial tiny sets and thresholds") {
    // short strings → tiny shingle sets, where ceil-rounding of the
    // prefix length is most fragile; threshold 1/2 and 9/10 both ways
    val rows = Seq(
      (1L, "abcabc"), (2L, "abcabd"), (3L, "abcabc"), (4L, "zzzzzz"),
      (5L, "abcab"), (6L, "qabcabcq"), (7L, "zzzzz"), (8L, "ab"), (9L, "ab")
    ).toDF("doc_id", "text")
    for ((tn, td) <- Seq((1, 2), (7, 10), (9, 10))) {
      val fast = Dedup.prefixFilterPairs(rows, "text", "doc_id", tn, td, shingleSize = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sh = rows.select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 2).as("sh"))
      val brute = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), col("id_a") < col("id_b"))
        .withColumn("j", Dedup.jaccardFromHashSets(col("sh_a"), col("sh_b")))
        .filter(col("j") >= lit(tn.toDouble / td))
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast === brute, s"threshold $tn/$td")
    }
  }

  test("incremental dedup: batch vs index matches the full-recompute pipeline") {
    val d = docs.select("doc_id", "text")
    val batch = d.filter(col("doc_id") < 20)
      .select((col("doc_id") + 50000).as("doc_id"), col("text"))
      .unionAll(d.filter(col("doc_id") >= 20 && col("doc_id") < 30)
        .select((col("doc_id") + 60000).as("doc_id"), reverse(col("text")).as("text")))
    val (buckets, shingles) = Dedup.nearDupIndex(d, "text", "doc_id")
    val inc = Dedup.incrementalNearDupPairs(batch, buckets, shingles,
        "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    // ground truth: the batch pipeline over corpus ∪ batch, restricted to
    // pairs whose larger id is new — identical values, since both verify
    // with jaccardFromHashSets over the same shingle arrays
    val full = Dedup.nearDupPairs(d.unionAll(batch), "text", "doc_id", threshold = 0.5)
      .filter(col("id_b") >= 50000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc === full)
    assert(inc.nonEmpty, "the planted copies must be found")
  }

  test("incremental survivors: novel and first-copy batch docs survive, dups drop") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy sleeping dog"),
      (2L, "completely different prose regarding distributed query engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy sleeping dog"), // dup of 1
      (11L, "a genuinely novel document about columnar storage layouts"),
      (12L, "a genuinely novel document about columnar storage layouts"), // dup of 11
      (13L, "another unique piece mentioning watermark based eviction")
    ).toDF("doc_id", "text")
    val (buckets, shingles) = Dedup.nearDupIndex(corpus, "text", "doc_id")
    val survivors = Dedup.incrementalSurvivors(batch, buckets, shingles,
        "text", "doc_id", threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(survivors === Set(11L, 13L),
      "10 duplicates the corpus; 12 duplicates smaller batch id 11")
  }

  test("simhash blocking finds every exact duplicate (recall 1.0 at dist 0)") {
    val d = docs.select("doc_id", "text")
    val dd = d.unionAll(
      d.filter(col("doc_id") < 100).select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val found = Dedup.simHashNearDups(dd, "text", "doc_id", maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nCopies = d.filter(col("doc_id") < 100).count()
    val exactPairs = (0L until 100L).map(i => (i, i + 10000)).filter(p => p._1 < nCopies).toSet
    val recall = exactPairs.count(found.contains).toDouble / exactPairs.size
    info(f"simhash exact-dup recall = $recall%.3f (${exactPairs.count(found.contains)}/${exactPairs.size})")
    assert(recall === 1.0, "identical texts must always collide at Hamming distance 0")
  }

  test("simhash near-dup recall at dist 1-3 is >= 0.9 vs exact Hamming pairs") {
    // Constructed near-dups: append one rare token to each source doc —
    // the token-set simhash flips only the bits where the new token's
    // hash outvotes the rest, landing most pairs at Hamming distance 1-3.
    // Ground truth = ALL pairs with exact Hamming distance in [1, 3]
    // (brute force over the collected codes). The 4×16-bit band blocking
    // guarantees recall 1.0 at dist <= 3 by pigeonhole (a pair differing
    // in <= 3 bits leaves at least one band untouched).
    val d = docs.select("doc_id", "text").filter(col("doc_id") < 300)
    val dd = d.unionAll(
      d.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" zzqx")).as("text")))
    val found = Dedup.simHashNearDups(dd, "text", "doc_id", maxDist = 3)
      .filter(col("dist") >= 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val codes = dd.select(col("doc_id"), Dedup.simHash(col("text")).as("code"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val exact = (for {
      (ia, ca) <- codes.iterator
      (ib, cb) <- codes.iterator
      if ia < ib
      dist = java.lang.Long.bitCount(ca ^ cb)
      if dist >= 1 && dist <= 3
    } yield (ia, ib)).toSet
    assert(exact.nonEmpty, "constructed corpus must contain dist 1-3 pairs")
    val recall = (exact & found).size.toDouble / exact.size
    info(f"simhash dist 1-3 recall = $recall%.3f (${(exact & found).size}/${exact.size})")
    assert(recall === 1.0, f"recall $recall%.3f — band blocking guarantees 1.0 at dist <= 3")
    // found dist>=1 pairs are Hamming-verified, so no false positives
    assert((found -- exact).isEmpty)
  }

  test("simhash: identical texts collide, near texts are close, distance works") {
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta"),
                 (2L, "alpha beta gamma delta epsilon zeta"),
                 (3L, "alpha beta gamma delta epsilon eta"),
                 (4L, "one two three four five six seven"))
      .toDF("id", "text").withColumn("code", Dedup.simHash(col("text")))
    val codes = df.select("id", "code").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(codes(1L) === codes(2L))
    assert(ham(codes(1L), codes(3L)) < ham(codes(1L), codes(4L)))
  }

  test("brute-force cosine top-k: planted duplicate vector ranks first") {
    val emb = embeddings.select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 9999).as("vec_id"), col("embedding"))
    val corpus = emb.unionAll(planted)
    val top = Similarity.bruteForceTopK(corpus, emb.filter(col("vec_id") === 0), k = 3)
      .filter(col("rank") === 1).head()
    assert(top.getLong(1) === 9999L) // the exact copy is rank 1
    assert(math.abs(top.getDouble(2) - 1.0) < 1e-9)
  }

  test("lsh top-k returns subset consistent with brute force buckets") {
    val emb = embeddings.select("vec_id", "embedding")
    val res = Similarity.lshTopK(emb, emb.limit(20), k = 5, bits = 4)
    assert(res.count() > 0)
    // every (query, neighbor) pair must share the sign-LSH bucket
    val withBuckets = res.join(
        emb.select(col("vec_id").as("query_id"), Similarity.signBits(col("embedding"), 4).as("qb")), "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"), Similarity.signBits(col("embedding"), 4).as("nb")), "neighbor_id")
    assert(withBuckets.filter(col("qb") =!= col("nb")).count() === 0)
  }

  test("pq codes: hand-checked argmin on a tiny fixture, ties to the lowest centroid") {
    // dim 4, m 2 (subDim 2), k 2. Seeds (ids 0, 1) define the codebook:
    //   subspace 0 centroids: (0,0) and (10,10); subspace 1: (0,0), (10,10)
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(10f, 10f, 10f, 10f)),
      (2L, Seq(1f, 1f, 9f, 9f)),   // sub0 -> centroid 0, sub1 -> centroid 1
      (3L, Seq(5f, 5f, 5f, 5f))    // equidistant: ties break to centroid 0
    ).toDF("vec_id", "embedding")
    val model = Similarity.pqCodebook(vecs, m = 2, k = 2)
    val codes = Similarity.pqEncode(vecs, model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) === Seq(0, 0)) // a seed encodes to itself
    assert(codes(1L) === Seq(1, 1))
    assert(codes(2L) === Seq(0, 1))
    assert(codes(3L) === Seq(0, 0)) // tie -> lowest t
  }

  test("pq adc top-k: score is the query's LUT sum over the candidate's codes") {
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(10f, 10f, 10f, 10f)),
      (2L, Seq(1f, 1f, 9f, 9f))
    ).toDF("vec_id", "embedding")
    val model = Similarity.pqCodebook(vecs, m = 2, k = 2)
    val q = vecs.filter(col("vec_id") === 2)
    val out = Similarity.pqTopK(vecs, q, model, k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    // query (1,1,9,9): LUT sub0 = {c0: 1+1=2, c1: 81+81=162},
    //                  LUT sub1 = {c0: 81+81=162, c1: 1+1=2}
    // candidate 0 codes (0,0) -> 2 + 162 = 164; candidate 1 codes (1,1)
    // -> 162 + 2 = 164: equal scores, tie -> lower neighbor_id first
    assert(out.toSeq === Seq((0L, 164.0, 1L), (1L, 164.0, 2L)))
  }

  test("pq adc on real embeddings: a planted duplicate attains the minimum ADC score") {
    val emb = embeddings.select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") === 3)
      .select((col("vec_id") + 9999).as("vec_id"), col("embedding"))
    val model = Similarity.pqCodebook(emb, m = 8, k = 8)
    val n = emb.count().toInt + 1
    val all = Similarity.pqTopK(emb.unionAll(planted), emb.filter(col("vec_id") === 3),
        model, k = n)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // the exact copy has the query's own codes, so its ADC distance is
    // the query's quantization residual — no candidate can score lower
    assert(all(3L + 9999L) === all.values.min)
  }

  test("pq rerank: exact re-ranking puts a planted duplicate at rank 1 with score 0") {
    val emb = embeddings.select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") === 5)
      .select((col("vec_id") + 9999).as("vec_id"), col("embedding"))
    val model = Similarity.pqCodebook(emb, m = 8, k = 8)
    val top = Similarity.pqRerankTopK(emb.unionAll(planted),
        emb.filter(col("vec_id") === 5), model, k = 5, shortlist = 60)
      .filter(col("rank") === 1).head()
    // ADC alone can tie the copy with same-coded vectors; the exact
    // re-rank stage resolves it: true L2 distance 0, rank 1
    assert(top.getLong(1) === 5L + 9999L)
    assert(top.getDouble(2) === 0.0)
  }

  test("ivf ann: trained quantizer, measured recall@10 vs brute force") {
    val emb = embeddings.select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 20)
    val model = Similarity.trainIvf(emb, k = 16, iterations = 3)
    assert(model.centroids.length === 16)
    assert(model.centroids.forall(_.length === 64))
    val ivf = Similarity.ivfTopK(emb, queries, model, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"IVF recall@10 (k=16, nprobe=4) = $recall%.3f")
    assert(recall >= 0.5, f"IVF recall $recall%.3f below floor")
    // probing ALL partitions must reproduce brute force exactly
    val full = Similarity.ivfTopK(emb, queries, model, k = 10, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact, "nprobe = k must equal brute force")
  }

  test("nearest-class-mean: recovers the class structure of separable data") {
    val train = Seq(
      (1L, Array(1.0f, 0.1f, 0.0f), 0), (2L, Array(0.9f, 0.0f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f, 0.1f), 1), (4L, Array(0.1f, 0.9f, 0.0f), 1),
      (5L, Array(0.0f, 0.1f, 1.0f), 2), (6L, Array(0.1f, 0.0f, 0.9f), 2)
    ).toDF("vec_id", "embedding", "label")
    val means = Similarity.classMeans(train)
    assert(means.count() === 3)
    val out = Similarity.nearestClassMean(train, means)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 2, 6L -> 2))
  }

  test("nearest-class-mean: means and predictions invariant under repartitioning") {
    val emb = embeddings
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.nearestClassMean(emb, Similarity.classMeans(df))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(emb) === run(emb.repartition(13)),
      "decimal-summed means must not depend on partition order")
  }

  test("nearest-class-mean: score ties break to the lowest label") {
    val train = Seq(
      (1L, Array(1.0f, 0.0f), 7), (2L, Array(1.0f, 0.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    // identical prototypes for labels 3 and 7 => every score ties => label 3
    val out = Similarity.nearestClassMean(train, Similarity.classMeans(train))
      .collect().map(_.getInt(1)).distinct.toSeq
    assert(out === Seq(3))
  }

  test("semantic dedup: exact duplicate vectors drop, keeping the lowest id") {
    val dup = embeddings.select("vec_id", "embedding").unionAll(
      embeddings.select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val model = Similarity.trainIvf(dup, k = 8, iterations = 0)
    val out = Similarity.semanticDedup(dup, model, threshold = 0.999999)
    assert(out.count() === dup.count(), "every input row gets a verdict")
    // every planted copy (vec_id >= 10000) has an identical lower-id twin
    // in the same cluster (identical vectors always co-assign) => dropped
    val copies = out.filter(col("vec_id") >= 10000)
    assert(copies.filter(col("kept")).count() === 0)
    // originals are pairwise distinct at this threshold => all kept
    assert(out.filter(col("vec_id") < 10000 && !col("kept")).count() === 0)
  }

  test("semantic dedup: cluster_rep is the lowest id of the member's cluster") {
    val model = Similarity.trainIvf(embeddings, k = 4, iterations = 0)
    val out = Similarity.semanticDedup(embeddings, model, threshold = 0.35)
    assert(out.filter(col("cluster_rep") > col("vec_id")).count() === 0)
    // reps are members of their own cluster and self-labelled
    val reps = out.filter(col("cluster_rep") === col("vec_id")).count()
    assert(reps >= 1 && reps <= 4)
  }

  test("multimodal: features deterministic, frames sampled per duration") {
    val items = Multimodal.syntheticMedia(spark, 30)
    val f1 = Multimodal.extractFeatures(items, dim = 8).collect().sortBy(_.mediaId)
    val f2 = Multimodal.extractFeatures(items, dim = 8).collect().sortBy(_.mediaId)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length === 8))
    val frames = Multimodal.sampleFrames(items, everyMs = 5000)
    assert(frames.count() > 0)
    val perVideo = frames.groupByKey(_.mediaId).count().collect().toMap
    val durations = items.filter(_.kind == "video").collect().map(m => m.mediaId -> m.durationMs).toMap
    durations.foreach { case (id, d) =>
      assert(perVideo(id) === math.max(1, (d / 5000).toInt))
    }
  }

  test("multimodal: gate-query digests match the committed golden values") {
    // The driver's correctness gate can't cross-check multimodal features
    // (no second engine implements these codecs), so the value check lives
    // here: the exact gate-query output — per-item md5 of the feature
    // vector — is pinned against a committed golden file generated from
    // the deterministic synthetic corpus. Any codec or feature-math drift
    // fails this spec even though the gate column stays rows-only.
    val golden = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/multimodal_golden.csv"))
      .getLines().drop(1).map { line =>
        val Array(id, kind, dim, ok, digest) = line.split(",")
        id.toLong -> ((kind, dim.toInt, ok.toBoolean, digest))
      }.toMap
    val items = Multimodal.syntheticMedia(spark, 200)
    val actual = Multimodal.extractFeatures(items, dim = 16).toDF()
      .select(col("mediaId"), col("kind"), col("featureDim"), col("ok"),
        md5(concat_ws(",", col("features"))).as("feature_digest"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getBoolean(3), r.getString(4))))
      .toMap
    assert(actual.size === golden.size)
    val mismatches = golden.collect { case (id, g) if actual(id) != g => id -> (g, actual(id)) }
    assert(mismatches.isEmpty, s"digest drift on mediaIds: ${mismatches.take(5)}")
  }

  test("image near-dups: aHash is stable, planted copies are found, golden matches") {
    import Multimodal.Codecs
    // aHash determinism + sensitivity: identical bytes → identical hash;
    // an inverted image → large Hamming distance
    val rgb = Array.tabulate(16 * 16 * 3)(i => ((i * 13) % 256).toByte)
    val h1 = Codecs.averageHash64(16, 16, rgb)
    val h2 = Codecs.averageHash64(16, 16, rgb.clone())
    assert(h1 === h2)
    val inv = rgb.map(b => (~b).toByte)
    val hInv = Codecs.averageHash64(16, 16, inv)
    assert(java.lang.Long.bitCount(h1 ^ hInv) > 20)

    // the gate query: every planted perturbed copy (id+10000) must pair
    // with its original, and the full output must equal the golden CSV
    val out = graft.SparkEntry.queries("image_near_dups")(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = out.count { case (a, b, _) => b == a + 10000 }
    assert(planted === 67, s"expected all 67 planted pairs, got $planted")
    val golden = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/image_neardup_golden.csv"))
      .getLines().drop(1).map { line =>
        val Array(a, b, h) = line.split(",")
        (a.toLong, b.toLong, h.toLong)
      }.toSeq
    assert(out.toSeq === golden, "aHash near-dup drift vs committed golden")
  }

  test("embeddingMeanShift: hand-computed centroid gap in exact micros") {
    // a = {[1,2],[3,4]} (μ_a = [2,3]), b = {[1,2]} (μ_b = [1,2]):
    // per-dim num = (s_a·n_b − s_b·n_a)² = (2e6)² both dims; den = (2·1)²
    // → Σ num/den = 8e12/4 = 2e12 micro² = ‖μ_a−μ_b‖² = 2.0 exactly
    val a = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val b = Seq((0L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = Similarity.embeddingMeanShift(a, b).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6)))).toMap
    assert(out(0L) === (("4000000", "1000000", 2L, 1L, "4000000000000", "4")))
    assert(out(1L) === (("6000000", "2000000", 2L, 1L, "4000000000000", "4")))
    // identical snapshots shift zero in every dimension
    val same = Similarity.embeddingMeanShift(a, a).collect()
    assert(same.forall(_.getString(5) === "0"))
  }

  test("image pHash: DCT hash is stable, scale-invariant, planted copies found, golden matches") {
    import Multimodal.Codecs
    val rgb = Array.tabulate(16 * 16 * 3)(i => ((i * 13) % 256).toByte)
    // determinism + sensitivity (same contract as aHash)
    val h1 = Codecs.perceptualHash64(16, 16, rgb)
    assert(h1 === Codecs.perceptualHash64(16, 16, rgb.clone()))
    val inv = rgb.map(b => (~b).toByte)
    assert(java.lang.Long.bitCount(h1 ^ Codecs.perceptualHash64(16, 16, inv)) > 20)
    // the property pHash adds over aHash: a pure positive luma scaling
    // (×3/4, never clipping) leaves the sign-vs-median structure nearly
    // intact
    val dark = rgb.map(b => (((b & 0xff) * 3) / 4).toByte)
    assert(java.lang.Long.bitCount(h1 ^ Codecs.perceptualHash64(16, 16, dark)) <= 3)
    // DC bit never set: bit 0 carries only global brightness
    assert((h1 & 1L) === 0L)

    val out = graft.SparkEntry.queries("image_phash_dups")(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // all 67 images pair with BOTH planted copies, and the copies with
    // each other: 3 × 67 rows
    assert(out.count { case (a, b, _) => b == a + 10000 && a < 10000 } === 67)
    assert(out.count { case (a, b, _) => b == a + 20000 && a < 10000 } === 67)
    assert(out.count { case (a, b, _) => b == a + 10000 && a >= 10000 } === 67)
    val golden = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/image_phash_golden.csv"))
      .getLines().drop(1).map { line =>
        val Array(a, b, h) = line.split(",")
        (a.toLong, b.toLong, h.toLong)
      }.toSeq
    assert(out.toSeq === golden, "pHash near-dup drift vs committed golden")
  }

  test("audio/video fingerprints: planted copies found, golden matches") {
    import Multimodal.Codecs
    // delta-sign fingerprint: deterministic; robust to tiny amplitude
    // nudges; changed by re-ordering the energy envelope
    val samples = Array.tabulate[Short](8000)(i =>
      ((math.sin(i / 30.0) * 8000) + (i % 800) * 4).toShort)
    val f1 = Codecs.audioFingerprint64(samples)
    assert(f1 === Codecs.audioFingerprint64(samples.clone()))
    val nudged = samples.zipWithIndex.map { case (s, i) =>
      if (i % 13 == 0) (s + 2).toShort else s }
    assert(java.lang.Long.bitCount(f1 ^ Codecs.audioFingerprint64(nudged)) <= 2)
    assert(java.lang.Long.bitCount(f1 ^ Codecs.audioFingerprint64(samples.reverse)) > 10)

    val out = graft.SparkEntry.queries("media_fingerprint_dups")(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val plantedAudio = out.count { case (a, b, _, m) => m == "audio" && b == a + 10000 }
    val plantedVideo = out.count { case (a, b, _, m) => m == "video" && b == a + 10000 }
    assert(plantedAudio === 67 && plantedVideo === 66,
      s"planted pairs: audio $plantedAudio/67, video $plantedVideo/66")
    val golden = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/media_fingerprint_golden.csv"))
      .getLines().drop(1).map { line =>
        val Array(a, b, h, m) = line.split(",")
        (a.toLong, b.toLong, h.toLong, m)
      }.toSeq
    assert(out.toSeq === golden, "fingerprint drift vs committed golden")
  }

  test("video content dedup finds every trimmed copy the thumbnail screen misses") {
    val out = graft.SparkEntry.queries("video_content_dups")(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // all 66 trimmed (first-frame-dropped) copies pair with their original
    val planted = out.filter { case (a, b, _) => b == a + 20000 }
    assert(planted.length === 66)
    // and the thumbnail screen CANNOT see them: frame 0 differs
    import spark.implicits._
    val items = Multimodal.syntheticMedia(spark, 12).filter(_.kind == "video")
    val trimmedOne = items.collect().collectFirst {
      case m if Multimodal.Codecs.decodeVideoHeader(m.bytes).exists(_._1 >= 2) =>
        val Some((fc, w, h)) = Multimodal.Codecs.decodeVideoHeader(m.bytes)
        val frames = (1 until fc).flatMap(i =>
          Multimodal.Codecs.decodeVideoFrame(m.bytes, i).map(_._3))
        Seq(m, m.copy(mediaId = m.mediaId + 20000,
          bytes = Multimodal.Codecs.encodeVideo(w, h, frames),
          durationMs = m.durationMs - 1000L))
    }.get
    val thumbs = Multimodal.videoThumbHash(spark.createDataset(trimmedOne)).collect()
      .map(_.getLong(1))
    assert(thumbs.length === 2 && thumbs(0) != thumbs(1),
      "fixture defect: trimming should change the thumbnail hash")
    val golden = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/video_content_golden.csv"))
      .getLines().drop(1).map { line =>
        val Array(a, b, s) = line.split(",")
        (a.toLong, b.toLong, s.toLong)
      }.toSeq
    assert(out.toSeq === golden, "frame-set drift vs committed golden")
  }

  test("ppm codec round-trips and resize preserves format") {
    import Multimodal.Codecs
    val rgb = Array.tabulate(8 * 4 * 3)(i => (i * 7 % 256).toByte)
    val encoded = Codecs.encodePpm(8, 4, rgb)
    val Some((w, h, decoded)) = Codecs.decodePpm(encoded)
    assert((w, h) === (8, 4))
    assert(decoded.toSeq === rgb.toSeq)
    val resized = Codecs.resizeNearest(8, 4, rgb, 4, 2)
    assert(resized.length === 4 * 2 * 3)
    assert(Codecs.decodePpm(Codecs.encodePpm(4, 2, resized)).isDefined)
    assert(Codecs.decodePpm("not a ppm".getBytes) === None)
  }

  test("wav codec round-trips and audio features are physical") {
    import Multimodal.Codecs
    val sr = 8000
    val sine = Array.tabulate(sr)(t => (0.5 * math.sin(2 * math.Pi * 500 * t / sr) * 32767).toShort)
    val Some((rate, decoded)) = Codecs.decodeWavPcm16(Codecs.encodeWavPcm16(sr, sine))
    assert(rate === sr)
    assert(decoded.toSeq === sine.toSeq)
    val f = Codecs.audioFeatures(sr, sine)
    // RMS of a 0.5-amplitude sine is 0.5/sqrt(2) ~ 0.354
    assert(math.abs(f(0) - 0.354) < 0.01, s"rms = ${f(0)}")
    // the 500 Hz Goertzel band must dominate the other bands
    val bands = f.drop(2)
    assert(bands(1) === bands.max, s"bands = ${bands.toSeq}")
    assert(Codecs.decodeWavPcm16(Array.fill[Byte](50)(1)) === None)
  }

  test("corrupt media payloads flow to ok=false instead of failing the job") {
    import spark.implicits._
    val bad = Seq(
      Multimodal.MediaItem(1L, "image", Array[Byte](1, 2, 3), 8, 8, 0L),
      Multimodal.MediaItem(2L, "audio", Array[Byte](9, 9), 0, 0, 1000L)).toDS()
    val out = Multimodal.extractFeatures(bad, dim = 4).collect().sortBy(_.mediaId)
    assert(out.forall(!_.ok))
    assert(out.forall(_.features.forall(_ == 0.0f)))
  }

  test("video frame sampling decodes real frames at sampled timestamps") {
    import Multimodal.Codecs
    val items = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(items, everyMs = 5000).collect()
    assert(frames.nonEmpty)
    // each sampled frame is a real decode of the container's frame bytes
    val byId = items.filter(_.kind == "video").collect().map(m => m.mediaId -> m).toMap
    frames.take(10).foreach { f =>
      val m = byId(f.mediaId)
      val Some((w, h, expected)) = Codecs.decodeVideoFrame(m.bytes, f.frameIndex)
      assert(f.pixels.toSeq === expected.toSeq)
      assert(f.pixels.length === w * h * 3)
    }
  }

  test("text analysis projection has sane values") {
    val out = TextAnalysis.analyze(docs).collect()
    assert(out.forall(r => r.getAs[Long]("n_tokens") > 0))
    assert(out.forall { r =>
      val q = r.getAs[Double]("quality"); q >= 0.0 && q <= 1.0
    })
    val langs = out.map(_.getAs[String]("lang_id")).toSet
    assert(langs.contains("en"))
  }

  test("int8 quantization: hand-checked codes, sums, and micro-unit error") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)) // zero vector must not divide by zero
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Long](2)))).toMap
    assert(q(1L)._1 === 1.0)
    // round(-63.5) is away from zero (both engines): -64, not -63
    assert(q(1L)._2 === Seq(127L, -64L, 32L, 0L))
    assert(q(2L) === ((0.0, Seq(0L, 0L))))

    val st = Similarity.quantizeInt8Stats(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(st(1L)._1 === 95L) // 127 - 64 + 32 + 0
    assert(st(1L)._2 === 223L)
    // err: 0 + round(|−64/127 + 0.5|·1e6) + round(|32/127 − 0.25|·1e6) + 0
    assert(st(1L)._3 === 3937L + 1969L)
    assert(st(2L) === ((0L, 0L, 0L)))
  }

  test("quantized cosine top-k: measured recall@10 vs exact on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.orderBy("vec_id").limit(5)
    def topSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id"))
    val quant = topSet(Similarity.quantizedCosineTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id"))
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 cosine recall@10 was $recall")
  }

  test("int8 quantization: reconstruction error bounded by scale/254 on real vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bad = Similarity.quantizeInt8Stats(emb)
      .join(emb.select(col("vec_id"), size(col("embedding")).as("dim")), "vec_id")
      // per-element error ≤ scale/254 (+1 micro-unit rounding slack each)
      .filter(col("err_micro_sum") >
        col("scale") / 254d * 1000000d * col("dim") + col("dim"))
    assert(bad.count() === 0L)
  }

  test("Mann-Whitney U: hand-computed tie case, and the 2*na*nb invariant on real data") {
    // A = {1,2,3}, B = {2,3,4}: midranks 1, 2.5, 2.5, 4.5, 4.5, 6 →
    // R_A = 1+2.5+4.5 = 8 → U_A = 8 − 3·4/2 = 2 → u2_a = 4; u2_b = 14
    val tiny = Seq(("a", 1L), ("a", 2L), ("a", 3L),
                   ("b", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val r = Stats.mannWhitneyU(tiny, "g", "v", "a", "b").head()
    assert((r.getLong(0), r.getLong(1), r.getDecimal(2).longValueExact(),
      r.getDecimal(3).longValueExact()) === ((3L, 3L, 4L, 14L)))

    // degenerate: all values tied → U_A = U_B = na·nb/2 exactly
    val tied = Seq(("a", 7L), ("a", 7L), ("b", 7L)).toDF("g", "v")
    val rt = Stats.mannWhitneyU(tied, "g", "v", "a", "b").head()
    assert((rt.getDecimal(2).longValueExact(),
      rt.getDecimal(3).longValueExact()) === ((2L, 2L)))

    // real data: u2_a + u2_b = 2·n_a·n_b always (rank-sum identity)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("value_c", round(col("value") * 100).cast("long"))
    val rr = Stats.mannWhitneyU(ev, "event_type", "value_c", "view", "purchase").head()
    assert(rr.getDecimal(2).longValueExact() + rr.getDecimal(3).longValueExact()
      === 2L * rr.getLong(0) * rr.getLong(1))

    // same group twice is a coding error, rejected loudly (not a
    // silently double-counted nonsense U)
    assertThrows[IllegalArgumentException] {
      Stats.mannWhitneyU(tiny, "g", "v", "a", "a")
    }
  }

  test("Kneser-Ney bigram model: hand-computed rationals on a tiny corpus") {
    // corpus "a b a b a c": bigrams (a,b)x2, (b,a)x2, (a,c)x1
    // c(a.)=3, c(b.)=2; N1+(a.)=2, N1+(b.)=1; N1+(.a)=N1+(.b)=N1+(.c)=1;
    // N1+(..)=3. Hand-checked: p(b|a)=7/12, p(c|a)=1/4, p(a|b)=3/4.
    val tiny = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val m = Lexical.knBigramModel(tiny)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDecimal(3).longValueExact(), r.getDecimal(4).longValueExact())))
      .toMap
    assert(m(("a", "b")) === ((21L, 36L))) // = 7/12
    assert(m(("a", "c")) === ((9L, 36L)))  // = 1/4
    assert(m(("b", "a")) === ((18L, 24L))) // = 3/4
    // every probability is in (0, 1]: num <= den, num > 0 (smoothing
    // never zeroes an observed bigram)
    assert(m.values.forall { case (n, d) => n > 0 && n <= d })
  }

  test("knRareBigramRate: hand-computed unseen/rare counts on the tiny KN corpus") {
    // fit "a b a b a c" (p(b|a)=7/12, p(c|a)=1/4, p(a|b)=3/4); score
    // "a b a c a d": bigrams (a,b),(b,a),(a,c),(c,a),(a,d) — (c,a) and
    // (a,d) unseen; at threshold 1/3 only (a,c)'s 1/4 is rare
    val fit = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val model = Lexical.knBigramModel(fit)
    val score = Seq((7L, "a b a c a d")).toDF("doc_id", "text")
    val r = Lexical.knRareBigramRate(score, model, tNum = 1L, tDen = 3L).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((7L, 5L, 2L, 1L)))

    // threshold monotonicity: at 1/5 nothing seen is rare (the smallest
    // seen probability is 1/4 > 1/5); at 1/1 all three seen bigrams are
    // (every smoothed probability is strictly below 1)
    val r2 = Lexical.knRareBigramRate(score, model, tNum = 1L, tDen = 5L).head()
    assert(r2.getLong(3) === 0L)
    val r3 = Lexical.knRareBigramRate(score, model, tNum = 1L, tDen = 1L).head()
    assert(r3.getLong(3) === 3L)

    // a one-token document has no transitions and produces no row
    val single = Seq((9L, "a")).toDF("doc_id", "text")
    assert(Lexical.knRareBigramRate(single, model, 1L, 3L).count() === 0L)
  }

  test("temperatureWeights: exact integer sqrt weights and floor-division shares") {
    // n=4 -> isqrt(4e12) = 2_000_000 exactly; n=2 -> isqrt(2e12) =
    // 1_414_213 (floor of 1.41421356e6); n=9 -> 3_000_000
    val df = (Seq.fill(4)("s4") ++ Seq.fill(2)("s2") ++ Seq.fill(9)("s9"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "src")
    val out = Sampling.temperatureWeights(df, "src").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("s4")._2 === 2000000L)
    assert(out("s2")._2 === 1414213L)
    assert(out("s9")._2 === 3000000L)
    val totalW = out.values.map(_._2).sum
    out.foreach { case (_, (_, w, ppm)) =>
      assert(ppm === w * 1000000L / totalW) // floor division
    }
    // temperature flattens: s2's share (2/15 = 13.3% of docs) rises,
    // s9's (60%) falls
    assert(out("s2")._3 > 2000000L / 15L)
    assert(out("s9")._3 < 9000000L / 15L)

    // NULL sources drop (the weightedMixture semantics) instead of
    // NPE-ing the driver's group-key toString
    val withNull = df.withColumn("src",
      when(col("id") === 0L, lit(null: String)).otherwise(col("src")))
    val outN = Sampling.temperatureWeights(withNull, "src").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outN.keySet === Set("s2", "s4", "s9"))
    assert(outN("s4") === 3L) // one s4 doc went null → dropped
  }

  test("pairwiseClusterEval: hand-computed cells; planted-truth recall on the dup corpus") {
    // pred {1,2,3} + singletons {4},{5}; gold {1,2},{3,4},{5}:
    // pred_pairs = C(3,2) = 3, gold_pairs = 1+1 = 2, tp = {1,2} = 1
    val tiny = Seq((1L, 10L, 100L), (2L, 10L, 100L), (3L, 10L, 200L),
                   (4L, 4L, 200L), (5L, 5L, 300L)).toDF("id", "pred", "gold")
    val r = Validation.pairwiseClusterEval(tiny, "id", "pred", "gold").head()
    def dec(i: Int) = r.getDecimal(i).longValueExact()
    assert(r.getLong(0) === 5L)
    assert((dec(1), dec(2), dec(3), dec(4), dec(5)) === ((3L, 2L, 1L, 2L, 1L)))

    // planted truth on the dup corpus: the near-dup pipeline at the
    // near_dup_groups setting recovers the {d, d+10000, d+20000}
    // clusters with perfect pairwise recall (fn = 0); precision may
    // dip only via coincidental base-corpus near-dups
    val dup = {
      val d = docs.select("doc_id", "text")
      d.unionAll(d.filter(col("doc_id") < 100)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
        .unionAll(d.filter(col("doc_id") < 40)
          .select((col("doc_id") + 20000).as("doc_id"),
            col("text").substr(lit(11), lit(100000)).as("text")))
    }
    val groups = Dedup.nearDupGroups(dup, "text", "doc_id",
      threshold = 0.5, k = 32, bands = 8, shingleSize = 5)
    val assign = dup.select("doc_id")
      .join(groups, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("group_id"), col("doc_id")).as("pred"),
        (col("doc_id") % 10000).as("gold"))
    val rr = Validation.pairwiseClusterEval(assign, "doc_id", "pred", "gold").head()
    def rdec(i: Int) = rr.getDecimal(i).longValueExact()
    assert(rdec(5) === 0L, s"planted pairs missed: fn=${rdec(5)}")
    assert(rdec(3) >= rdec(2) && rdec(2) > 0L) // tp covers all gold pairs
  }

  test("pairAudit: orientation normalized, misses and leaks flagged by name") {
    val exact = Seq((1L, 2L), (3L, 4L), (6L, 5L)).toDF("id_a", "id_b")
    val approx = Seq((2L, 1L), (5L, 6L), (7L, 8L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Dedup.pairAudit(exact, approx).orderBy("id_a", "id_b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 1L, 1L),   // agreement
      (3L, 4L, 1L, 0L),   // approx missed it
      (5L, 6L, 1L, 1L),   // orientation flip still matches
      (7L, 8L, 0L, 1L)))  // approx-only leak, dup collapsed
  }

  test("ngramPrecisionCounts: BLEU clipping, length rows, and zero-anchor rows") {
    // the ACL'02 clipping classic: candidate "the the the the" against
    // reference "the cat sat on the mat" -> unigram matches clip at 2
    val pairs = Seq(
      (1L, "the the the the", "the cat sat on the mat"),
      (2L, "a b", "a b"),
      (3L, "x", "y z")).toDF("doc_id", "cand", "ref")
    val out = Validation.ngramPrecisionCounts(pairs, "cand", "ref", "doc_id", maxN = 2)
      .orderBy("id", "n")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 4L, 4L, 6L),  // lengths: cand, cand, ref
      (1L, 1L, 2L, 4L, 6L),  // clipped: min(4 cand "the", 2 ref "the")
      (1L, 2L, 0L, 3L, 5L),  // "the the" never occurs in the reference
      (2L, 0L, 2L, 2L, 2L),
      (2L, 1L, 2L, 2L, 2L),
      (2L, 2L, 1L, 1L, 1L),  // perfect bigram match
      (3L, 0L, 1L, 1L, 2L),
      (3L, 1L, 0L, 1L, 2L),
      (3L, 2L, 0L, 0L, 1L))) // cand too short for bigrams -> anchored 0s
  }
}
