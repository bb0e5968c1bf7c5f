package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape of the problem:
  *
  * - exact: hash-groupBy (one shuffle on a 16-byte key, not on the text);
  * - MinHash + LSH: per-row signatures are pure column expressions (no
  *   shuffle), candidate generation shuffles only (band, bandHash) pairs,
  *   and verification touches only candidate pairs — the classic
  *   shingle → minhash → band → bucket-join pipeline;
  * - SimHash: 64-bit near-dup code per row, one pass, codegen'd;
  * - n-gram Jaccard: exact verification used on LSH survivors (or brute
  *   force within small blocks);
  * - embedding cosine near-dup: see [[Similarity]].
  */
object Dedup {

  // ------------------------------------------------------------------
  // Exact dedup
  // ------------------------------------------------------------------

  /** Exact duplicate groups by content hash: (hash, keepId, dupCount).
    * Shuffles the 16-byte md5, not the document text. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep one row per distinct content (the minimum id wins —
    * deterministic, unlike dropDuplicates). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactGroups(df, textCol, idCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** 64-bit hashes of character shingles. */
  def shingleHashes(text: Column, shingleSize: Int): Column =
    transform(array_distinct(TextAnalysis.charShingles(text, shingleSize)), s => xxhash64(s))

  /** MinHash signature: array of k minima over seed-mixed shingle hashes
    * (hash family j = xxhash64(shingleHash, j)). A native Catalyst
    * expression ([[graft.functions.MinHashSig]]): the identical math is
    * expressible with `transform`/`array_min` HOFs, but those interpret
    * one lambda per (seed × shingle) — ~10^4 invocations per document —
    * while the native expression is one JIT'd loop per row inside
    * whole-stage codegen. Computed in the scan projection, zero shuffle. */
  def minHashSignature(text: Column, k: Int = 32, shingleSize: Int = 5): Column =
    graft.functions.TextHash.minHashSignature(text, k, shingleSize)

  /** LSH band hashes: the signature split into `bands` groups of
    * `k/bands` values, each group hashed to one bucket key. */
  def lshBandHashes(signature: Column, bands: Int, k: Int): Column = {
    val rows = k / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws("|", slice(signature, b * rows + 1, lit(rows)))))
  }

  /** Candidate near-duplicate pairs via LSH: docs sharing any band bucket.
    * Only (band, bucket, id) tuples shuffle — never the text. */
  def lshCandidatePairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 32, bands: Int = 8, shingleSize: Int = 5): DataFrame = {
    val sig = df.select(
      col(idCol).as("id"),
      posexplode(lshBandHashes(minHashSignature(col(textCol), k, shingleSize), bands, k))
        .as(Seq("band", "bucket")))
    val l = sig.as("l")
    val r = sig.as("r")
    l.join(r,
        col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity between two texts' distinct shingle
    * sets. */
  def jaccard(textA: Column, textB: Column, shingleSize: Int): Column = {
    val sa = array_distinct(TextAnalysis.charShingles(textA, shingleSize))
    val sb = array_distinct(TextAnalysis.charShingles(textB, shingleSize))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** Full MinHash-LSH near-dup pipeline: candidates from LSH buckets,
    * verified with exact shingle Jaccard ≥ threshold. Returns
    * (id_a, id_b, jaccard). The join back to text touches only candidate
    * ids (broadcast when candidate set is small). */
  def nearDupPairs(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, k: Int = 32, bands: Int = 8,
      shingleSize: Int = 5): DataFrame = {
    val cands = lshCandidatePairs(df, textCol, idCol, k, bands, shingleSize)
    val docs = df.select(col(idCol).as("id"), col(textCol).as("txt"))
    cands
      .join(docs.withColumnRenamed("id", "id_a").withColumnRenamed("txt", "txt_a"), "id_a")
      .join(docs.withColumnRenamed("id", "id_b").withColumnRenamed("txt", "txt_b"), "id_b")
      .withColumn("jaccard", jaccard(col("txt_a"), col("txt_b"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash of the token set: each token's hash votes ±1 per bit;
    * the sign vector is packed into one long. Native Catalyst expression
    * ([[graft.functions.SimHash64]]) — one JIT'd pass per row instead of
    * 64 interpreted lambda evaluations per token. No shuffle. */
  def simHash(text: Column): Column = graft.functions.TextHash.simHash64(text)

  /** Hamming distance between two 64-bit SimHash codes. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the high 16 bits (near-dups almost
    * always share the prefix), verify with full Hamming distance ≤ maxDist.
    * At scale this is the standard rotate-and-block scheme's first probe. */
  def simHashNearDups(df: DataFrame, textCol: String, idCol: String, maxDist: Int = 3): DataFrame = {
    val codes = df.select(col(idCol).as("id"), simHash(col(textCol)).as("code"))
      .withColumn("block", shiftrightunsigned(col("code"), 48))
    val l = codes.as("l"); val r = codes.as("r")
    l.join(r, col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .withColumn("dist", hammingDistance(col("l.code"), col("r.code")))
      .filter(col("dist") <= maxDist)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("dist"))
  }
}
