package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for repeat-join corpora — the storage-level
  * answer to "co-locate the join": a table hash-bucketed (and
  * optionally sorted) on its join key is read back with its
  * partitioning ALREADY established, so every subsequent join or
  * aggregation on that key runs with ZERO Exchange on its side. At
  * 100 TB this is the difference between shuffling the corpus once per
  * query and shuffling it once per INGEST: dedup indexes probed every
  * batch ([[graft.streaming.OnlineDedup]]), posting lists probed per
  * query ([[graft.operators.Lexical]]), and message logs joined to
  * stream heads are all read-many join-many — exactly the shape
  * bucketing pays for.
  *
  * Mechanics (all standard Spark): `bucketBy(n, key)` hashes rows into
  * `n` files per write-partition and records the layout in the catalog;
  * the scan then reports `HashPartitioning(key, n)` and Catalyst drops
  * the `ENSURE_REQUIREMENTS` exchange. Both sides of a join must agree
  * on bucket count and key. Sorting within buckets (`sortBy`) further
  * lets sort-merge joins skip their sorts. The catalog entry is what
  * carries the layout — on a cluster that's the metastore; `saveAsTable`
  * is therefore required (plain `parquet(path)` writes forget the
  * bucketing).
  */
object BucketedTables {

  /** Write `df` as a bucketed parquet table named `table`, bucketed and
    * sorted by `key` into `buckets` files per partition, rooted at
    * `path` (external table, so the data outlives catalog churn). */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int,
      path: String): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Read a bucketed table back with its layout attached (a plain
    * `spark.read.parquet` of the same files would NOT carry the
    * bucketing — only the catalog read does). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
