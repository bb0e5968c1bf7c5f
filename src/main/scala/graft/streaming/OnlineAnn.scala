package graft.streaming

import graft.operators.Similarity
import graft.operators.Similarity.IvfModel
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Streaming embedding ingestion with an ONLINE IVF index — the vector
  * sibling of [[OnlineDedup]]: a `foreachBatch` sink that assigns each
  * arriving micro-batch of embeddings to its coarse-quantizer cell and
  * appends the assignments to a standing parquet cell table; queries
  * probe the accumulated index at any time without ever re-assigning the
  * corpus. The 100 TB story: ingest cost is O(batch) per batch forever —
  * one broadcast of the k×dim centroid matrix and a projection; a probe
  * touches only the `nprobe` probed cells' rows, and because the cell
  * table is written PARTITIONED BY cluster, the probe's scan prunes to
  * those cell directories at the source.
  *
  * Centroids are trained ONCE, on the first batch (deterministic
  * seeding, [[Similarity.trainIvf]]), persisted under `centroids/`, and
  * never moved — a frozen coarse quantizer, which is exactly how serving
  * IVF indexes run (retraining would re-bucket the accumulated corpus).
  * Replays of the first batch reuse the persisted centroids, so the
  * index stays consistent under foreachBatch's at-least-once contract.
  *
  * Replay safety: cell rows land under `cells/batch=<batchId>/
  * cluster=<c>` with OVERWRITE — a replayed batch rewrites its own
  * partition directories instead of double-appending ([[OnlineDedup]]'s
  * recipe).
  *
  * Contract: `rootDir` belongs to one streaming-query lineage (batch ids
  * are the idempotence key); vector ids unique across all batches. */
final class OnlineAnn(
    rootDir: String, k: Int = 16, trainIterations: Int = 0,
    idCol: String = "vec_id", vecCol: String = "embedding") {

  private val cellsDir = s"$rootDir/cells"
  private val centroidsDir = s"$rootDir/centroids"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def loadModel(spark: SparkSession): Option[IvfModel] =
    if (fs(spark, centroidsDir).exists(new Path(centroidsDir))) {
      val rows = spark.read.parquet(centroidsDir)
        .collect().sortBy(_.getAs[Int]("cluster"))
        .map(_.getAs[scala.collection.Seq[Float]]("centroid").toArray)
      Some(IvfModel(rows))
    } else None

  /** The foreachBatch hook:
    * `stream.writeStream.foreachBatch(online.processBatch _)`. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    val model = loadModel(spark).getOrElse {
      val trained = Similarity.trainIvf(batch, k, trainIterations, idCol, vecCol)
      trained.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cluster", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(centroidsDir)
      trained
    }
    Similarity.assignCells(batch, model, idCol, vecCol)
      .write.mode("overwrite")
      .partitionBy("cluster")
      .parquet(s"$cellsDir/batch=$batchId")
  }

  /** Top-k cosine neighbors of `queries` against everything ingested so
    * far. The cell table is parquet partitioned by cluster — the probe
    * prunes to `nprobe` cells per query at the scan. */
  def probe(queries: DataFrame, topK: Int, nprobe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val model = loadModel(spark).getOrElse(
      throw new IllegalStateException("OnlineAnn: no batches ingested yet"))
    val cells = spark.read.parquet(cellsDir)
      .select(col("cluster"), col("neighbor_id"), col("c_vec"))
    Similarity.probeCells(cells, queries, model, topK, nprobe, idCol, vecCol)
  }

  /** Rows ingested so far (id + cell), for audits. */
  def indexed(spark: SparkSession): DataFrame =
    if (fs(spark, cellsDir).exists(new Path(cellsDir)))
      spark.read.parquet(cellsDir).select(col("neighbor_id"), col("cluster"))
    else spark.emptyDataFrame
}
