package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object OnlineSuffixProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft-osd-prof").toString
    val online = new graft.streaming.OnlineSuffixDedup(root, minLen = 50)
    (0 to 3).foreach { i =>
      val t0 = System.nanoTime()
      online.processBatch(docs.filter(col("doc_id") % 4 === i), i.toLong)
      println(f"[osd] batch $i total ${(System.nanoTime()-t0)/1e9}%7.3f s")
    }
    spark.stop()
  }
}
