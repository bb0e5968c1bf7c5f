package graft.tools
import org.apache.spark.sql.SparkSession
object CheckRows {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("minhash_near_dups", "ngram_jaccard_pairs", "simhash_near_dups"))
      println(n + " rows: " + graft.SparkEntry.queries(n)(spark, dir).count())
    spark.stop()
  }
}
