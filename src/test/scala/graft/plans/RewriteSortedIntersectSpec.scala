package graft.plans

import graft.SparkTestSession
import graft.functions.{GraftFunctions, TextHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The size(array_intersect(...)) → SortedIntersectCount optimizer
  * rewrite: fires on provable shingle-hash lineage (inline, aliased,
  * through a self-join), never on arbitrary arrays, and values match the
  * unoptimized formulation. */
class RewriteSortedIntersectSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  GraftFunctions.register(spark)

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the smart dog"),
    (3L, "completely unrelated content goes right here"))

  private def optimizedHas(df: DataFrame, needle: String): Boolean =
    df.queryExecution.optimizedPlan.toString.contains(needle)

  test("inline shingle_hashes pairs rewrite and values match the naive plan") {
    val docs = texts.toDF("id", "text")
    val joined = docs.as("a").crossJoin(docs.as("b"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        size(array_intersect(
          TextHash.shingleHashes(col("a.text"), 5),
          TextHash.shingleHashes(col("b.text"), 5))).as("n"))
    assert(optimizedHas(joined, "sorted_intersect_count"))
    assert(!optimizedHas(joined, "array_intersect"))

    val naive = docs.as("a").crossJoin(docs.as("b"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        size(array_intersect(
          sort_array(array_distinct(TextHash.shingleHashes(col("a.text"), 5))),
          TextHash.shingleHashes(col("b.text"), 5))).as("n"))
    // the sort_array/array_distinct wrapper blocks the rewrite, giving an
    // honest unrewritten reference with identical values
    assert(!optimizedHas(naive, "sorted_intersect_count"))
    val lhs = joined.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val rhs = naive.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(lhs === rhs)
  }

  test("aliased shingle columns through a self-join still rewrite") {
    // file-backed input: over a LocalRelation fixture the optimizer
    // constant-folds the shingle projection into literal rows
    // (ConvertToLocalRelation) before any lineage is checkable — which
    // never happens over a real scan
    val dir = java.nio.file.Files.createTempDirectory("rsi-fixture").toString
    texts.toDF("id", "text").write.mode("overwrite").parquet(dir)
    val sh = spark.read.parquet(dir)
      .select(col("id"), TextHash.shingleHashes(col("text"), 5).as("sh"))
    val joined = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(size(array_intersect(col("a.sh"), col("b.sh"))).as("n"))
    assert(optimizedHas(joined, "sorted_intersect_count"))
    assert(joined.collect().map(_.getInt(0)).sum > 0)
  }

  test("SQL formulation rewrites too") {
    texts.toDF("id", "text").createOrReplaceTempView("rsi_docs")
    val df = spark.sql(
      """SELECT size(array_intersect(shingle_hashes(a.text, 5), shingle_hashes(b.text, 5))) AS n
         FROM rsi_docs a JOIN rsi_docs b ON a.id < b.id""")
    assert(optimizedHas(df, "sorted_intersect_count"))
  }

  test("arbitrary long arrays do NOT rewrite") {
    val df = Seq((Array(3L, 1L), Array(1L, 9L))).toDF("x", "y")
      .select(size(array_intersect(col("x"), col("y"))).as("n"))
    assert(!optimizedHas(df, "sorted_intersect_count"))
    assert(df.head().getInt(0) === 1)
  }
}
