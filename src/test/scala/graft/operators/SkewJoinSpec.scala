package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join: identical answers to the plain join, salts actually
  * spread the hot key, deterministic across runs. */
class SkewJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of fact rows share key 0 — the shape that serializes a plain
  // shuffle join on one partition
  private val fact = (0L until 1000L)
    .map(i => (if (i % 10 != 0) 0L else i, i, s"f$i"))
    .toDF("k", "row_id", "fv")
  private val dim = Seq((0L, "hot"), (10L, "d10"), (20L, "d20"), (999L, "unmatched"))
    .toDF("dk", "dv")

  test("salted join equals the plain join exactly") {
    val salted = SkewJoin.saltedJoin(fact, dim, "k", "dk", salts = 8,
        factUniqueCol = "row_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val plain = fact.join(dim, col("k") === col("dk")).drop("dk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(salted === plain)
    // hot key fully matched, once each: 900 rows with i%10!=0 plus i=0
    assert(salted.count(_._1 == 0L) === 901)
  }

  test("the hot key really spreads across salts") {
    val f = fact.withColumn("salt",
      conv(substring(md5(col("row_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 8)
    val hotSalts = f.filter(col("k") === 0L).select("salt").distinct().count()
    assert(hotSalts === 8L, "hot-key rows should hit every salt partition")
  }

  test("each dim row replicates once per salt and no more") {
    val salted = SkewJoin.saltedJoin(fact, dim, "k", "dk", salts = 4,
      factUniqueCol = "row_id")
    // row_id is unique in fact, so output multiplicity per row_id must be 1
    val maxDup = salted.groupBy("row_id").count().agg(max("count")).head().getLong(0)
    assert(maxDup === 1L)
  }

  test("hot-key hybrid join equals the plain join exactly") {
    val hybrid = SkewJoin.hotKeyHybridJoin(fact, dim, "k", "dk", hotThreshold = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    val plain = fact.join(dim, col("k") === col("dk")).drop("dk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSet
    assert(hybrid === plain)
  }

  test("hybrid join routes exactly the over-threshold keys to the hot slice") {
    // threshold 100 → only key 0 (901 rows) is hot; every key hot →
    // cold slice empty; threshold above max → degenerates to plain join
    val allHot = SkewJoin.hotKeyHybridJoin(fact, dim, "k", "dk", hotThreshold = 1L)
      .count()
    val noneHot = SkewJoin.hotKeyHybridJoin(fact, dim, "k", "dk", hotThreshold = 100000L)
      .count()
    val plain = fact.join(dim, col("k") === col("dk")).count()
    assert(allHot === plain)
    assert(noneHot === plain)
  }

  test("hybrid join output carries no helper columns") {
    val cols = SkewJoin.hotKeyHybridJoin(fact, dim, "k", "dk", hotThreshold = 100L)
      .columns.toSeq
    assert(cols === Seq("k", "row_id", "fv", "dv"))
  }

  test("AQE splits the hot partition of a skewed shuffle join (skew=true)") {
    // The RUNTIME counterpart of the manual salting above: when the dim
    // is too big to broadcast and a key is hot, AQE's OptimizeSkewedJoin
    // must split the oversized partition into parallel sub-reads —
    // thresholds scaled to test data; at 100 TB the defaults (256 MB
    // skew threshold) encode the same economics. Pinned so a conf or
    // Spark upgrade can't silently serialize hot keys again.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k =>
      k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val bigFact = spark.range(60000L)
        .select(when(col("id") < 50000L, 0L).otherwise(col("id") % 100L).as("k"),
          lpad(col("id").cast("string"), 64, "x").as("pad"))
      val bigDim = spark.range(100L).select(col("id").as("dk"),
        lpad(col("id").cast("string"), 64, "y").as("dpad"))
      // aggregate over the pad columns so column pruning can't shrink
      // the shuffled rows below the skew threshold
      val j = bigFact.join(bigDim, col("k") === col("dk"))
        .agg(sum(length(col("pad")) + length(col("dpad"))).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n${plan.take(3000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
