package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** The property the layout exists for: a day predicate prunes at the
  * DIRECTORY level (PartitionFilters, partitions never listed into the
  * scan), answers match the unpartitioned filter exactly, and the write
  * discipline yields one file per day. */
class PartitionedLayoutSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def events = spark.read.parquet(s"$sf/events.parquet")
    .withColumn("ts", col("ts").cast("timestamp"))

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-partitioned").toString
    PartitionedLayout.writeByDay(events, "ts", d)
    d
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail(s"no file scan in:\n$finalPlan"))
  }

  test("single-day scan prunes to one partition directory") {
    val day = events.select(to_date(col("ts")).as("d"))
      .groupBy("d").count().orderBy(col("count").desc)
      .head().getDate(0).toString
    val scan = scanOf(PartitionedLayout.scanDay(spark, dir, day))
    assert(scan.partitionFilters.nonEmpty, "day predicate missed PartitionFilters")
    assert(scan.selectedPartitions.partitionCount === 1,
      s"scan listed ${scan.selectedPartitions.partitionCount} partitions for one day")
  }

  test("day-range scan lists exactly the in-range partitions") {
    val days = events.select(to_date(col("ts")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0).toString)
    assume(days.length >= 3, "fixture has too few days")
    val (from, to) = (days(0), days(1))
    val scan = scanOf(PartitionedLayout.scanDayRange(spark, dir, from, to))
    assert(scan.selectedPartitions.partitionCount === 2,
      s"expected 2 partitions, got ${scan.selectedPartitions.partitionCount}")
  }

  test("partitioned answers match the unpartitioned filter exactly") {
    val day = events.select(to_date(col("ts")).as("d")).distinct()
      .orderBy("d").head().getDate(0).toString
    val got = PartitionedLayout.scanDay(spark, dir, day)
      .select("event_id").orderBy("event_id")
      .collect().map(_.getLong(0)).toSeq
    val want = events.filter(to_date(col("ts")) === lit(day).cast("date"))
      .select("event_id").orderBy("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact directories at runtime") {
    // the join key IS the partition column and the dim filter is only
    // knowable at runtime — exactly the star-join shape DPP exists for:
    // the fact scan must carry a dynamicpruning subquery filter so the
    // non-matching day directories are skipped, not scanned-and-dropped.
    // At 100 TB this is the difference between O(matching days) and
    // O(history) for every dim-filtered fact query.
    val dim = events.select(to_date(col("ts")).as(PartitionedLayout.PartitionCol))
      .distinct()
      .withColumn("tag", (dayofmonth(col(PartitionedLayout.PartitionCol)) <= 2).cast("boolean"))
    val fact = spark.read.parquet(dir)
    val j = fact.join(dim.filter(col("tag")), Seq(PartitionedLayout.PartitionCol))
      .groupBy(col(PartitionedLayout.PartitionCol)).count()
    j.collect()
    // the scan sits inside an AQE query stage — assert on the full plan
    // string, which prints each stage's PartitionFilters
    val plan = j.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"fact scan lost dynamic partition pruning:\n${plan.take(4000)}")
  }

  test("write discipline: one parquet file per day directory") {
    val root = java.nio.file.Paths.get(dir)
    val dayDirs = java.nio.file.Files.list(root).filter(p =>
      p.getFileName.toString.startsWith(s"${PartitionedLayout.PartitionCol}=")).toArray
    assert(dayDirs.nonEmpty, "no partition directories written")
    dayDirs.foreach { d =>
      val files = java.nio.file.Files.list(d.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet")).count()
      assert(files === 1L, s"$d has $files files (small-files guard broken)")
    }
  }
}
