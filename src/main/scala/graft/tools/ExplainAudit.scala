package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected (or all) gate queries,
  * plus quick scan health checks: filter pushdown reaching the parquet
  * scan, pruned read schemas, broadcast joins on small dims, and
  * whole-stage codegen coverage.
  *
  * Run: `sbt "runMain graft.tools.ExplainAudit [sfDir] [query ...]"`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n===== $name =====")
        val df = fn(spark, sfDir)
        // collect() finalizes THIS DataFrame's adaptive plan (a noop write
        // would execute a separate QueryExecution and leave df's unfinal)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString()
        df.explain("formatted")
        // quick health summary over the FINAL adaptive plan; codegen
        // stages appear as `*(n)` operator prefixes
        val pushed = "PushedFilters: \\[[^\\]]*[A-Za-z][^\\]]*\\]".r.findAllIn(plan).size
        val bhj = plan.split('\n').count(_.contains("BroadcastHashJoin"))
        val bnl = plan.split('\n').count(_.contains("BroadcastNestedLoopJoin"))
        val smj = plan.split('\n').count(_.contains("SortMergeJoin"))
        val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
        println(s"[audit] $name pushedFilterScans=$pushed broadcastJoins=$bhj " +
          s"broadcastNestedLoop=$bnl sortMergeJoins=$smj codegenSpans=$wsc")
      }
    }

    // Store-surface audits: the plans behind the two DataFrame surfaces
    // added in round 3 — the JDBC backend's position-partitioned scan
    // (filters must reach the database) and the journal-backed streams
    // relation.
    if (args.length <= 1) {
      println("\n===== jdbc allMessages (position-partitioned, filter pushdown) =====")
      val dir = java.nio.file.Files.createTempDirectory("graft-audit-jdbc").toString
      val store = new graft.store.JdbcStreamStore(spark, s"jdbc:derby:$dir/db;create=true")
      (0 until 4).foreach { b =>
        val ms = (0 until 50).map(i => graft.core.NewStreamMessage(
          f"00000000-0000-0000-0000-${b * 50 + i}%012d", "t", "{}"))
        store.appendToStream(s"s-$b", graft.core.ExpectedVersion.Any, ms)
      }
      val filtered = store.allMessages(numPartitions = 4).filter("position >= 100")
      filtered.collect()
      val jplan = filtered.queryExecution.executedPlan.toString()
      filtered.explain("formatted")
      val parts = "numPartitions=(\\d+)".r.findFirstMatchIn(jplan).map(_.group(1)).getOrElse("?")
      val pushedPos = jplan.contains("POSITION") && jplan.contains("PushedFilters")
      println(s"[audit] jdbc_allMessages jdbcPartitions=$parts positionFilterPushedToDb=$pushedPos")
      store.close()

      println("\n===== parquet streamsDF (journal-backed streams relation) =====")
      val pdir = java.nio.file.Files.createTempDirectory("graft-audit-streams").toString
      val pstore = new graft.store.SparkStreamStore(spark, pdir)
      (0 until 100).foreach(i => pstore.appendToStream(f"s-$i%03d",
        graft.core.ExpectedVersion.Any,
        Seq(graft.core.NewStreamMessage(f"00000000-0000-0000-0000-$i%012d", "t", "{}"))))
      val sdf = pstore.streamsDF.filter("streamId like 's-00%'")
      sdf.collect()
      sdf.explain("formatted")
      println(s"[audit] streamsDF rows=${sdf.count()}")
      pstore.close()
    }
    spark.stop()
  }
}
