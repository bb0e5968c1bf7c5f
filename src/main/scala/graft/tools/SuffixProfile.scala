package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement aid (guide §1): times the sub-stages of the
  * `suffix_big_doc` bench scenario — positions build, seed rank pass,
  * per-round blocked lead-window + rank pass, span tail — by mirroring
  * [[graft.operators.SuffixDedup.suffixRanks]]' internals with explicit
  * materialization boundaries, and prints the lead-window stage's
  * formatted plan (the checkpoint boundary hides it from the final
  * query's explain). NOT part of any declared query; exists so skew
  * fixes are driven by numbers instead of guesses.
  *
  * Run: `sbt "runMain graft.tools.SuffixProfile [sfDir]"`.
  */
object SuffixProfile {
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

    def time[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    val big = spark.range(1).select(
      lit(-1L).as("doc_id"),
      expr("array_join(transform(sequence(1, 32768), " +
        "i -> md5(concat('graft-big-doc-', i))), '')").as("text"))
    val copied = big.select(lit(-2L).as("doc_id"),
      expr("substring(text, 100001, 50000)").as("text"))
    val corpus = docs.unionByName(big).unionByName(copied)
      .localCheckpoint()

    val prefixLen = 50
    val w = 8
    // ---- positions build (mirrors suffixRanks) ----
    val positions = time("positions+checkpoint") {
      corpus
        .select(col("doc_id"),
          length(col("text")).cast("long").as("len"),
          expr("filter(split(text, ''), c -> c <> '')").as("_cs"))
        .filter(col("len") >= 1L)
        .select(col("doc_id"), col("len"),
          explode(expr("sequence(1L, len)")).as("pos"), col("_cs"))
        .select(col("doc_id"), col("len"), col("pos"),
          array_join(slice(col("_cs"), col("pos").cast("int"), lit(w)), "").as("g"))
        .localCheckpoint()
    }

    // mirrors the r17 denseRankOver: rank inside the pinned pass,
    // offsets from max(local dense rank) per slice
    def denseRankOver(frame: DataFrame, keyCols: Seq[String], tag: String): DataFrame = {
      val parts =
        math.max(frame.sparkSession.sessionState.conf.numShufflePartitions, 1)
      val lw = Window.partitionBy("_pid").orderBy(keyCols.map(col): _*)
      val ranked = time(s"rank[$tag]: range+rank+ckpt") {
        frame
          .repartitionByRange(parts, keyCols.map(col): _*)
          .withColumn("_pid", spark_partition_id())
          .withColumn("_ldr", dense_rank().over(lw).cast("long"))
          .select("doc_id", "len", "pos", "_pid", "_ldr")
          .localCheckpoint()
      }
      val offsets = ranked.groupBy("_pid").agg(max("_ldr").as("_ptot"))
        .withColumn("_off", coalesce(sum("_ptot").over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select("_pid", "_off")
      time(s"rank[$tag]: offsets+join+ckpt") {
        ranked
          .join(broadcast(offsets), Seq("_pid"))
          .select(col("doc_id"), col("len"), col("pos"),
            (col("_off") + col("_ldr")).as("rank"))
          .localCheckpoint()
      }
    }

    var ranks = denseRankOver(positions, Seq("g"), "seed")
    var k = w
    var round = 0
    val leadBlockShift = 15
    val leadBlock = 1L << leadBlockShift
    while (k < prefixLen) {
      round += 1
      val fanin = 8
      val target = math.min(prefixLen, k * fanin)
      val offs = ((k until (target - k) by k) :+ (target - k))
        .distinct.filter(_ > 0)
      val maxOff = offs.max.toLong
      val ownBlkI = shiftright(col("pos") - 1L, leadBlockShift)
      val blocked = ranks.withColumn("_blk", explode(
        when(ownBlkI > 0L && pmod(col("pos") - 1L, lit(leadBlock)) < maxOff,
          array(ownBlkI, ownBlkI - 1L))
          .otherwise(array(ownBlkI))))
      val wBlk = Window.partitionBy("doc_id", "_blk").orderBy("pos")
      val leadCols = offs.zipWithIndex.map { case (o, i) =>
        coalesce(lead(col("rank"), o).over(wBlk), lit(-1L)).as(s"_r${i + 1}")
      }
      val pairedPlan = blocked.select(
        (Seq(col("doc_id"), col("len"), col("pos"), col("rank"),
          col("_blk")) ++ leadCols): _*)
        .filter(col("_blk") === ownBlkI)
        .drop("_blk")
      if (round == 1) {
        println(s"===== lead-window stage plan (round 1, blocked) =====")
        pairedPlan.explain("formatted")
      }
      val paired = time(s"round$round: lead-window+ckpt") {
        pairedPlan.localCheckpoint()
      }
      val keyCols = "rank" +: offs.indices.map(i => s"_r${i + 1}")
      ranks = denseRankOver(paired, keyCols, s"round$round")
      k = target
    }

    // ---- span tail (mirrors duplicatedSpans) ----
    time("span-tail (full)") {
      val r = ranks.filter(col("pos") <= col("len") - lit(prefixLen.toLong) + 1L)
      val marked = r
        .withColumn("_n_occ", count(lit(1)).over(Window.partitionBy("rank")))
        .filter(col("_n_occ") >= 2L)
        .select("doc_id", "pos")
      val wd = Window.partitionBy("doc_id").orderBy("pos")
      marked
        .withColumn("_grp", col("pos") - row_number().over(wd).cast("long"))
        .groupBy("doc_id", "_grp")
        .agg(min("pos").as("span_start"),
          (max("pos") + lit(prefixLen.toLong) - 1L).as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1L).as("span_len"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
