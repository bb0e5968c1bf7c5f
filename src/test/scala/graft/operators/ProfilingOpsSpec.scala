package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the profiling/association family:
  * functional-dependency audit, order-dependency audit, Spearman rank
  * correlation, collocation screen, seasonal outliers. */
class ProfilingOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("fdAudit: violating keys, fan-out, and a certified dependency") {
    val df = Seq(("k1", "a"), ("k1", "a"), ("k1", "b"), ("k2", "c"))
      .toDF("x", "y")
    val out = Validation.fdAudit(df, Seq(("x", "y"), ("y", "x")))
      .orderBy("lhs").collect()
    // x → y: k1 maps to {a, b} — broken with fan-out 2
    assert(out(0).toSeq === Seq("x", "y", 2L, 1L, 2L, 4L))
    // y → x: every y value maps to exactly one x — certified
    assert(out(1).toSeq === Seq("y", "x", 3L, 0L, 1L, 4L))
  }

  test("orderAudit: inversions counted per partition, null-vacuous") {
    val df = Seq(
      ("g1", 1, Some(10)), ("g1", 2, Some(5)), ("g1", 3, Some(7)),
      ("g2", 1, Some(1)), ("g2", 2, Some(2)),
      ("g3", 1, None), ("g3", 2, Some(3))) // prev null → pair not checked
      .toDF("g", "i", "v")
    val out = Validation.orderAudit(df, "r", Seq("g"), Seq("i"), "v").collect()
    assert(out.head.toSeq === Seq("r", 3L, 1L)) // only 5<10 violates
  }

  test("spearmanCorr: perfect monotone association is num = denx = deny") {
    val df = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0))
      .toDF("g", "x", "y")
    val r = Stats.spearmanCorr(df, "g", "x", "y").collect().head
    assert(r.getLong(1) === 3L)
    val Seq(num, dx, dy) = Seq(2, 3, 4).map(i => r.getDecimal(i).longValueExact())
    assert(num === 24L && dx === 24L && dy === 24L) // rho = 1
  }

  test("spearmanCorr: reversal flips the sign; ties take doubled midranks") {
    val rev = Seq(("g", 1.0, 6.0), ("g", 2.0, 4.0), ("g", 3.0, 2.0))
      .toDF("g", "x", "y")
    val r = Stats.spearmanCorr(rev, "g", "x", "y").collect().head
    assert(r.getDecimal(2).longValueExact() === -24L) // rho = -1
    // x ties: [1,1,2] → doubled midranks [3,3,6] (2·midrank stays integer)
    val tied = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0), ("g", 2.0, 3.0))
      .toDF("g", "x", "y")
    val rt = Stats.spearmanCorr(tied, "g", "x", "y").collect().head
    // u=[3,3,6], v=[2,4,6]: num = 3·(6+12+36) − 12·12 = 18
    // denx = 3·54 − 144 = 18, deny = 3·56 − 144 = 24
    assert(rt.getDecimal(2).longValueExact() === 18L)
    assert(rt.getDecimal(3).longValueExact() === 18L)
    assert(rt.getDecimal(4).longValueExact() === 24L)
  }

  test("collocations: integer-percent lift screen over adjacent pairs") {
    val docs = (Seq.fill(5)("a b") ++ Seq.fill(5)("c d") ++ Seq.fill(2)("a d"))
      .toDF("text")
    val out = TextCorpus.collocations(docs, minCount = 5L, minLiftPct = 130L)
      .orderBy("w1").collect()
    // total=12; (a,b): 100·5·12 = 6000 ≥ 130·7·5 = 4550 ✓ (lift 1.71)
    // (a,d): pair_n 2 < minCount ✗; (c,d): symmetric ✓
    assert(out.map(_.toSeq).toSeq === Seq(
      Seq("a", "b", 5L, 7L, 5L, 12L),
      Seq("c", "d", 5L, 5L, 7L, 12L)))
  }

  test("collocations: sub-threshold lift is screened out") {
    // (a,b) IS the whole corpus → lift exactly 1.0 < 1.3
    val docs = Seq.fill(6)("a b").toDF("text")
    assert(TextCorpus.collocations(docs, 5L, 130L).count() === 0L)
  }

  test("seasonalOutliers agrees with a brute-force reimplementation") {
    // deterministic pseudo-noise + one spiked day and one crashed day
    def cnt(day: Int): Int = {
      val noise = (day * 2654435761L % 3).toInt // 0..2
      if (day == 21) 40 else if (day == 30) 1 else 4 + noise
    }
    val events = (1 to 49).flatMap { d =>
      val t = java.sql.Timestamp.valueOf(f"2024-03-01 00:00:00")
      val ts = new java.sql.Timestamp(t.getTime + (d - 1) * 86400000L)
      Seq.fill(cnt(d))(("a", ts))
    }.toDF("k", "t")
    val got = Stats.seasonalOutliers(events, "k", "t", madMultiple = 2L)
      .select("d", "detrended7", "med7", "abs_dev7", "mad7")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    // brute force in plain Scala
    val counts = (1 to 49).map(d => d -> cnt(d)).toMap
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val epoch0 = java.time.LocalDate.of(2024, 3, 1)
    val det = (4 to 46).map { d => // complete centered windows only
      val t7 = (d - 3 to d + 3).map(counts).sum
      val date = epoch0.plusDays(d - 1)
      val dow = java.lang.Math.floorMod(date.toEpochDay, 7L)
      (date.toString, dow, 7L * counts(d) - t7)
    }
    val med = det.groupBy { case (_, dow, _) => dow }
      .view.mapValues(v => lowerMedian(v.map(_._3))).toMap
    val dev = det.map { case (date, dow, x) => (date, dow, x, math.abs(x - med(dow))) }
    val mad = dev.groupBy(_._2).view.mapValues(v => lowerMedian(v.map(_._4))).toMap
    val want = dev.collect {
      case (date, dow, x, ad) if mad(dow) > 0 && ad >= 2L * mad(dow) =>
        (date, x, med(dow), ad, mad(dow))
    }.toSet
    assert(want.nonEmpty && got === want)
  }
}
