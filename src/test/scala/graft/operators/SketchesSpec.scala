package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Sketches]] HLL: integer register construction, the union law,
  * estimate accuracy vs exact distinct, and partition invariance (the
  * mergeable-summary contract the 100 TB story rests on). */
class SketchesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def regs(ids: Seq[Long], p: Int = 6) =
    Sketches.hllRegisters(ids.toDF("v"), col("v"), p)

  test("registers are deterministic and partition-invariant") {
    val ids = (1L to 500L) ++ (1L to 250L) // duplicates must not matter
    val a = regs(ids).collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val b = Sketches.hllRegisters(ids.toDF("v").repartition(13), col("v"), 6)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(a === b)
    assert(a.forall { case (bucket, rho) => bucket >= 0 && bucket < 64 && rho >= 1 && rho <= 55 })
  }

  test("duplicates do not change the sketch") {
    val once = regs((1L to 300L)).collect().toSet
    val dup = regs((1L to 300L) ++ (1L to 300L) ++ (100L to 200L)).collect().toSet
    assert(once === dup)
  }

  test("union law: merge of disjoint halves equals sketch of the whole") {
    val all = (1L to 1000L)
    val merged = Sketches.hllMerge(
      regs(all.filter(_ % 2 == 0)), regs(all.filter(_ % 2 == 1)))
    assert(merged.collect().toSet === regs(all).collect().toSet)
  }

  test("union law holds for overlapping inputs too") {
    val merged = Sketches.hllMerge(regs(1L to 700L), regs(300L to 1000L))
    assert(merged.collect().toSet === regs(1L to 1000L).collect().toSet)
  }

  test("state row: m, v_zero, and scaled harmonic sum are consistent") {
    val r = regs(1L to 400L)
    val row = Sketches.hllState(r, 6).head()
    val m = row.getLong(0); val vZero = row.getLong(1)
    val s = row.getDecimal(2)
    assert(m === 64L)
    assert(vZero === m - r.count())
    // every register contributes at least 2^0 and at most 2^55
    val lo = BigDecimal(vZero) * BigDecimal(2).pow(55)
    assert(BigDecimal(s) >= lo && BigDecimal(s) <= BigDecimal(m) * BigDecimal(2).pow(55))
  }

  test("estimate lands within theoretical error of exact distinct") {
    // p=8 → m=256 → relative std error ≈ 1.04/16 = 6.5%; assert 4σ
    for (n <- Seq(100L, 1000L, 5000L)) {
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters((1L to n).toDF("v"), col("v"), 8), 8)
        .head().getDouble(2)
      assert(math.abs(est - n) / n.toDouble < 0.26, s"n=$n est=$est")
    }
  }

  test("small-range correction: tiny cardinalities stay accurate") {
    for (n <- Seq(1L, 5L, 20L)) {
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters((1L to n).toDF("v"), col("v"), 8), 8)
        .head().getDouble(2)
      assert(math.abs(est - n) / n.toDouble < 0.25, s"n=$n est=$est")
    }
  }

  test("precision bounds are enforced") {
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(Seq(1L).toDF("v"), col("v"), 3)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(Seq(1L).toDF("v"), col("v"), 17)
    }
  }

  test("grouped registers equal per-group global sketches; grouped state matches") {
    val df = ((1L to 300L).map(v => ("a", v)) ++ (1L to 80L).map(v => ("b", v * 7)))
      .toDF("g", "v")
    val grouped = Sketches.hllRegistersBy(df, Seq("g"), col("v"), 6)
    Seq("a", "b").foreach { g =>
      val expect = Sketches.hllRegisters(df.filter(col("g") === g), col("v"), 6)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val got = grouped.filter(col("g") === g)
        .select("bucket", "rho").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got === expect, s"group $g")
    }
    val st = Sketches.hllStateBy(grouped, Seq("g"), 6)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Seq("a", "b").foreach { g =>
      val one = Sketches.hllState(
        Sketches.hllRegisters(df.filter(col("g") === g), col("v"), 6), 6).head()
      assert(st(g) === ((one.getLong(0), one.getLong(1))), s"state for $g")
    }
  }

  // ---- count-min sketch ----------------------------------------------

  private def cms(vals: Seq[String], d: Int = 3, w: Int = 16) =
    Sketches.cmsCounters(vals.toDF("v"), col("v"), d, w)

  test("cms counters: total per hash row equals input size; partition invariant") {
    val vals = (1 to 200).map(i => s"k${i % 37}")
    val c = cms(vals)
    val perRow = c.groupBy("hash_row").agg(sum("cnt").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow === Map(0 -> 200L, 1 -> 200L, 2 -> 200L))
    val repart = Sketches.cmsCounters(vals.toDF("v").repartition(7), col("v"), 3, 16)
    assert(c.collect().toSet === repart.collect().toSet)
  }

  test("cms estimate is never below the true count and never above N") {
    val vals = (1 to 300).map(i => s"k${i % 23}") // k0..k22, ~13 each
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val keys = truth.keys.toSeq.toDF("key")
    val est = Sketches.cmsEstimate(cms(vals), keys, 3, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k underestimated: ${est(k)} < $n")
      assert(est(k) <= vals.size, s"$k above N")
    }
  }

  test("cms estimate is exact when the width dwarfs the key count") {
    val vals = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val est = Sketches.cmsEstimate(
        Sketches.cmsCounters(vals.toDF("v"), col("v"), 4, 4096),
        Seq("a", "b", "c", "absent").toDF("key"), 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 5L, "b" -> 3L, "c" -> 1L, "absent" -> 0L))
  }

  test("cms merge law: summed halves equal the sketch of the whole; duplicates add") {
    val vals = (1 to 400).map(i => s"u${i % 51}")
    val (even, odd) = vals.zipWithIndex.partition(_._2 % 2 == 0)
    val merged = Sketches.cmsMerge(cms(even.map(_._1)), cms(odd.map(_._1)))
    assert(merged.collect().toSet === cms(vals).collect().map(r =>
      org.apache.spark.sql.Row(r.getInt(0), r.getLong(1), r.getLong(2))).toSet)
    val doubled = Sketches.cmsMerge(cms(vals), cms(vals))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    cms(vals).collect().foreach { r =>
      assert(doubled((r.getInt(0), r.getLong(1))) === 2 * r.getLong(2))
    }
  }

  test("cms inner product never underestimates join size; exact at large width") {
    val left = (1 to 300).map(i => s"k${i % 29}")
    val right = (1 to 200).map(i => s"k${i % 31}")
    val truth = {
      val rc = right.groupBy(identity).view.mapValues(_.size.toLong).toMap
      left.map(k => rc.getOrElse(k, 0L)).sum
    }
    val est = Sketches.cmsInnerProduct(cms(left), cms(right))
      .head().getDecimal(0).longValueExact()
    assert(est >= truth, s"inner product underestimated: $est < $truth")
    // generous upper sanity bound: N_a * N_b
    assert(est <= 300L * 200L)
    val exact = Sketches.cmsInnerProduct(
      Sketches.cmsCounters(left.toDF("v"), col("v"), 3, 4096),
      Sketches.cmsCounters(right.toDF("v"), col("v"), 3, 4096))
      .head().getDecimal(0).longValueExact()
    assert(exact === truth, s"wide sketch should be exact: $exact vs $truth")
  }

  test("cms bounds are enforced") {
    intercept[IllegalArgumentException] {
      Sketches.cmsCounters(Seq("x").toDF("v"), col("v"), 0, 16)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsCounters(Seq("x").toDF("v"), col("v"), 3, 1)
    }
  }

  // ---- q-digest ------------------------------------------------------

  private def qd(vals: Seq[Long], logU: Int, k: Int) =
    Sketches.qdigestBuild(vals.toDF("v"), col("v"), logU, k)

  private def nodes(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("qdigest: total count preserved, size bounded, partition-invariant") {
    val vals = (0 until 5000).map(i => ((i.toLong * 2654435761L) % 1024).abs)
    val d = nodes(qd(vals, 10, 32))
    assert(d.map(_._3).sum === vals.size.toLong)
    // classic q-digest size bound: <= 3k surviving nodes (+ the root
    // path slack a single bottom-up pass can leave)
    assert(d.length <= 3 * 32 + 10, s"sketch too large: ${d.length} nodes")
    val d2 = nodes(Sketches.qdigestBuild(
      vals.toDF("v").repartition(7), col("v"), 10, 32))
    assert(d.toSet === d2.toSet)
  }

  test("qdigest rank bounds contain the true rank within L*thr; k>=n is exact") {
    val vals = (0 until 4000).map(i => ((i.toLong * 48271L) % 1000).abs)
    val L = 10; val k = 16
    val sk = qd(vals, L, k)
    val probes = Seq(1L, 7L, 100L, 512L, 999L).toDF("x")
    val thr = math.max(vals.size.toLong / k, 1L)
    Sketches.qdigestRanks(sk, probes).collect().foreach { r =>
      val x = r.getLong(0); val lo = r.getLong(1); val hi = r.getLong(2)
      val truth = vals.count(_ < x).toLong
      assert(lo <= truth && truth <= hi, s"rank($x)=$truth outside [$lo,$hi]")
      assert(hi - lo <= L.toLong * thr, s"uncertainty ${hi - lo} > L*thr")
    }
    // k >= n: thr = 1, nothing merges -> the sketch IS the histogram and
    // both bounds collapse onto the exact rank
    val exact = qd(vals, L, 2 * vals.size)
    Sketches.qdigestRanks(exact, probes).collect().foreach { r =>
      val truth = vals.count(_ < r.getLong(0)).toLong
      assert(r.getLong(1) === truth && r.getLong(2) === truth)
    }
  }

  test("qdigest merge: totals add, rank containment holds on the union") {
    val a = (0 until 2000).map(i => (i % 700).toLong)
    val b = (0 until 1500).map(i => ((i * 3) % 1000).toLong)
    val m = Sketches.qdigestMerge(qd(a, 10, 32), qd(b, 10, 32), 10, 32)
    assert(nodes(m).map(_._3).sum === (a.size + b.size).toLong)
    val all = a ++ b
    Sketches.qdigestRanks(m, Seq(10L, 500L, 900L).toDF("x"))
      .collect().foreach { r =>
        val truth = all.count(_ < r.getLong(0)).toLong
        assert(r.getLong(1) <= truth && truth <= r.getLong(2))
      }
  }

  test("qdigest: out-of-universe values are excluded by contract; bad args rejected") {
    val d = nodes(qd(Seq(5L, 1023L, 1024L, -1L), 10, 4))
    assert(d.map(_._3).sum === 2L) // 1024 and -1 fall outside [0, 2^10)
    intercept[IllegalArgumentException] {
      Sketches.qdigestBuild(Seq(1L).toDF("v"), col("v"), 0, 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.qdigestBuild(Seq(1L).toDF("v"), col("v"), 10, 0)
    }
  }

  test("qdigest: empty sketch answers rank 0 per probe; compact rejects out-of-universe nodes") {
    val empty = qd(Seq(2000L), 10, 4) // the only value falls outside [0, 2^10)? no - 2000 > 1023
    val ranks = Sketches.qdigestRanks(empty, Seq(5L, 100L).toDF("x"))
      .orderBy("x").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ranks.toSeq === Seq((5L, 0L, 0L), (100L, 0L, 0L)))
    val bad = Seq((0L, 5000L, 3L)).toDF("lvl", "idx", "cnt") // idx >= 2^10
    val e = intercept[org.apache.spark.SparkException] {
      Sketches.qdigestCompact(bad, 10, 4).collect()
    }
    assert(e.getMessage.contains("outside universe")
      || Option(e.getCause).exists(_.getMessage.contains("outside universe")))
  }

  test("qdigestBuildBy: each group's sketch equals an independent per-group build") {
    val rows = (0 until 3000).map(i => (s"g${i % 3}", ((i.toLong * 48271L) % 900).abs))
    val grouped = Sketches.qdigestBuildBy(
        rows.toDF("grp", "v"), "grp", col("v"), 10, 32)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    Seq("g0", "g1", "g2").foreach { g =>
      val solo = qd(rows.filter(_._1 == g).map(_._2), 10, 32)
        .collect().map(r => (g, r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(grouped(g).toSet === solo, s"group $g diverged from its solo build")
    }
  }

  test("qdigestRanksBy: per-group bounds match each group's solo qdigestRanks") {
    val rows = (0 until 3000).map(i => (s"g${i % 3}", ((i.toLong * 48271L) % 900).abs))
    val grouped = Sketches.qdigestBuildBy(
      rows.toDF("grp", "v"), "grp", col("v"), 10, 32)
    val xs = Seq(10L, 450L, 890L)
    val probes = Seq("g0", "g1", "g2", "ghost")
      .flatMap(g => xs.map(g -> _)).toDF("grp", "x")
    val got = Sketches.qdigestRanksBy(grouped, probes)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    Seq("g0", "g1", "g2").foreach { g =>
      val solo = Sketches.qdigestRanks(
          qd(rows.filter(_._1 == g).map(_._2), 10, 32), xs.toDF("x"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      xs.foreach { x =>
        assert(got((g, x)) === solo(x),
          s"group $g probe $x diverged from the solo digest — cross-group bleed?")
      }
    }
    // a group with no digest answers rank 0 (the empty-digest rule)
    xs.foreach(x => assert(got(("ghost", x)) === ((0L, 0L))))
  }

  test("qdigestRanksBy rejects an ungrouped digest frame loudly") {
    val sk = qd((1L to 100L), 10, 16)
    val e = intercept[IllegalArgumentException] {
      Sketches.qdigestRanksBy(sk, Seq(("g", 5L)).toDF("grp", "x"))
    }
    assert(e.getMessage.contains("grouped"))
  }

  test("kmv: estimate within 15% at k=512 over 20k distinct; sub-k sketch is exact") {
    val df = (1L to 20000L).map(_.toString).toDF("v")
    val est = Sketches.kmvEstimate(
        Sketches.kmvSketch(df, col("v"), 512), 512)
      .head()
    assert(est.getLong(0) === 512L)
    val e = est.getLong(2)
    assert(math.abs(e - 20000L) <= 3000L, s"estimate $e too far from 20000")
    // fewer distincts than k: the sketch IS the value set, count exact
    val small = Sketches.kmvEstimate(
      Sketches.kmvSketch((1L to 100L).map(_.toString).toDF("v"), col("v"), 512), 512)
    assert(small.head().getLong(2) === 100L)
  }

  test("kmv merge law: merge of split sketches equals the whole-table sketch exactly") {
    val all = (1L to 5000L).map(_.toString).toDF("v")
    val whole = Sketches.kmvSketch(all, col("v"), 256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val merged = Sketches.kmvMerge(
        Sketches.kmvSketch(all.filter(col("v").cast("long") % 2 === 0), col("v"), 256),
        Sketches.kmvSketch(all.filter(col("v").cast("long") % 2 === 1), col("v"), 256),
        256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(merged === whole, "KMV merge must be EXACTLY the union's sketch")
  }

  test("kmvSketchBy: each group equals its solo build; grouped merge law holds") {
    val rows = (1L to 3000L).map(i => (s"g${i % 3}", i.toString))
    val df = rows.toDF("grp", "v")
    val grouped = Sketches.kmvSketchBy(df, Seq("grp"), col("v"), 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    Seq("g0", "g1", "g2").foreach { g =>
      val solo = Sketches.kmvSketch(
          rows.filter(_._1 == g).map(_._2).toDF("v"), col("v"), 64)
        .collect().map(r => (g, r.getLong(0), r.getLong(1))).toSet
      assert(grouped(g).toSet === solo, s"group $g diverged from its solo sketch")
    }
    val merged = Sketches.kmvMergeBy(
        Sketches.kmvSketchBy(df.filter(col("v").cast("long") % 2 === 0),
          Seq("grp"), col("v"), 64),
        Sketches.kmvSketchBy(df.filter(col("v").cast("long") % 2 === 1),
          Seq("grp"), col("v"), 64),
        Seq("grp"), 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === grouped.values.flatten.toSet,
      "grouped merge must equal the from-scratch grouped build")
  }

  test("kmv intersect: overlap estimate tracks truth; disjoint sets answer 0") {
    // A = 1..12000, B = 8001..20000 → |A∩B| = 4000 of 20000
    val a = Sketches.kmvSketch((1L to 12000L).map(_.toString).toDF("v"), col("v"), 512)
    val b = Sketches.kmvSketch((8001L to 20000L).map(_.toString).toDF("v"), col("v"), 512)
    val est = Sketches.kmvIntersect(a, b).head().getLong(2)
    assert(math.abs(est - 4000L) <= 1500L, s"intersection estimate $est vs truth 4000")
    val disjoint = Sketches.kmvIntersect(
      Sketches.kmvSketch((1L to 500L).map("x" + _).toDF("v"), col("v"), 64),
      Sketches.kmvSketch((1L to 500L).map("y" + _).toDF("v"), col("v"), 64))
    val row = disjoint.head()
    assert(row.getLong(0) === 0L && row.getLong(2) === 0L,
      "disjoint sets must answer one row of zeros, not no row")
  }

  test("cms inner product: disjoint sketches estimate 0, never NULL or an overestimate") {
    val a = Sketches.cmsCounters(Seq("a1", "a2", "a3").toDF("v"), col("v"), 3, 4096)
    val b = Sketches.cmsCounters(Seq("b1", "b2").toDF("v"), col("v"), 3, 4096)
    // wide sketch -> no accidental collisions: true join size is 0
    val est = Sketches.cmsInnerProduct(a, b).head()
    assert(!est.isNullAt(0), "disjoint estimate must be 0, not NULL")
    assert(est.getDecimal(0).longValueExact() === 0L)
  }

  test("hllMergeBy merges grouped register tables per group, preserving the key") {
    val rows = (1L to 600L).map(i => (s"s${i % 3}", i))
    val (day1, day2) = rows.partition(_._2 % 2 == 0)
    def regs(xs: Seq[(String, Long)]) =
      Sketches.hllRegistersBy(xs.toDF("src", "v"), Seq("src"), col("v"), 6)
    val merged = Sketches.hllMergeBy(regs(day1), regs(day2), Seq("src"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val whole = regs(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(merged === whole)
    assert(merged.map(_._1) === Set("s0", "s1", "s2"))
  }

  test("weighted qdigest: mass = weights, weighted rank bounds contain the truth") {
    val rows = (0 until 800).map(i => (((i * 37) % 512).toLong, (i % 5 + 1).toLong))
    val sk = Sketches.qdigestBuildWeighted(
      rows.toDF("v", "w"), col("v"), col("w"), 10, 16)
    val totalMass = rows.map(_._2).sum
    assert(nodes(sk).map(_._3).sum === totalMass)
    Sketches.qdigestRanks(sk, Seq(100L, 300L).toDF("x")).collect().foreach { r =>
      val truth = rows.filter(_._1 < r.getLong(0)).map(_._2).sum
      assert(r.getLong(1) <= truth && truth <= r.getLong(2))
    }
    // weight 1 everywhere degenerates to the unweighted build
    val w1 = Sketches.qdigestBuildWeighted(
      rows.toDF("v", "w"), col("v"), lit(1L), 10, 16)
    assert(nodes(w1).toSet === nodes(qd(rows.map(_._1), 10, 16)).toSet)
    // non-positive weights are excluded by contract
    val neg = Sketches.qdigestBuildWeighted(
      Seq((5L, -3L), (5L, 2L)).toDF("v", "w"), col("v"), col("w"), 10, 4)
    assert(nodes(neg).map(_._3).sum === 2L)
  }

  test("kmv: NULL values are not set members and never occupy a rank (r15 advice)") {
    val rows = (Seq(Some("a"), None, Some("b"), None, Some("c")): Seq[Option[String]])
      .toDF("v")
    val sk = Sketches.kmvSketch(rows, col("v"), 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // sub-k sketch is the exact set: 3 non-null distinct values — a
    // NULL hash must not claim rank 1 and inflate the exact count
    assert(sk.length === 3)
    val clean = Sketches.kmvSketch(
      Seq("a", "b", "c").toDF("v"), col("v"), 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sk.sorted === clean.sorted)
    // grouped variant: a group whose values are ALL NULL contributes
    // no sketch rows at all
    val grouped = Sketches.kmvSketchBy(
      (Seq(("g1", Some("x")), ("g1", None), ("g2", None)): Seq[(String, Option[String])])
        .toDF("g", "v"),
      Seq("g"), col("v"), 8).collect()
    assert(grouped.map(_.getString(0)).toSet === Set("g1"))
    assert(grouped.length === 1)
  }
}
