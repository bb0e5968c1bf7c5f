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

  test("indAudit: distinct-value containment, 0 missing certifies") {
    val lhs = Seq(1, 2, 3, 3, 3).toDF("a")
    val rhs = Seq(2, 3, 4).toDF("b")
    val out = Validation.indAudit("c", lhs, "a", rhs, "b").collect().head
    assert(out.toSeq === Seq("c", 3L, 1L)) // value 1 missing; dups don't count
    val ok = Validation.indAudit("ok", rhs, "b", Seq(2, 3, 4, 5).toDF("b"), "b")
      .collect().head
    assert(ok.toSeq === Seq("ok", 3L, 0L))
  }

  test("tClosenessClasses: ordered EMD as exact integers, dense grid") {
    // class A: v=[0,0,1]; class B: v=[1,1,1]; global: {0:2, 1:4}, m=2
    // gpref=(2,6); A cpref=(2,3): |6·2−3·2| + |6·3−3·6| = 6
    //             B cpref=(0,3): |0−3·2| + |18−18| = 6
    // EMD = 6 / (3·6·1) = 1/3 for both classes
    val df = Seq(("A", 0L), ("A", 0L), ("A", 1L),
      ("B", 1L), ("B", 1L), ("B", 1L)).toDF("q", "v")
    val at3 = Pii.tClosenessClasses(df, Seq("q"), "v", tNum = 1L, tDen = 3L)
      .orderBy("q").collect()
    assert(at3.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDecimal(4).longValueExact(), r.getBoolean(5))).toSeq ===
      Seq(("A", 3L, 2L, 6L, 6L, true), ("B", 3L, 2L, 6L, 6L, true)))
    // t = 1/4 < 1/3 → both fail: 6·4 = 24 > 1·3·6·1 = 18
    val at4 = Pii.tClosenessClasses(df, Seq("q"), "v", tNum = 1L, tDen = 4L)
      .collect()
    assert(at4.forall(!_.getBoolean(5)))
  }

  test("tClosenessClasses: the global distribution itself is 0-distant") {
    val df = Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L)).toDF("q", "v")
    val out = Pii.tClosenessClasses(df, Seq("q"), "v", 0L, 1L).collect()
    // each class mirrors the global 50/50 split exactly → emd 0, close
    // even at t = 0
    assert(out.forall(r => r.getDecimal(4).longValueExact() == 0L && r.getBoolean(5)))
  }

  test("syncDiff: identical tables diff empty; a mutation isolates its bucket") {
    val a = Seq((0L, "x"), (1L, "y"), (2L, "z"), (8L, "w")).toDF("k", "p")
    assert(Validation.syncDiff(a, a, "k", Seq("p"), 8).count() === 0L)
    // mutate key 1 → only bucket 1 differs, counts equal
    val b = Seq((0L, "x"), (1L, "Y"), (2L, "z"), (8L, "w")).toDF("k", "p")
    val d = Validation.syncDiff(a, b, "k", Seq("p"), 8).collect()
    assert(d.map(_.getLong(0)).toSeq === Seq(1L))
    assert(d.head.getAs[Long]("n_rows_a") === 1L)
    assert(d.head.getAs[Long]("n_rows_b") === 1L)
    assert(d.head.getAs[Long]("digest_a") !== d.head.getAs[Long]("digest_b"))
    // delete key 8 → bucket 0 loses a row (keys 0 and 8 share bucket 0)
    val c = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("k", "p")
    val d2 = Validation.syncDiff(a, c, "k", Seq("p"), 8).collect()
    assert(d2.map(r => (r.getLong(0), r.getAs[Long]("n_rows_a"),
      r.getAs[Long]("n_rows_b"))).toSeq === Seq((0L, 2L, 1L)))
  }

  test("syncDigest: digest is order-independent and separator-unambiguous") {
    val fwd = Seq((0L, "a", "b"), (8L, "c", "d")).toDF("k", "p", "q")
    val rev = Seq((8L, "c", "d"), (0L, "a", "b")).toDF("k", "p", "q")
    val df1 = Validation.syncDigest(fwd, "k", Seq("p", "q"), 4).collect()
    val df2 = Validation.syncDigest(rev, "k", Seq("p", "q"), 4).collect()
    assert(df1.map(_.toSeq).toSet === df2.map(_.toSeq).toSet)
    // ("ab", "") vs ("a", "b") must hash differently (the \u0001 separator)
    val x = Seq((0L, "ab", "")).toDF("k", "p", "q")
    val y = Seq((0L, "a", "b")).toDF("k", "p", "q")
    assert(Validation.syncDiff(x, y, "k", Seq("p", "q"), 4).count() === 1L)
    // (null, "x") vs ("x", null) must hash differently: concat_ws SKIPS
    // null fields, so without the \u0000 sentinel an integrity checker
    // would call these two replicas identical — the one failure it
    // cannot have
    val nx = Seq((0L, Option.empty[String], Option("x"))).toDF("k", "p", "q")
    val xn = Seq((0L, Option("x"), Option.empty[String])).toDF("k", "p", "q")
    assert(Validation.syncDiff(nx, xn, "k", Seq("p", "q"), 4).count() === 1L)
    // and a null is not the empty string either
    val ne = Seq((0L, Option.empty[String], Option("x"))).toDF("k", "p", "q")
    val ee = Seq((0L, Option(""), Option("x"))).toDF("k", "p", "q")
    assert(Validation.syncDiff(ne, ee, "k", Seq("p", "q"), 4).count() === 1L)
  }

  test("quantileAlign: proportional-rank mapping; the reference maps to itself") {
    val df = Seq(("R", 1L, 10L), ("R", 2L, 20L), ("R", 3L, 30L), ("R", 4L, 40L),
      ("S", 5L, 1L), ("S", 6L, 2L)).toDF("src", "id", "v")
    val out = Stats.quantileAlign(df, "src", "v", "id", "R")
      .orderBy("src", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("R", 1L, 10L, 10L), ("R", 2L, 20L, 20L), // identity on the reference
      ("R", 3L, 30L, 30L), ("R", 4L, 40L, 40L),
      // S: rank 1 of 2 → ref pos (0·4 div 2)+1 = 1 → 10; rank 2 → pos 3 → 30
      ("S", 5L, 1L, 10L), ("S", 6L, 2L, 30L)))
  }

  test("srmCheck: an emptied arm flags, a single unit cannot") {
    val ids = (0L until 100L).map(i => ("g", i)).toDF("g", "id")
    val full = Sampling.srmCheck(ids, "g", "id", "s", 1L, 1L).collect().head
    val nA = full.getAs[Long]("n_a")
    assert(nA > 9L && full.getAs[Long]("n_b") > 9L) // hash splits ~50/50
    assert(!full.getAs[Boolean]("srm")) // |dev| small for a fair split
    // differential loss: arm B vanishes entirely → certain flag
    val onlyA = ids.filter(Sampling.hashBucket(col("id"), "s", 2) < 1)
    val lossy = Sampling.srmCheck(onlyA, "g", "id", "s", 1L, 1L).collect().head
    assert(lossy.getAs[Long]("n_b") === 0L && lossy.getAs[Boolean]("srm"))
    // one unit is never significant: dev² = 1 ≤ 9n
    val one = Seq(("g", 1L), ("g", 1L)).toDF("g", "id")
    assert(!Sampling.srmCheck(one, "g", "id", "s", 1L, 1L)
      .collect().head.getAs[Boolean]("srm"))
  }

  test("linearAttribution: equal ppm split, remainder to latest, credit conserves") {
    // u1: 3 touches (v@1, c@2, v@3) before conv@10 → 333333 each,
    // remainder 1 to the LATEST (v@3); u2: no touches → (direct)
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "view"), (1L, 10L, "buy"),
      (2L, 5L, "buy"),
      (3L, 1L, "view"), (3L, 200L, "buy")) // touch outside lookback 100
      .toDF("id", "us", "typ")
    val out = Behavioral.linearAttribution(ev, "id", "us", "typ",
        Seq("view", "click"), "buy", lookbackMicros = 100L)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("(direct)", 0L, 2L, 2000000L), // u2 and u3 (touch too old)
      ("click", 1L, 1L, 333333L),
      ("view", 2L, 1L, 333333L + 333334L))) // latest view takes the remainder
    // conservation: total credit = 1e6 × conversions
    assert(out.map(_._4).sum === 3L * 1000000L)
  }

  test("survivalTable: lifetimes, right-censoring, n_risk suffix sums") {
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // horizon = day 10; censorDays 3 → last activity on day 8+ = censored
    val ev = Seq(
      (1L, d(1)), (1L, d(3)),   // lifetime 2, died (last seen day 3)
      (2L, d(1)), (2L, d(10)),  // lifetime 9, censored (active at horizon)
      (3L, d(1)),               // lifetime 0, died
      (4L, d(8)), (4L, d(9)))   // lifetime 1, censored; cohort week differs
      .toDF("id", "t")
    val out = Behavioral.survivalTable(ev, "id", "t", censorDays = 3)
      .orderBy("cohort_week", "t_day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val wk1 = Math.floorDiv(java.time.LocalDate.of(2024, 1, 1).toEpochDay, 7L)
    val wk2 = Math.floorDiv(java.time.LocalDate.of(2024, 1, 8).toEpochDay, 7L)
    assert(out.toSeq === Seq(
      (wk1, 0L, 3L, 1L, 0L), // users 1,2,3 at risk; u3 dies at t=0
      (wk1, 2L, 2L, 1L, 0L), // u1 dies at t=2
      (wk1, 9L, 1L, 0L, 1L), // u2 censored at t=9
      (wk2, 1L, 1L, 0L, 1L))) // u4 censored in its own cohort
  }

  test("activityStreaks: islands, longest vs current, dedup within a day") {
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 09:00:00")
    val ev = Seq(
      // u1: days 1,2,3 then 10,11 — longest 3, current 2
      (1L, d(1)), (1L, d(1)), (1L, d(2)), (1L, d(3)), (1L, d(10)), (1L, d(11)),
      // u2: one day only
      (2L, d(5))).toDF("id", "t")
    val out = graft.operators.Behavioral.activityStreaks(ev, "id", "t")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 5L, 2L, 3L, 2L), (2L, 1L, 1L, 1L, 1L)))
  }

  test("priceVolumeBridge: effects sum exactly to the revenue delta") {
    val df = Seq(
      ("A", "p0", 10L, 1000L), ("A", "p1", 15L, 1800L),
      ("B", "p0", 4L, 400L), ("B", "p1", 4L, 500L), // pure price move
      ("C", "p1", 7L, 700L)) // new segment: q0 = 0 → den 0
      .toDF("seg", "m", "qty", "rev")
    val out = graft.operators.Behavioral
      .priceVolumeBridge(df, "seg", "m", "qty", "rev", "p0", "p1")
      .orderBy("seg").collect()
    def longs(i: Int) = out.map(r => r.getDecimal(i).longValueExact())
    val (vol, price) = (longs(5), longs(6))
    // A: vol = 5·1000 = 5000, price = 1800·10 − 15·1000 = 3000; /q0=10 →
    //    500 + 300 = 800 = Δrev ✓  B: vol 0, price 400 ✓ (den 4)
    assert(vol.toSeq === Seq(5000L, 0L, 0L))
    assert(price.toSeq === Seq(3000L, 400L, 0L))
    // conservation: (vol+price)/den = rev1 − rev0 where den > 0
    out.foreach { r =>
      val den = r.getLong(7)
      if (den > 0) {
        val lhs = r.getDecimal(5).longValueExact() + r.getDecimal(6).longValueExact()
        assert(lhs === (r.getLong(4) - r.getLong(3)) * den)
      }
    }
  }

  test("recsHoldoutEval: train-only co-occurrence, owned items excluded, exact hits") {
    val tx = Seq(
      // train baskets: (1,2)×2 co-occurrence, (1,3)×1
      (10L, 1L, 1L, false), (10L, 1L, 2L, false),
      (20L, 2L, 1L, false), (20L, 2L, 2L, false),
      (30L, 3L, 1L, false), (30L, 3L, 3L, false),
      // test: u1 buys 3 (a hit), u2 buys 4 (miss), u5 is test-only
      (40L, 1L, 3L, true), (50L, 2L, 4L, true), (60L, 5L, 1L, true))
      .toDF("basket", "u", "i", "is_test")
    val out = Baskets.recsHoldoutEval(tx, "basket", "u", "i", "is_test",
      k = 2, minCo = 1L).collect().head
    // u1/u2 each get rec [3] (only unowned candidate), u3 gets [2];
    // u1's test purchase of 3 is the single hit
    assert(out.toSeq === Seq(3L, 3L, 1L, 3L, 3L))
  }

  test("maintainJoin: delta algebra equals the full recompute, as a multiset") {
    val a0 = Seq((1, "x"), (2, "y")).toDF("k", "av")
    val dA = Seq((3, "z"), (1, "x2")).toDF("k", "av") // a second row for key 1
    val b0 = Seq((1, "p"), (3, "q")).toDF("k", "bv")
    val dB = Seq((2, "r"), (1, "p2")).toDF("k", "bv")
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val got = Merge.maintainJoin(a0.join(b0, Seq("k")), a0, dA, b0, dB, Seq("k"))
    val want = a0.union(dA).join(b0.union(dB), Seq("k"))
    // key 1: 2 A-rows × 2 B-rows = 4; keys 2 and 3: 1 each → 6 rows
    assert(bag(got) === bag(want) && got.count() === 6)
  }

  test("weightedMedian: first element where cumulative weight reaches half") {
    val df = Seq(("g", 1.0, 1L, 1L), ("g", 2.0, 2L, 2L), ("g", 3.0, 1L, 3L),
      ("h", 1.0, 1L, 4L), ("h", 5.0, 9L, 5L)).toDF("g", "v", "w", "id")
    val out = Stats.weightedMedian(df, "g", "v", "w", Seq("id"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    // g: cum 1,3,4 over tot 4 → first 2·cum ≥ 4 is v=2 (cum 3)
    // h: the heavy tail owns the median → v=5
    assert(out.toSeq === Seq(("g", 2.0, 3L, 4L), ("h", 5.0, 10L, 10L)))
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
