package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Exact rank-based grouped quantiles against hand-computed fixtures. */
class StatsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("grouped quantiles pick the element at floor(p*(n-1))+1 per group") {
    val df = Seq(
      ("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("a", 50L),
      ("b", 7L) // single-row group: every p lands on rank 1
    ).toDF("g", "v")
    val out = Stats.groupedQuantiles(df, "g", "v", ps = Seq(0.0, 0.5, 0.95, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(3)).toMap
    // group a (n=5): ranks floor(p*4)+1 = 1, 3, 4, 5
    assert(out(("a", 0.0)) === 10L)
    assert(out(("a", 0.5)) === 30L)
    assert(out(("a", 0.95)) === 40L) // floor(3.8)+1 = 4
    assert(out(("a", 1.0)) === 50L)
    assert(Seq(0.0, 0.5, 0.95, 1.0).forall(p => out(("b", p)) === 7L))
  }

  test("ties resolve to the same value whatever the sort permutation") {
    val df = Seq.fill(4)(("g", 5L)).toDF("g", "v") // all equal
    val out = Stats.groupedQuantiles(df.repartition(3), "g", "v", ps = Seq(0.5))
      .collect()
    assert(out.length === 1 && out.head.getLong(3) === 5L)
  }

  test("ksDrift matches a hand-computed two-sample KS on a tiny fixture") {
    // a: {1,2,3}  rest(b): {3,4,5}; ECDF gap peaks at v=2 and v=3:
    // |2*3 - 0*3| = 6 at v=2, |3*3 - 1*3| = 6 at v=3 → ks = 6/9
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 3L), ("b", 4L), ("b", 5L)).toDF("src", "v")
    val out = Stats.ksDrift(df, "src", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out("a") === ((3L, 3L, 6L, 9L, 666666L)))
    assert(out("b") === ((3L, 3L, 6L, 9L, 666666L))) // symmetric: 2 groups
  }

  test("ksDrift of an identical-distribution group is zero, disjoint is max") {
    val same = Seq.tabulate(40)(i => (if (i % 2 == 0) "x" else "y", (i / 2).toLong))
    val sOut = Stats.ksDrift(same.toDF("g", "v"), "g", "v").collect()
    assert(sOut.forall(_.getLong(3) == 0L)) // ks_num = 0
    val disjoint = (Seq.tabulate(5)(i => ("lo", i.toLong)) ++
      Seq.tabulate(7)(i => ("hi", 100L + i))).toDF("g", "v")
    val dOut = Stats.ksDrift(disjoint, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(dOut("lo") === ((35L, 35L))) // full separation: ks = 1 exactly
    assert(dOut("hi") === ((35L, 35L)))
  }

  test("madOutliers flags exactly the values beyond k MADs of the lower median") {
    // odd n: med=14, devs sorted 0,2,2,4,86 → mad=2, flag dev>6 → only 100
    val odd = Seq((1L, 10L), (2L, 12L), (3L, 14L), (4L, 16L), (5L, 100L))
      .map { case (i, v) => ("g", i, v) }.toDF("src", "id", "v")
    val oOut = Stats.madOutliers(odd, "src", "id", "v").collect()
    assert(oOut.map(_.getLong(1)).toSet === Set(5L))
    assert(oOut.head.getLong(3) === 14L && oOut.head.getLong(4) === 2L)
    // even n: lower median at rank (n+1) div 2 = 2 → med=2, mad=1, flag 98
    val even = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 100L))
      .map { case (i, v) => ("g", i, v) }.toDF("src", "id", "v")
    assert(Stats.madOutliers(even, "src", "id", "v")
      .collect().map(_.getLong(1)).toSet === Set(4L))
    // mad = 0 (over half identical): ANY deviation flags
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 9L))
      .map { case (i, v) => ("g", i, v) }.toDF("src", "id", "v")
    assert(Stats.madOutliers(flat, "src", "id", "v")
      .collect().map(_.getLong(1)).toSet === Set(4L))
  }

  test("profile counts rows, nulls, distincts, and renders min/max per column") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None), (None, Some("a")),
      (Some(3L), Some("c")), (None, None))
      .toDF("num", "str")
    val out = Stats.profile(df, Seq("num", "str")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(out("num") === ((5L, 2L, 2L, "1", "3")))
    assert(out("str") === ((5L, 2L, 3L, "a", "c")))
  }

  test("ksDrift is invariant to input partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300)(i =>
      (s"s${i % 3}", (rnd.nextInt(30) + (i % 3) * 5).toLong))
    val a = Stats.ksDrift(rows.toDF("g", "v"), "g", "v")
      .orderBy("g").collect().toSeq
    val b = Stats.ksDrift(rows.toDF("g", "v").repartition(13), "g", "v")
      .orderBy("g").collect().toSeq
    assert(a === b)
  }

  test("corrMatrix: exact ±1 on linearly dependent columns, 0 on constant-free orthogonal") {
    val df = Seq(
      (1.0, 2.0, 3.0),
      (2.0, 4.0, 2.0),
      (3.0, 6.0, 1.0)
    ).toDF("x", "y2x", "zneg")
    val out = Stats.corrMatrix(df, Seq("x", "y2x", "zneg"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out(("x", "y2x")) - 1.0) < 1e-9)
    assert(math.abs(out(("x", "zneg")) + 1.0) < 1e-9)
    assert(math.abs(out(("y2x", "zneg")) + 1.0) < 1e-9)
  }

  test("corrMatrix matches a hand-computed Pearson r on an uncorrelated-ish fixture") {
    // x = (1,2,3,4), w = (1,3,2,4): r = 0.8 exactly
    val df = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0)).toDF("x", "w")
    val r = Stats.corrMatrix(df, Seq("x", "w")).collect().head.getDouble(2)
    assert(math.abs(r - 0.8) < 1e-9)
  }

  test("corrMatrix survives moment magnitudes past 2^53 via the common downscale") {
    // values ~1e6 over 4k rows: Σx² in centi-units ~ 4e3·1e16 = 4e19 ≫ 2^53
    val rows = Seq.tabulate(4000)(i => (i * 997.25, i * 1994.5 + 3.0))
    val r = Stats.corrMatrix(rows.toDF("big", "affine"), Seq("big", "affine"))
      .collect().head.getDouble(2)
    assert(math.abs(r - 1.0) < 1e-6)
  }

  test("winsorize clips into the [pLo, pHi] rank-band of the row's own group") {
    val df = Seq(
      ("a", 1L, 0L), ("a", 2L, 10L), ("a", 3L, 20L), ("a", 4L, 30L),
      ("a", 5L, 40L), ("a", 6L, 50L), ("a", 7L, 60L), ("a", 8L, 70L),
      ("a", 9L, 80L), ("a", 10L, 90L), ("a", 11L, 1000L),
      ("b", 12L, 5L)
    ).toDF("g", "id", "v")
    // group a: n=11, p10 rank = floor(0.1*10)+1 = 2 -> 10; p90 rank =
    // floor(0.9*10)+1 = 10 -> 90: 0 clips up to 10, 1000 clips down to 90
    val out = Stats.winsorize(df, "g", "id", "v", 0.1, 0.9)
      .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(out(1L) === 10L)
    assert(out(11L) === 90L)
    assert(out(5L) === 40L)
    // single-row group: lo = hi = the value; nothing moves
    assert(out(12L) === 5L)
  }

  test("equiWidthHistogram buckets cover the range; counts sum to the input") {
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val out = Stats.equiWidthHistogram(df, "v", bins = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.keySet === (0L until 10L).toSet)
    assert(out.values.map(_._1).sum === 100L)
    assert(out(0L) === ((10L, 0.0, 9.0)))
    // the max value lands in the LAST bin, not a phantom bins-th bucket
    assert(out(9L)._3 === 99.0)
  }

  test("ewmaLastN weights the most recent value 1/2, next 1/4, normalized") {
    // one user, three events newest-first values 8, 4, 2:
    // ewma = (8/2 + 4/4 + 2/8) / (1 - 1/8) = 5.25 / 0.875 = 6.0
    val df = Seq((1L, 30L, 103L, 8.0), (1L, 20L, 102L, 4.0), (1L, 10L, 101L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Stats.ewmaLastN(df, "user_id", "ts", "event_id", "value", nMax = 8)
      .collect().head
    assert(out.getLong(1) === 3L)
    assert(out.getDouble(2) === 6.0)
  }

  test("rollingSumByTime sums the trailing window inclusive; ties are frame peers") {
    val df = Seq(
      (1L, 10L, 0L, 1.0), (1L, 11L, 50L, 2.0), (1L, 12L, 100L, 4.0),
      (1L, 13L, 100L, 8.0), // tie with id 12: both see both
      (1L, 14L, 200L, 16.0), // [100, 200] window: the two ties + itself
      (2L, 20L, 0L, 32.0))
      .toDF("k", "id", "ts", "v")
    val out = Stats.rollingSumByTime(df, "k", "id", "ts", "v", windowMicros = 100L)
      .collect().map(r => r.getLong(1) -> (r.getDouble(4), r.getLong(5))).toMap
    assert(out(10L) === ((1.0, 1L)))
    assert(out(11L) === ((3.0, 2L)))
    assert(out(12L) === ((15.0, 4L))) // 0,50,100,100 all within 100
    assert(out(13L) === ((15.0, 4L))) // tie peer: identical frame
    assert(out(14L) === ((28.0, 3L))) // [100, 200] → the two ties + itself
    assert(out(20L) === ((32.0, 1L))) // other key isolated
  }

  test("exactQuantilesBisect matches sorted-rank selection on random longs") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      // negatives, duplicates, wide spread — and a tight-range case
      val data =
        if (seed == 3) Seq.fill(500)(rnd.nextInt(20).toLong - 10L)
        else Seq.fill(500)(rnd.nextLong() % 1000000007L)
      val df = data.toDF("x")
      val ps = Seq(0.01, 0.5, 0.9, 1.0)
      // bitsPerRound = 8 forces several bisection rounds even on the
      // tight range
      val got = Stats.exactQuantilesBisect(df, "x", ps, bitsPerRound = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sorted = data.sorted
      ps.foreach { p =>
        val rank = math.ceil(p * data.length).toLong
        val want = sorted(rank.toInt - 1)
        assert(got(math.round(p * 1000000L)) === want, s"seed $seed p $p")
      }
      assert(got.size === ps.length)
    }
  }

  test("exactQuantilesBisect handles a single value and all-equal columns") {
    assert(Stats.exactQuantilesBisect(Seq(42L).toDF("x"), "x", Seq(0.5))
      .collect().head.getLong(1) === 42L)
    assert(Stats.exactQuantilesBisect(Seq.fill(100)(7L).toDF("x"), "x", Seq(0.01, 0.99))
      .collect().forall(_.getLong(1) === 7L))
  }

  test("ewmaLastN looks at only the last nMax events, ties broken by tieCol") {
    val df = ((1 to 10).map(i => (1L, i.toLong, i.toLong, 0.0)) :+
      (1L, 11L, 11L, 1.0)).toDF("user_id", "ts", "event_id", "value")
    val out = Stats.ewmaLastN(df, "user_id", "ts", "event_id", "value", nMax = 2)
      .collect().head
    // last two: values 1.0 (w=1/2) and 0.0 (w=1/4) → 0.5 / 0.75 = 2/3
    assert(out.getLong(1) === 2L)
    assert(math.abs(out.getDouble(2) - 2.0 / 3.0) < 1e-15)
  }

  test("chiSquareDrift: hand-computed exact terms incl. a category absent from one side") {
    // a = {x,x,x,y} (n_a=4), b = {x,y,y,z} (n_b=4):
    // x: (3*4-1*4)^2/(4*4*4) = 64/64 = 1        -> 1_000_000 ppm
    // y: (1*4-2*4)^2/(4*4*3) = 16/48 = 1/3      ->   333_333 ppm (floor)
    // z: (0*4-1*4)^2/(4*4*1) = 16/16 = 1        -> 1_000_000 ppm
    val a = Seq("x", "x", "x", "y").toDF("c")
    val b = Seq("x", "y", "y", "z").toDF("c")
    val out = Stats.chiSquareDrift(a, b, "c").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDecimal(3).longValueExact(), r.getDecimal(4).longValueExact(),
        r.getLong(5)))).toMap
    assert(out("x") === ((3L, 1L, 64L, 64L, 1000000L)))
    assert(out("y") === ((1L, 2L, 16L, 48L, 333333L)))
    assert(out("z") === ((0L, 1L, 16L, 16L, 1000000L)))
    // identical mixes drift zero on every term
    val same = Stats.chiSquareDrift(a, a, "c").collect()
    assert(same.forall(r => r.getDecimal(3).longValueExact() == 0L &&
      r.getLong(5) == 0L))
  }

  test("rangePrefixSum equals the single-task cumulative sum on random keyed longs") {
    import scala.util.Random
    (0 until 3).foreach { seed =>
      val rnd = new Random(900 + seed)
      // unique keys (the contract), values incl. negatives and zeros,
      // enough rows to span several range partitions
      val rows = rnd.shuffle((0 until 500).toVector)
        .map(k => (k.toLong * 3 + 1, rnd.nextInt(2001).toLong - 1000L))
      val df = rows.toDF("k", "x")
      val got = Stats.rangePrefixSum(df, "k", col("x"), "cum")
        .select("k", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      var acc = 0L
      rows.sortBy(_._1).foreach { case (k, x) =>
        acc += x
        assert(got(k) === acc, s"[seed $seed] prefix at key $k")
      }
      // order/schema preserved, helper columns dropped
      assert(Stats.rangePrefixSum(df, "k", col("x"), "cum").columns.toSeq
        === Seq("k", "x", "cum"))
    }
  }

  test("giniImpurity: exact rationals match the brute-force definition") {
    val rows = (0 until 500).map(i => (s"g${i % 3}", s"c${(i * i) % 7}"))
    val out = Stats.giniImpurity(rows.toDF("g", "cat"), Seq("g"), "cat")
      .collect().map(r => r.getString(0) -> (
        r.getDecimal(1).longValueExact(), r.getDecimal(2).longValueExact(),
        r.getLong(3),
        r.getDecimal(4).longValueExact(), r.getDecimal(5).longValueExact()))
      .toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val counts = rs.groupBy(_._2).values.map(_.size.toLong)
      val n = counts.sum
      val ssq = counts.map(c => c * c).sum
      assert(out(g) === (n, ssq, counts.size.toLong, n * n - ssq, n * n), s"group $g")
      // 0 <= gini < 1 and single-category groups give exactly 0
      assert(out(g)._4 >= 0 && out(g)._4 < out(g)._5)
    }
    val single = Stats.giniImpurity(
      Seq(("a", "x"), ("a", "x")).toDF("g", "cat"), Seq("g"), "cat").head()
    assert(single.getDecimal(4).longValueExact() === 0L)
  }
}
