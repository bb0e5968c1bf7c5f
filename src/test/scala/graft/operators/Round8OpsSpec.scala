package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the round-8 family: CDC replay, declarative
  * validation, linear-interpolation resampling, session paths, skew
  * buckets, z-score standardization, period growth, l-diversity. */
class Round8OpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("applyChangeLog: newest row wins, deletes remove, reinsert resurrects") {
    val log = Seq(
      // key 1: insert, update → final value 20
      (1L, 1L, "u", 10.0), (1L, 3L, "u", 20.0),
      // key 2: insert then delete → absent
      (2L, 2L, "u", 5.0), (2L, 4L, "d", 0.0),
      // key 3: delete then REINSERT → present with 7
      (3L, 5L, "d", 0.0), (3L, 6L, "u", 7.0)
    ).toDF("k", "ord", "op", "v")
    val out = Cdc.applyChangeLog(log, Seq("k"), Seq("ord"), "op")
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 20.0, 3L -> 7.0))
  }

  test("churnStats counts changes/deletes and derives liveness from the newest op") {
    val log = Seq(
      (1L, 1L, "u"), (1L, 2L, "d"), (1L, 3L, "u"),
      (2L, 4L, "u"), (2L, 5L, "d")
    ).toDF("k", "ord", "op").withColumn("v", lit(0.0))
    val out = Cdc.churnStats(log, Seq("k"), Seq("ord"), "op")
      .select("k", "n_changes", "n_deletes", "exists")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 1L, true)))
    assert(out(2L) === ((2L, 2L, 1L, false)))
  }

  test("validation report: one row per rule, nulls count as violations") {
    val df = Seq[(java.lang.Double, String)](
      (1.0, "O"), (-2.0, "F"), (null, "X")
    ).toDF("price", "status")
    val out = Validation.report(df, Seq(
      Validation.Rule("price_pos", col("price") > 0.0),
      Validation.Rule("status_dom", col("status").isin("O", "F"))))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("price_pos") === ((3L, 2L))) // -2 violates, null violates
    assert(out("status_dom") === ((3L, 1L)))
  }

  test("unique + fk reports count keys and orphans") {
    val base = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "x")
    val uniq = Validation.uniqueReport(base, "u", Seq("k"))
      .as[(String, Long, Long)].collect().head
    assert(uniq === (("u", 2L, 1L))) // 2 keys, 1 duplicated

    val ref = Seq(Tuple1(1L)).toDF("pk")
    val fk = Validation.fkReport(base, "fk", "k", ref, "pk")
      .as[(String, Long, Long)].collect().head
    assert(fk === (("fk", 3L, 1L))) // the k=2 row is orphaned
  }

  test("interpGrid fills gaps linearly between bracketing observations") {
    // key a: obs at buckets 0 (v=10) and 3 (v=40): gaps 1, 2 interpolate
    val df = Seq(
      ("a", 0L, 1L, 10.0), ("a", 30L, 2L, 40.0)
    ).toDF("k", "ts", "tie", "v")
    val out = Resample.interpGrid(df, "k", "ts", "v", "tie", step = 10L)
      .select("bucket", "v").as[(Long, Double)].collect().toMap
    assert(out === Map(0L -> 10.0, 1L -> 20.0, 2L -> 30.0, 3L -> 40.0))
  }

  test("interpGrid passes observed buckets through untouched (last obs per bucket)") {
    val df = Seq(
      ("a", 0L, 1L, 1.0), ("a", 5L, 2L, 99.0), // same bucket: tie-high wins
      ("a", 20L, 3L, 3.0)
    ).toDF("k", "ts", "v_ts", "v").withColumnRenamed("v_ts", "tie")
    val out = Resample.interpGrid(df, "k", "ts", "v", "tie", step = 10L)
      .select("bucket", "v").as[(Long, Double)].collect().toMap
    assert(out(0L) === 99.0)
    assert(out(1L) === 51.0) // midpoint of 99 and 3
    assert(out(2L) === 3.0)
  }

  test("conversionPaths sessionizes by gap and renders ordered type paths") {
    val ev = Seq(
      // user 1: view>click | purchase (gap splits)
      (1L, 100L, 1L, "view"), (1L, 150L, 2L, "click"), (1L, 1000L, 3L, "purchase"),
      // user 2: view>click again
      (2L, 10L, 4L, "view"), (2L, 20L, 5L, "click")
    ).toDF("uid", "ts", "eid", "t")
    val out = Behavioral.conversionPaths(ev, "uid", "ts", "eid", "t",
        gap = 100L, topK = 10)
      .as[(String, Long)].collect().toMap
    assert(out === Map("view>click" -> 2L, "purchase" -> 1L))
  }

  test("keySkewReport buckets per-key counts by floor(log2)") {
    // counts: a→1 (bucket 0), b→2, c→3 (bucket 1), d→8 (bucket 3)
    val rows = Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++ Seq.fill(8)("d")
    val out = Stats.keySkewReport(rows.toDF("k"), Seq("k"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) === ((1L, 1L, 1L)))
    assert(out(1L) === ((2L, 5L, 3L)))
    assert(out(3L) === ((1L, 8L, 8L)))
  }

  test("standardize: exact moments, zero-variance group maps to z=0") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "v")
    val out = Stats.standardize(df, "g", "v").select("g", "v", "z")
      .as[(String, Double, Double)].collect()
    val a = out.filter(_._1 == "a").map(r => r._2 -> r._3).toMap
    // mean 2, var ((1+9) - 4*2)/2 = 1 → z = ±1
    assert(a(1.0) === -1.0 && a(3.0) === 1.0)
    assert(out.filter(_._1 == "b").forall(_._3 === 0.0))
  }

  test("periodGrowth: integer ppm, sign-split division, first period null") {
    val agg = Seq(("s", 1L, 1000000L), ("s", 2L, 1500000L), ("s", 3L, 750000L))
      .toDF("g", "p", "v")
    val out = Stats.periodGrowth(agg, "g", "p", "v")
      .select("p", "growth_ppm").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) === None)
    assert(out(2L) === Some(500000L))  // +50%
    assert(out(3L) === Some(-500000L)) // -50%
  }

  test("maxConcurrent sweeps half-open intervals; back-to-back never overlaps") {
    val iv = Seq(
      // group g: [0,10) [5,15) [10,20): peak 2, first at t=5
      ("g", 0L, 10L, 1L), ("g", 5L, 15L, 2L), ("g", 10L, 20L, 3L),
      // group h: three disjoint touching intervals: peak 1 at t=0
      ("h", 0L, 5L, 4L), ("h", 5L, 9L, 5L), ("h", 9L, 12L, 6L)
    ).toDF("grp", "s", "e", "id")
    val out = Behavioral.maxConcurrent(iv, "grp", "s", "e", "id")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("g") === ((2L, 5L)))
    assert(out("h") === ((1L, 0L)))
  }

  test("runningAnomalies: exact z-squared on prior history only") {
    // key a: values 10,10,10,10,10 then 100 — the 6th has prior
    // mean 10, var 0 → (n·v−s1)² = (600−50)² > 0 → anomaly; the
    // steady rows never flag (dev 0); rows before minPrior never flag
    val rows = (1L to 5L).map(i => ("a", i, i, 10L)) :+ (("a", 6L, 6L, 100L))
    val out = Stats.runningAnomalies(rows.toDF("k", "ts", "id", "v"),
        "k", Seq("ts", "id"), "v", z = 3, minPrior = 5)
      .select("id", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(out(6L) === true)
    assert((1L to 5L).forall(out(_) === false))
  }

  test("runningAnomalies: within-noise deviation stays unflagged") {
    // prior {8,12,8,12,8}: mean 9.6, var 3.84; v=12 → dev² = (5·12−48)²
    // = 144; 9·(5·s2−s1²) = 9·(5·464−2304) = 504 → 144 < 504: calm
    val rows = Seq(8L, 12L, 8L, 12L, 8L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, i.toLong, v) } :+ (("a", 9L, 9L, 12L))
    val out = Stats.runningAnomalies(rows.toDF("k", "ts", "id", "v"),
        "k", Seq("ts", "id"), "v", z = 3, minPrior = 5)
      .select("id", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(out(9L) === false)
  }

  test("clampedBalance saturates at every step, not on the final prefix sum") {
    // deltas +5, +10 (cap 8 → 8), -20 (floor 0 → 0), +3 → 3: a clamped
    // cumsum of the raw prefix (5, 15, -5, -2) would give 8, 8, 0, 0 —
    // the last step differs, proving per-step semantics
    val log = Seq(
      (1L, 1L, 1L, 5L), (1L, 2L, 2L, 10L), (1L, 3L, 3L, -20L), (1L, 4L, 4L, 3L),
      (2L, 1L, 5L, -7L) // floor immediately
    ).toDF("k", "ts", "id", "d")
    val out = Ledger.clampedBalance(log, "k", "ts", "id", "d", lo = 0L, hi = 8L)
      .select("k", "id", "balance").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out === Map((1L, 1L) -> 5L, (1L, 2L) -> 8L, (1L, 3L) -> 0L,
      (1L, 4L) -> 3L, (2L, 5L) -> 0L))
  }

  test("clampedBalance folds each key independently across partitions") {
    val log = (1L to 50L).flatMap(k => (1L to 20L).map(i => (k, i, k * 100 + i, 1L)))
    val out = Ledger.clampedBalance(
        log.toDF("k", "ts", "id", "d").repartition(7), "k", "ts", "id", "d",
        lo = 0L, hi = 10L)
      .groupBy("k").agg(max("balance").as("mx"), min("balance").as("mn"))
      .as[(Long, Long, Long)].collect()
    assert(out.length === 50 && out.forall(r => r._2 === 10L && r._3 === 1L))
  }

  test("timeWeightedAvg integrates the step function, not the event mean") {
    // u1: v=10 for 9 time units then v=100 for 1 (to the horizon at 10):
    // event mean says 55, the time integral says (10*9 + 100*1)/10 = 19 —
    // the bias TWAP exists to undo. Duplicate-ts rows: the tie-last
    // carries the run, earlier ties contribute zero duration.
    val log = Seq(
      (1L, 0L, 1L, 10L), (1L, 9L, 2L, 100L),
      (2L, 0L, 3L, 7L), (2L, 0L, 4L, 5L), // same ts: only tie-last (id 4) holds
      (2L, 10L, 5L, 5L) // sets the horizon at t=10
    ).toDF("k", "ts", "id", "v")
    val out = Stats.timeWeightedAvg(log, "k", "ts", "id", "v")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDecimal(3).longValueExact())))
      .toMap
    assert(out(1L) === ((2L, 10L, 10L * 9 + 100L * 1)))
    // u2: v=7 holds [0,0) = 0, v=5 holds [0,10), then 5 at the horizon
    assert(out(2L) === ((3L, 10L, 7L * 0 + 5L * 10 + 5L * 0)))
  }

  test("clampedBalance rejects non-integral inputs instead of null-key merging") {
    // a string key would silently cast to NULL under non-ANSI SQL and
    // merge every such row into one null-key fold — must throw up front
    val stringKey = Seq(("u-1", 1L, 1L, 5L)).toDF("k", "ts", "id", "d")
    val e1 = intercept[IllegalArgumentException] {
      Ledger.clampedBalance(stringKey, "k", "ts", "id", "d", 0L, 8L)
    }
    assert(e1.getMessage.contains("integral 'k'"))
    val decimalDelta = Seq((1L, 1L, 1L, BigDecimal("1.50")))
      .toDF("k", "ts", "id", "d")
    val e2 = intercept[IllegalArgumentException] {
      Ledger.clampedBalance(decimalDelta, "k", "ts", "id", "d", 0L, 8L)
    }
    assert(e2.getMessage.contains("integral 'd'"))
    // the documented caller-side remedies work: hashed key, micros delta
    val fixed = stringKey.select(xxhash64(col("k")).as("k"), col("ts"),
      col("id"), col("d"))
    assert(Ledger.clampedBalance(fixed, "k", "ts", "id", "d", 0L, 8L)
      .count() === 1L)
  }

  test("cvFold: every id gets exactly one stable fold in range") {
    val ids = (1L to 500L).toDF("id")
    val folds = ids.select(col("id"), Sampling.cvFold(col("id"), "s", 5).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(folds.values.forall(f => f >= 0 && f < 5))
    assert(folds.values.toSet.size === 5) // all folds populated at n=500
    // stability: recompute matches (projection, no state)
    val again = ids.repartition(7)
      .select(col("id"), Sampling.cvFold(col("id"), "s", 5).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(again === folds)
  }

  test("contributionShare: ppm shares sum to ~1e6 per partition") {
    val agg = Seq(("w1", "a", 600L), ("w1", "b", 400L), ("w2", "a", 5L))
      .toDF("w", "g", "v")
    val out = Stats.contributionShare(agg, Seq("w"), "v")
      .select("w", "g", "share_ppm").as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("w1", "a")) === 600000L)
    assert(out(("w1", "b")) === 400000L)
    assert(out(("w2", "a")) === 1000000L)
  }

  test("giniIndex: 0 for equal values, (n-1)/n for one-holder concentration") {
    val df = Seq(
      ("eq", 1L, 500L), ("eq", 2L, 500L), ("eq", 3L, 500L), ("eq", 4L, 500L),
      ("one", 1L, 0L), ("one", 2L, 0L), ("one", 3L, 0L), ("one", 4L, 1000L)
    ).toDF("g", "id", "v")
    val out = Stats.giniIndex(df, "g", "id", "v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out("eq") === 0L)
    assert(out("one") === 750000L) // (n-1)/n = 3/4
  }

  test("itemCosine normalizes co-occurrence by popularity") {
    // baskets: {1,2} {1,2} {1,3}: cos(1,2) = 2/sqrt(3*2), cos(1,3) = 1/sqrt(3*1)
    val df = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 3L))
      .toDF("basket", "item")
    val out = Baskets.itemCosine(df, "basket", "item")
      .select("a", "b", "cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(out((1L, 2L)) - 2.0 / math.sqrt(6.0)) < 1e-12)
    assert(math.abs(out((1L, 3L)) - 1.0 / math.sqrt(3.0)) < 1e-12)
  }

  test("lDiversityClasses flags homogeneous classes") {
    val df = Seq(
      ("n1", "A", 1L), ("n1", "A", 2L), ("n1", "A", 3L), // diverse at l=3
      ("n2", "B", 1L), ("n2", "B", 1L) // homogeneous
    ).toDF("nat", "seg", "sens")
    val out = Pii.lDiversityClasses(df, Seq("nat", "seg"), "sens", l = 3)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out(("n1", "A")) === ((3L, 3L, true)))
    assert(out(("n2", "B")) === ((2L, 1L, false)))
  }
}
