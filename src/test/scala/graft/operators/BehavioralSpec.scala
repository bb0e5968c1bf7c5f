package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel / cohort semantics on hand-built event logs (the DuckDB
  * oracle re-checks both over the events table at sf0.01). */
class BehavioralSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def funnelMap(rows: Seq[(Long, String, Long)], steps: Seq[String]) =
    Behavioral.funnel(
        rows.toDF("user_id", "event_type", "ts_us"),
        "user_id", "event_type", "ts_us", steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

  test("steps must occur in order: out-of-order completion doesn't count") {
    val rows = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L), // full funnel
      (2L, "b", 10L), (2L, "a", 20L),                 // b BEFORE a: stops at a
      (3L, "a", 10L), (3L, "c", 20L))                 // skips b: stops at a
    assert(funnelMap(rows, Seq("a", "b", "c")) === Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("step i anchors at the EARLIEST occurrence of step i-1") {
    // first-touch: user 1's anchor for 'a' is ts=10, so the b@15 counts
    // even though a ALSO occurs at 20 after it
    val rows = Seq((1L, "a", 10L), (1L, "b", 15L), (1L, "a", 20L))
    assert(funnelMap(rows, Seq("a", "b")) === Map(1 -> 1L, 2 -> 1L))
  }

  test("same-timestamp step is NOT strictly after: excluded") {
    val rows = Seq((1L, "a", 10L), (1L, "b", 10L))
    assert(funnelMap(rows, Seq("a", "b")) === Map(1 -> 1L, 2 -> 0L))
  }

  test("entities that never do step 1 are invisible to every step") {
    val rows = Seq((1L, "b", 10L), (1L, "c", 20L))
    assert(funnelMap(rows, Seq("a", "b", "c")) === Map(1 -> 0L, 2 -> 0L, 3 -> 0L))
  }

  test("cohort retention counts distinct entities per (cohort, offset)") {
    val wk = 7L * 86400L * 1000000L
    // users 1,2 start week 0 (1 retained into week 1); user 3 starts week 1
    val rows = Seq(
      (1L, 0L), (1L, wk + 5L),       // week 0 cohort, active weeks {0, 1}
      (2L, 100L), (2L, 200L),        // week 0 cohort, active week {0} only
      (3L, wk + 1L))                 // week 1 cohort
      .toDF("user_id", "ts_us")
    val out = Behavioral.cohortRetention(rows, "user_id", "ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 0L) -> 1L))
  }

  test("funnel is invariant under input repartitioning") {
    val rows = (1L to 40L).flatMap { u =>
      Seq((u, "a", u), (u, "b", u + 100L), (u, "c", u + 50L))
    }
    val df = rows.toDF("user_id", "event_type", "ts_us")
    val a = Behavioral.funnel(df, "user_id", "event_type", "ts_us", Seq("a", "b", "c"))
      .orderBy("step").collect().toSeq
    val b = Behavioral.funnel(df.repartition(7), "user_id", "event_type", "ts_us",
      Seq("a", "b", "c")).orderBy("step").collect().toSeq
    assert(a === b)
  }

  test("scd2Intervals collapses consecutive runs and leaves the last interval open") {
    val log = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 5L, "A"),
      (2L, 10L, "X")
    ).toDF("user_id", "event_id", "event_type")
    val out = Behavioral.scd2Intervals(log, "user_id", "event_id", "event_type")
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, "A", 1L, 3L, 2L, 0L),   // A covers positions [1, 3), 2 rows
      (1L, "B", 3L, 5L, 1L, 0L),
      (1L, "A", 5L, -1L, 1L, 1L),  // re-appearing A is a NEW interval (open)
      (2L, "X", 10L, -1L, 1L, 1L)))
  }

  test("scd2Intervals is invariant under input repartitioning") {
    val log = (1L to 200L).map(i => (i % 5, i, s"v${(i / 7) % 3}"))
      .toDF("user_id", "event_id", "event_type")
    val a = Behavioral.scd2Intervals(log, "user_id", "event_id", "event_type")
      .orderBy("user_id", "valid_from").collect().toSeq
    val b = Behavioral.scd2Intervals(log.repartition(11), "user_id", "event_id", "event_type")
      .orderBy("user_id", "valid_from").collect().toSeq
    assert(a === b)
  }

  test("transitionCounts counts per-entity adjacent pairs with integer-ppm conditionals") {
    val log = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "B"), (1L, 4L, "C"),
      (2L, 1L, "A"), (2L, 2L, "B")
    ).toDF("user_id", "event_id", "event_type")
    val out = Behavioral.transitionCounts(log, "user_id", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      ("A", "B") -> ((2L, 1000000L)),   // A always goes to B
      ("B", "B") -> ((1L, 500000L)),
      ("B", "C") -> ((1L, 500000L))))
  }

  test("pointInTime resolves each fact to the interval containing its position") {
    val dimLog = Seq(
      (1L, 10L, "bronze"), (1L, 30L, "silver"), (1L, 50L, "gold"))
      .toDF("user_id", "event_id", "event_type")
    val dim = Behavioral.scd2Intervals(dimLog, "user_id", "event_id", "event_type")
    val facts = Seq((100L, 1L, 5L), (101L, 1L, 30L), (102L, 1L, 49L),
      (103L, 1L, 99L), (104L, 2L, 40L))
      .toDF("fact_id", "user_id", "event_id")
    val out = Behavioral.pointInTime(facts, dim, "user_id", "event_id", "event_type")
      .collect().map(r => r.getAs[Long]("fact_id") -> r.getAs[String]("dim_event_type")).toMap
    assert(out === Map(
      100L -> null,      // before the first interval
      101L -> "silver",  // boundary: valid_from is inclusive
      102L -> "silver",  // inside [30, 50)
      103L -> "gold",    // open current interval
      104L -> null))     // unknown entity
  }

  test("transitionCounts never pairs across entities") {
    // user 1 ends with Z, user 2 starts with Q: no Z->Q transition
    val log = Seq((1L, 1L, "Z"), (2L, 2L, "Q"), (2L, 3L, "R"))
      .toDF("user_id", "event_id", "event_type")
    val out = Behavioral.transitionCounts(log, "user_id", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("Q", "R")))
  }

  test("sequentialPatterns counts contiguous runs only, per entity") {
    // user 1: A B A B → trigrams ABA, BAB; user 2: A B C → ABC.
    // user 3 has only two events: contributes nothing at len=3.
    val log = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "C"),
      (3L, 1L, "X"), (3L, 2L, "Y"))
      .toDF("user_id", "event_id", "event_type")
    val out = Behavioral.sequentialPatterns(log, "user_id", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSet === Set(
      ("A", "B", "A", 1L), ("B", "A", "B", 1L), ("A", "B", "C", 1L)))
  }

  test("sequentialPatterns len=2 equals transitionCounts' count column") {
    val rnd = new scala.util.Random(11)
    val log = (1L to 200L).map(i =>
      (i % 7, i, Seq("a", "b", "c")(rnd.nextInt(3))))
      .toDF("user_id", "event_id", "event_type")
    val pat = Behavioral.sequentialPatterns(log, "user_id", "event_id", "event_type", len = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tc = Behavioral.transitionCounts(log, "user_id", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("transitions")).toMap
    assert(pat === tc)
  }

  test("sequentialPatterns minSupport filters and never crosses entities") {
    // user 1 ends with B and user 2 starts with B: a cross-entity chain
    // would mint a B→B pattern; support 2 comes from within-entity runs
    // only (A→B: once in each user; B→A: twice in user 2)
    val log = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"),
      (2L, 3L, "B"), (2L, 4L, "A"), (2L, 5L, "B"), (2L, 6L, "A"))
      .toDF("user_id", "event_id", "event_type")
    val out = Behavioral.sequentialPatterns(
        log, "user_id", "event_id", "event_type", len = 2, minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSet === Set(("B", "A", 2L), ("A", "B", 2L)))
  }

  test("lastTouchAttribution claims the latest strictly-preceding touch") {
    val log = Seq(
      (1L, 1L, "view"), (1L, 2L, "view"), (1L, 3L, "purchase"), // claims 2
      (1L, 4L, "purchase"),                                     // still 2
      (1L, 5L, "view"), (1L, 6L, "purchase"),                   // claims 5
      (2L, 7L, "purchase"),                                     // no prior view
      (3L, 8L, "view"))                                         // no conversion
      .toDF("user_id", "event_id", "event_type")
    val out = Behavioral.lastTouchAttribution(
        log, "user_id", "event_id", "event_type", "view", "purchase")
      .orderBy("user_id", "conv_ord").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
    assert(out.toSeq === Seq(
      (1L, 3L, Some(2L)), (1L, 4L, Some(2L)), (1L, 6L, Some(5L)),
      (2L, 7L, None)))
  }

  test("rfmScores tiles each metric independently with id tiebreaks") {
    // 4 users, 2 tiles: recency order = (1,2,3,4) by max ord;
    // frequency: u1=3,u2=2,u3=1,u4=1 → order (3,4,1,2) wait — ascending
    // (u3,u4) tie broken by id; monetary ascending likewise
    val log = Seq(
      (1L, 1L, 10.0), (1L, 2L, 10.0), (1L, 3L, 10.0), // r=3 f=3 m=30
      (2L, 4L, 1.0), (2L, 5L, 1.0),                   // r=5 f=2 m=2
      (3L, 6L, 100.0),                                // r=6 f=1 m=100
      (4L, 7L, 50.0))                                 // r=7 f=1 m=50
      .toDF("user_id", "event_id", "value")
    val out = Behavioral.rfmScores(log, "user_id", "event_id", "value", tiles = 2)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("r_score"),
        r.getAs[Long]("f_score"), r.getAs[Long]("m_score"), r.getAs[Long]("rfm")))
    // recency asc: u1(3) u2(5) | u3(6) u4(7) → r: 1,1,2,2
    // frequency asc with id tiebreak: u3(1) u4(1) | u2(2) u1(3) → f: u3=1,u4=1,u2=2,u1=2
    // monetary asc: u2(2) u1(30) | u4(50) u3(100) → m: u2=1,u1=1,u4=2,u3=2
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 1L, 121L),
      (2L, 1L, 2L, 1L, 121L),
      (3L, 2L, 1L, 2L, 212L),
      (4L, 2L, 1L, 2L, 212L)))
  }

  test("rollingActiveUsers: trailing window distinct, only occurring days emitted") {
    // days 1,2,9: user 1 active on 1&2, user 2 on 2, user 3 on 9.
    // window 3: day 1 ← {1}; day 2 ← days 0-2 = {1,2}; day 9 ← {3}.
    // days 3,4 (would-be windows with no own activity) are not emitted.
    val log = Seq((1L, 1L), (1L, 2L), (2L, 2L), (3L, 9L), (1L, 1L))
      .toDF("uid", "day")
    val out = Behavioral.rollingActiveUsers(log, "uid", "day", window = 3)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 1L, 1L), (2L, 2L, 2L), (9L, 1L, 1L)))
  }

  test("lastTouchAttribution never crosses entities") {
    val log = Seq(
      (1L, 1L, "view"), (2L, 2L, "purchase")) // user 2 can't claim user 1's view
      .toDF("user_id", "event_id", "event_type")
    val out = Behavioral.lastTouchAttribution(
        log, "user_id", "event_id", "event_type", "view", "purchase")
      .collect().map(r => (r.getLong(0), Option(r.get(2))))
    assert(out.toSeq === Seq((2L, None)))
  }
}
