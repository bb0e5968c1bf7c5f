package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the round-12 family: seasonal
  * decomposition and directional containment pairs. */
class Round12OpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int = 12): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:00:00")

  test("seasonalDecompose: complete centered windows only, integer detrend") {
    // key "a": 10 consecutive days with counts 1..10 (day d has d events)
    val events = (1 to 10).flatMap(d => Seq.fill(d)(("a", ts(d))))
      .toDF("k", "t")
    val out = Stats.seasonalDecompose(events, "k", "t")
      .orderBy("d").collect()
    assert(out.length === 10)
    // days 1-3 and 8-10 have incomplete windows → NULL trend
    assert(out.take(3).forall(_.isNullAt(4)))
    assert(out.takeRight(3).forall(_.isNullAt(4)))
    // day 4 (cnt=4): window days 1..7 sums 1+..+7 = 28; detrended = 7*4-28 = 0
    val d4 = out(3)
    assert(d4.getLong(4) === 28L && d4.getLong(5) === 0L)
    // day 7 (cnt=7): window 4..10 sums 49; detrended = 49-49 = 0
    assert(out(6).getLong(4) === 49L && out(6).getLong(5) === 0L)
  }

  test("seasonalDecompose: a calendar gap disqualifies the spanning windows") {
    // days 1..7 and 9..15 (day 8 missing): windows crossing the gap span
    // 7 rows over MORE than 6 calendar days → NULL
    val days = (1 to 7) ++ (9 to 15)
    val events = days.map(d => ("a", ts(d))).toDF("k", "t")
    val out = Stats.seasonalDecompose(events, "k", "t")
      .orderBy("d").collect()
    // only day 4 (window 1..7) and day 12 (window 9..15) are complete
    val complete = out.filter(!_.isNullAt(4)).map(_.getDate(1).toString)
    assert(complete.toSeq === Seq("2024-03-04", "2024-03-12"))
  }

  test("seasonalDecompose: dow is epoch-day mod 7, engine-neutral") {
    // 1970-01-01 was a Thursday → dow 0; 2024-03-04 is a Monday:
    // datediff(2024-03-04, 1970-01-01) = 19786, 19786 % 7 = 4
    val events = Seq(("a", ts(4))).toDF("k", "t")
    val out = Stats.seasonalDecompose(events, "k", "t").collect()
    assert(out.head.getLong(2) === 4L)
  }

  test("seasonalDecompose partitions the window per key (keys independent)") {
    val events = (1 to 7).flatMap(d => Seq(("a", ts(d)), ("b", ts(d)), ("b", ts(d))))
      .toDF("k", "t")
    val out = Stats.seasonalDecompose(events, "k", "t")
      .filter(col("detrended7").isNotNull)
      .select("k", "trend7_sum").as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 7L, "b" -> 14L))
  }

  test("containmentPairs finds subset-duplication Jaccard misses") {
    val words = (1 to 40).map(i => f"w$i%03d").mkString(" ")   // long doc
    val excerpt = words.substring(0, 60)                        // strict prefix
    val other = (100 to 140).map(i => f"x$i%03d").mkString(" ") // disjoint
    val docs = Seq((1L, words), (2L, excerpt), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "text", "doc_id",
        tNum = 9, tDen = 10, shingleSize = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // excerpt ⊂ long doc: (2→1) present; the reverse direction is not
    // (the long doc is NOT contained in its excerpt), nor any pair with 3
    assert(pairs === Set((2L, 1L)))
    // …and symmetric Jaccard at the same threshold sees nothing
    val j = Dedup.prefixFilterPairs(docs, "text", "doc_id",
        tNum = 9, tDen = 10, shingleSize = 5).count()
    assert(j === 0L)
  }

  test("containmentPairs equals brute force on a random-ish corpus") {
    val base = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi",
      "one two three four five six seven eight nine ten",
      "completely different text with other words entirely",
      "alpha beta gamma delta epsilon zeta eta theta") // exact dup of #0
    val docs = base.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fast = Dedup.containmentPairs(docs, "text", "doc_id",
        tNum = 8, tDen = 10, shingleSize = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force with the same shingle sets
    val sh = docs.select(col("doc_id"),
        Dedup.shingleHashes(col("text"), 4).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    val brute = (for {
      a <- sh.keys; b <- sh.keys if a != b
      inter = sh(a).toSet.intersect(sh(b).toSet).size
      if inter * 10 >= sh(a).size * 8
    } yield (a, b)).toSet
    assert(fast === brute && brute.nonEmpty)
  }

  test("containmentPairs probeFilter = full run filtered to the probe slice") {
    val base = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      "one two three four five six seven eight nine ten",
      "alpha beta gamma delta epsilon zeta eta theta")
    val docs = base.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val full = Dedup.containmentPairs(docs, "text", "doc_id",
        tNum = 8, tDen = 10, shingleSize = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sliced = Dedup.containmentPairs(docs, "text", "doc_id",
        tNum = 8, tDen = 10, shingleSize = 4,
        probeFilter = col("doc_id") < 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sliced === full.filter(_._1 < 2) && sliced.nonEmpty)
  }

  test("theilSenSlope ignores the outlier OLS would chase") {
    // y = x on days 0..3 except day 3 spikes to 103; pairwise slopes
    // sorted by (value, num, den): (1,1),(1,1),(2,2),(103,3),(102,2),
    // (101,1) → m=6, lower median rank 3 → slope 2/2 = 1
    val df = Seq(("a", 0L, 0L), ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 103L))
      .toDF("g", "x", "y")
    val out = Stats.theilSenSlope(df, "g", "x", "y").collect().head
    assert(out.getLong(1) === 4L && out.getLong(2) === 6L)
    assert(out.getLong(3) === 2L && out.getLong(4) === 2L) // value 1
  }

  test("theilSenSlope excludes equal-x pairs and keeps exact fractions") {
    // two points share x=0: the (0,0)-(0,4) pair is dropped; remaining
    // slopes from (0,0),(0,4) to (2,1): 1/2 and -3/2 → m=2, rank 1 →
    // the smaller slope -3/2
    val df = Seq(("a", 0L, 0L), ("a", 0L, 4L), ("a", 2L, 1L)).toDF("g", "x", "y")
    val out = Stats.theilSenSlope(df, "g", "x", "y").collect().head
    assert(out.getLong(2) === 2L)
    assert(out.getLong(3) === -3L && out.getLong(4) === 2L)
  }

  test("theilSenSlope: single-point and single-x groups are dropped") {
    val df = Seq(("one", 5L, 1L), ("flat", 7L, 1L), ("flat", 7L, 9L))
      .toDF("g", "x", "y")
    assert(Stats.theilSenSlope(df, "g", "x", "y").count() === 0L)
  }

  test("cusumChangepoint localizes a level shift at the regime boundary") {
    // counts 1,1,1,1 then 10,10,10,10: T=44, n=8, S_k = 8·cum − 44k
    // peaks in magnitude at k=4 (|−144|), the last day of regime one
    val df = (1 to 8).map(d => ("a", d.toLong, if (d <= 4) 1L else 10L))
      .toDF("g", "x", "y")
    val out = Stats.cusumChangepoint(df, "g", "x", "y").collect().head
    assert(out.getLong(1) === 8L && out.getLong(2) === 44L) // n, total
    assert(out.getLong(3) === 4L && out.getLong(4) === 4L)  // split k, x
    assert(out.getLong(5) === -144L)
  }

  test("cusumChangepoint: constant series scores zero at the earliest interior k") {
    val df = (1 to 5).map(d => ("a", d.toLong, 3L)).toDF("g", "x", "y")
    val out = Stats.cusumChangepoint(df, "g", "x", "y").collect().head
    assert(out.getLong(3) === 1L && out.getLong(5) === 0L)
  }

  test("cohenKappa matches the textbook 2x2 computation") {
    // contingency: (x,x)=5, (y,y)=3, (x,y)=1, (y,x)=1 → n=10, o=8,
    // rows x:6 y:4, cols x:6 y:4, Σrow·col = 36+16 = 52 →
    // κ = (80−52)/(100−52) = 28/48 ≈ 0.583
    val pairs = Seq.fill(5)(("x", "x")) ++ Seq.fill(3)(("y", "y")) ++
      Seq(("x", "y"), ("y", "x"))
    val df = pairs.map { case (a, b) => ("g", a, b) }.toDF("g", "a", "b")
    val out = Stats.cohenKappa(df, "g", "a", "b").collect().head
    assert(out.getLong(1) === 10L && out.getLong(2) === 8L)
    assert(out.getLong(3) === 28L && out.getLong(4) === 48L)
  }

  test("cohenKappa: perfect agreement gives num == den; disjoint labels give o=0") {
    val perfect = Seq(("g", "x", "x"), ("g", "y", "y")).toDF("g", "a", "b")
    val p = Stats.cohenKappa(perfect, "g", "a", "b").collect().head
    assert(p.getLong(3) === p.getLong(4) && p.getLong(4) > 0L) // κ = 1
    // raters never share a label: Σrow·col over the shared-label join is 0
    val disjoint = Seq(("g", "x", "p"), ("g", "y", "q")).toDF("g", "a", "b")
    val d = Stats.cohenKappa(disjoint, "g", "a", "b").collect().head
    assert(d.getLong(2) === 0L && d.getLong(3) === 0L && d.getLong(4) === 4L)
  }

  test("exactAuc: perfect ranker scores 1, tied scores take midranks") {
    // scores 1,2,3,4 / labels n,n,p,p: positives hold ranks 3,4 →
    // num = (6+8) − 2·3 = 8, den = 2·2·2 = 8 → AUC 1
    val perfect = Seq(("g", 1L, false), ("g", 2L, false),
      ("g", 3L, true), ("g", 4L, true)).toDF("g", "s", "l")
    val p = Stats.exactAuc(perfect, "g", "s", "l").collect().head
    assert(p.getLong(3) === 8L && p.getLong(4) === 8L)
    // one tied pair, one of each label: midrank 1.5 each → AUC 1/2
    val tied = Seq(("g", 7L, true), ("g", 7L, false)).toDF("g", "s", "l")
    val t = Stats.exactAuc(tied, "g", "s", "l").collect().head
    assert(t.getLong(3) === 1L && t.getLong(4) === 2L)
  }

  test("exactAuc: single-class groups emit den = 0, never NaN") {
    val df = Seq(("g", 1L, true), ("g", 2L, true)).toDF("g", "s", "l")
    val out = Stats.exactAuc(df, "g", "s", "l").collect().head
    assert(out.getLong(2) === 0L && out.getLong(4) === 0L)
  }

  test("calibrationBins: equi-depth bins, counts and positives per bin") {
    // 8 rows, 4 bins → bins {1,2},{3,4},{5,6},{7,8}; label = score ≥ 5
    val df = (1 to 8).map(i => ("g", i.toLong, i.toLong, i >= 5))
      .toDF("g", "id", "s", "l")
    val out = Stats.calibrationBins(df, "g", "s", "l", Seq("id"), bins = 4)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 2L, 2L, 2L))
    assert(out.map(_.getLong(3)).toSeq === Seq(0L, 0L, 2L, 2L))
    assert(out.map(_.getLong(4)).toSeq === Seq(3L, 7L, 11L, 15L))
  }

  test("noveltyScores: copies recycle, originators stay clean") {
    val original = "the quick brown fox jumps over the lazy dog"
    val unrelated = "entirely different content with no shared spans at all"
    val docs = Seq((1L, original), (2L, unrelated), (3L, original))
      .toDF("doc_id", "text")
    val out = TextCorpus.noveltyScores(docs, "doc_id", "text", shingleSize = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1 introduced everything it has; doc 3 is a verbatim copy —
    // every shingle recycled; doc 2 shares nothing
    assert(out(1L)._2 === 0L)
    assert(out(3L)._1 === out(1L)._1 && out(3L)._2 === out(3L)._1)
    assert(out(2L)._2 === 0L)
  }
}
