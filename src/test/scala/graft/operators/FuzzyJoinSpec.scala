package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Blocked edit-distance matching semantics on hand-built fixtures (the
  * DuckDB oracle re-checks the operator over the part table at sf0.01). */
class FuzzyJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], maxDist: Int) =
    FuzzyJoin.editDistancePairs(
        rows.toDF("id", "name"), "id", "name",
        blockKey = split(col("name"), " ").getItem(1), maxDist = maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet

  test("pairs within a block under the distance bound, each emitted once with id_a < id_b") {
    val rows = Seq(
      (1L, "red bolt"), (2L, "old bolt"), (3L, "red bolt"), (4L, "golden bolt"))
    // red~old = 2, red~red = 0; golden is 4+ edits from both
    assert(pairs(rows, 2) === Set((1L, 2L, 2L), (1L, 3L, 0L), (2L, 3L, 2L)))
  }

  test("cross-block pairs are never compared, even at distance 1 (the blocking trade)") {
    val rows = Seq((1L, "red bolt"), (2L, "red bolts"))
    assert(pairs(rows, 3) === Set.empty)
  }

  test("distance equals Levenshtein and respects the bound exactly") {
    val rows = Seq((1L, "small gear"), (2L, "smell gear"), (3L, "tall gear"))
    // small~smell = 1, small~tall = 2 (sub s→t, del m), smell~tall = 3
    assert(pairs(rows, 1) === Set((1L, 2L, 1L)))
    assert(pairs(rows, 3) === Set((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 3L)))
  }

  test("minDist floors the band: 1 drops identical-name record pairs only") {
    val rows = Seq((1L, "small gear"), (2L, "small gear"), (3L, "smell gear"))
    val all = FuzzyJoin.editDistancePairs(rows.toDF("id", "name"), "id", "name",
        blockKey = split(col("name"), " ").getItem(1), maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    val fuzzy = FuzzyJoin.editDistancePairs(rows.toDF("id", "name"), "id", "name",
        blockKey = split(col("name"), " ").getItem(1), maxDist = 2, minDist = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(all === Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
    assert(fuzzy === Set((1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("result is invariant under input repartitioning") {
    val rows = (1L to 120L).map(i => (i, s"w${i % 11} n${i % 7}"))
    val df = rows.toDF("id", "name")
    def run(d: org.apache.spark.sql.DataFrame) =
      FuzzyJoin.editDistancePairs(d, "id", "name",
          blockKey = split(col("name"), " ").getItem(1), maxDist = 2)
        .orderBy("id_a", "id_b").collect().toSeq
    assert(run(df) === run(df.repartition(13)))
  }

  test("goldenRecords clusters transitively and elects the longest name, min id") {
    // chain: "blu gear" ~1~ "blue gear" ~1~ "bluee gear" cluster together
    // even though blu↔bluee is dist 2 via the chain (still <= maxDist
    // here) — and two records share "blue gear"; survivor = longest name
    // ("bluee gear", id 4). "red cog" is a singleton.
    val rows = Seq(
      (1L, "blu gear"), (2L, "blue gear"), (3L, "blue gear"),
      (4L, "bluee gear"), (9L, "red cog"))
      .toDF("id", "name")
    val out = FuzzyJoin.goldenRecords(rows, "id", "name",
        blockKey = split(col("name"), " ").getItem(1), maxDist = 2)
      .orderBy("survivor_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (4L, "bluee gear", 4L, 3L),
      (9L, "red cog", 1L, 1L)))
  }

  test("goldenRecords keeps clusters apart across blocks") {
    // same noun-less distance but different block keys: never compared
    val rows = Seq((1L, "alpha gear"), (2L, "alpha cogs"))
      .toDF("id", "name")
    val out = FuzzyJoin.goldenRecords(rows, "id", "name",
        blockKey = split(col("name"), " ").getItem(1), maxDist = 2)
      .orderBy("survivor_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 1L)))
  }
}
