package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Co-occurrence counts: pair correctness vs a brute-force self-join,
  * the deterministic basket cap, and min-support filtering. */
class BasketsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val baskets = Seq(
    (1, "x"), (1, "y"), (1, "z"),
    (2, "x"), (2, "y"),
    (3, "x"), (3, "y"), (3, "x"), // duplicate item rows collapse
    (4, "z")
  ).toDF("b", "item")

  test("matches the brute-force self-join") {
    val mine = Baskets.cooccurrence(baskets, "b", "item")
      .orderBy("a", "b").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val items = baskets.distinct()
    val brute = items.as("l").join(items.as("r"),
        $"l.b" === $"r.b" && $"l.item" < $"r.item")
      .groupBy($"l.item".as("a"), $"r.item".as("b")).count()
      .orderBy("a", "b").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(mine.toSeq === brute.toSeq)
    assert(mine.toSeq === Seq(("x", "y", 3L), ("x", "z", 1L), ("y", "z", 1L)))
  }

  test("minSupport filters rare pairs") {
    val out = Baskets.cooccurrence(baskets, "b", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("x", "y", 3L)))
  }

  test("rule stats carry exact confidence/lift ingredients, both directions") {
    val out = Baskets.ruleStats(baskets, "b", "item")
      .orderBy("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // items: x in 3 baskets, y in 3, z in 2; 4 baskets total
    assert(out.toSeq === Seq(
      ("x", "y", 3L, 3L, 3L, 4L), ("x", "z", 1L, 3L, 2L, 4L),
      ("y", "x", 3L, 3L, 3L, 4L), ("y", "z", 1L, 3L, 2L, 4L),
      ("z", "x", 1L, 2L, 3L, 4L), ("z", "y", 1L, 2L, 3L, 4L)))
  }

  test("the basket cap keeps the smallest items deterministically") {
    val big = (0 until 10).map(i => (1, f"i$i%02d")).toDF("b", "item")
    val out = Baskets.cooccurrence(big, "b", "item", maxBasketSize = 3)
      .orderBy("a", "b").collect().map(r => (r.getString(0), r.getString(1)))
    // only i00, i01, i02 survive the cap → 3 pairs
    assert(out.toSeq === Seq(("i00", "i01"), ("i00", "i02"), ("i01", "i02")))
  }
}
