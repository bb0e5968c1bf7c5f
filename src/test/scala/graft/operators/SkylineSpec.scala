package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Window-formulated 2-D skyline vs the brute-force dominance test. */
class SkylineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(rows: Seq[(String, Long, Long, Long)]): Set[Long] =
    rows.filter { case (g, _, x, y) =>
      !rows.exists { case (g2, _, x2, y2) =>
        g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._2).toSet

  test("hand fixture: dominated rows drop, incomparable rows survive") {
    val rows = Seq(
      ("a", 1L, 10L, 1L), // frontier (longest)
      ("a", 2L, 5L, 5L),  // frontier (trade-off)
      ("a", 3L, 5L, 4L),  // dominated by id 2 (same x, smaller y)
      ("a", 4L, 1L, 9L),  // frontier (richest)
      ("a", 5L, 1L, 1L),  // dominated by everything
      ("b", 6L, 0L, 0L))  // other group: alone → frontier
    val out = Skyline.paretoFrontier(rows.toDF("g", "id", "x", "y"), "g", "id", "x", "y")
      .collect().map(_.getLong(1)).toSet
    assert(out === Set(1L, 2L, 4L, 6L))
    assert(out === brute(rows))
  }

  test("identical points survive together (neither dominates the other)") {
    val rows = Seq(("a", 1L, 3L, 3L), ("a", 2L, 3L, 3L))
    val out = Skyline.paretoFrontier(rows.toDF("g", "id", "x", "y"), "g", "id", "x", "y")
      .collect().map(_.getLong(1)).toSet
    assert(out === Set(1L, 2L))
  }

  test("matches brute force on a deterministic pseudo-random set") {
    val rows = (0 until 200).map { i =>
      val h = i * 2654435761L
      (s"g${i % 3}", i.toLong, (h >>> 13) % 17, (h >>> 27) % 17)
    }
    val out = Skyline.paretoFrontier(
        rows.toDF("g", "id", "x", "y").repartition(7), "g", "id", "x", "y")
      .collect().map(_.getLong(1)).toSet
    assert(out === brute(rows))
  }
}
