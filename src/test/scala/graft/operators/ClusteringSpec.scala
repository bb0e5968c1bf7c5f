package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic two-round k-means against hand-separable fixtures. */
class ClusteringSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = Seq(
    // two tight blobs around (0,0) and (10,10); seeds are ids 0 and 1,
    // one drawn from each blob
    (0L, Seq(0.1f, 0.0f)), (1L, Seq(10.0f, 10.1f)),
    (2L, Seq(0.0f, 0.2f)), (3L, Seq(9.9f, 10.0f)),
    (4L, Seq(0.2f, 0.1f)), (5L, Seq(10.1f, 9.9f)),
    (6L, Seq(0.1f, 0.1f)), (7L, Seq(10.0f, 10.0f))
  ).toDF("vec_id", "embedding")

  test("separable blobs: both rounds assign each blob to its seed") {
    val out = Clustering.kmeansTwoRounds(fixture, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val even = Seq(0L, 2L, 4L, 6L)
    val odd = Seq(1L, 3L, 5L, 7L)
    assert(even.forall(id => out(id) === ((0L, 0L))))
    assert(odd.forall(id => out(id) === ((1L, 1L))))
  }

  test("round-2 distances use the UPDATED centroids") {
    // seeds: c0 = 0.0 (id 0), c1 = 4.0 (id 1).
    // round 1: c0 gets {0, 0.5}, c1 gets {2.5, 4, 7}.
    // round-2 centroids: c0 = 0.25, c1 = 4.5. For the point at 2.5:
    // |2.5−0.25|² = 5.0625 > |2.5−4.5|² = 4.0 → stays in cluster 1
    // (with the ORIGINAL seeds it was 6.25 vs 2.25 — also cluster 1, but
    // the margin flips from 4.0 to ~1.06, so a wrong-centroid bug that
    // mixes rounds shows up in the blob tests' sums, and the 0.5 point
    // pins the update: |0.5−0.25|² < |0.5−4.5|² keeps it in cluster 0).
    val df = Seq(
      (0L, Seq(0.0f)), (1L, Seq(4.0f)), (2L, Seq(0.5f)),
      (3L, Seq(2.5f)), (4L, Seq(7.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kmeansTwoRounds(df, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(3L)._1 === 1L)
    assert(out(3L)._2 === 1L)
    assert(out(2L)._2 === 0L)
    assert(out(0L)._2 === 0L)
    assert(out(4L)._2 === 1L)
  }

  test("assignments are invariant under repartitioning") {
    val base = Clustering.kmeansTwoRounds(fixture, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val shuffled = Clustering.kmeansTwoRounds(fixture.repartition(5), "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(base === shuffled)
  }

  test("prototypeDistances: hand-computed assignments, medians, and far flags in 1-D") {
    // seeds: c0 = 0.0 (id 0), c1 = 10.0 (id 1). Assignments:
    // c0 = {0 (d=0), 2 (d=1), 3 (d=4)}, c1 = {1 (d=0), 4 (d=1), 5 (d=400)}
    // lower medians (rank (3+1)/2 = 2): both clusters med = 1.
    // is_far at 3/2: d*2 > 3 ⇔ d > 1.5 → ids 3 (d=4) and 5 (d=400).
    val df = Seq(
      (0L, Seq(0.0f)), (1L, Seq(10.0f)), (2L, Seq(1.0f)),
      (3L, Seq(2.0f)), (4L, Seq(11.0f)), (5L, Seq(30.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.prototypeDistances(df, "vec_id", "embedding", k = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        r.getDecimal(2).longValueExact(), r.getDecimal(3).longValueExact(),
        r.getBoolean(4)))).toMap
    assert(out(0L) === ((0L, 0L, 1L, false)))
    assert(out(2L) === ((0L, 1L, 1L, false)))
    assert(out(3L) === ((0L, 4L, 1L, true)))
    assert(out(1L) === ((1L, 0L, 1L, false)))
    assert(out(4L) === ((1L, 1L, 1L, false)))
    assert(out(5L) === ((1L, 400L, 1L, true)))
  }
}
