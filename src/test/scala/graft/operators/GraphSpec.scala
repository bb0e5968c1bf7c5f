package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point PageRank against hand-computed recurrences (the DuckDB
  * oracle re-checks the 5-iteration run at sf0.01). */
class GraphSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("pagerank follows the exact fixed-point recurrence") {
    // a→{b,c}, b→a, c→a; two hand-unrolled iterations:
    //   iter1: b=c=(15e5+85·5e5)/100=575000, a=(15e5+85·2e6)/100=1850000
    //   iter2: b=c=(15e5+85·925000)/100=936250, a=(15e5+85·1150000)/100=1127500
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      .toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 1127500L, "b" -> 936250L, "c" -> 936250L))
  }

  test("dangling nodes absorb mass but re-emit nothing") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a never receives: reset mass only; b's inbound decays to a's reset
    assert(out === Map("a" -> 150000L, "b" -> 277500L))
  }

  test("duplicate edges collapse before degree counting") {
    val once = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val dup = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("src", "dst")
    val r1 = Graph.pageRank(once, iters = 3).collect().toSeq.sortBy(_.getString(0))
    val r2 = Graph.pageRank(dup, iters = 3).collect().toSeq.sortBy(_.getString(0))
    assert(r1 === r2)
  }

  test("ranks are invariant under input repartitioning") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"), ("c", "b"))
      .toDF("src", "dst")
    val r1 = Graph.pageRank(edges, iters = 4).collect().toSeq.sortBy(_.getString(0))
    val r2 = Graph.pageRank(edges.repartition(5), iters = 4).collect().toSeq
      .sortBy(_.getString(0))
    assert(r1 === r2)
  }

  test("triangle counts on known figures: K4, a square, a star") {
    // K4: every node sits in C(3,2)=3 triangles
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    val tk4 = Graph.triangleCounts(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tk4 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // 4-cycle: no triangles, but all nodes still reported with 0
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val tsq = Graph.triangleCounts(sq).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tsq === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    // star + one closing edge: exactly one triangle {0,1,2}
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L))
      .toDF("src", "dst")
    val ts = Graph.triangleCounts(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ts === Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
  }

  test("degree-ordered enumeration equals the naive triple join on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 24
      val edges = (for {
        a <- 0 until n; b <- 0 until n
        if a != b && rnd.nextInt(100) < 18
      } yield (a.toLong, b.toLong)).toDF("src", "dst") // directed noise in
      val fast = Graph.triangleCounts(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive: canonical u<v edge set, triple join, explode to nodes
      val canon = edges.collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1))))
        .filter(e => e._1 != e._2).distinct.toSet
      val naiveTris = for {
        (u, v) <- canon.toSeq; (v2, w) <- canon.toSeq
        if v2 == v && canon.contains((u, w))
      } yield (u, v, w)
      val naive = naiveTris.flatMap(t => Seq(t._1, t._2, t._3))
        .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
      val nodes = canon.flatMap(e => Seq(e._1, e._2))
      val expected = nodes.map(x => x -> naive.getOrElse(x, 0L)).toMap
      assert(fast === expected, s"trial $trial")
    }
  }

  test("triangle counts are invariant to edge direction and duplication") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val messy = (base ++ base.map(_.swap) ++ base).toDF("src", "dst")
    val out = Graph.triangleCounts(messy.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("label propagation follows the deterministic mode rule, hand-unrolled") {
    // path a—b—c, one synchronous round:
    //   a's neighbors {b} -> b; b's neighbors {a, c} tie -> min = a;
    //   c's neighbors {b} -> b
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val l1 = Graph.labelPropagation(edges, iters = 1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(l1 === Map("a" -> "b", "b" -> "a", "c" -> "b"))
  }

  test("label propagation converges to the min label inside each clique") {
    val cliqueA = for { i <- 1 to 4; j <- (i + 1) to 4 } yield (s"a$i", s"a$j")
    val cliqueB = for { i <- 1 to 3; j <- (i + 1) to 3 } yield (s"b$i", s"b$j")
    val edges = (cliqueA ++ cliqueB).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, iters = 4).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // within a clique everyone sees everyone: the min label dominates
    // after round 2 and stays; the two cliques never mix
    assert(out.filter(_._1.startsWith("a")).values.toSet.subsetOf(Set("a1", "a2")))
    assert(out.filter(_._1.startsWith("b")).values.toSet.subsetOf(Set("b1", "b2")))
    assert(out.keys.filter(_.startsWith("a")).forall(k => out(k).startsWith("a")))
  }

  test("label propagation matches the synchronous reference model on random graphs") {
    (0 until 4).foreach { seed =>
      val rnd = new scala.util.Random(700 + seed)
      val edges = Seq.tabulate(120)(_ => (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}"))
        .filter(e => e._1 != e._2).distinct
      val adj: Map[String, Seq[String]] = {
        val und = (edges ++ edges.map(_.swap)).distinct
        und.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
      }
      val nodes = adj.keySet
      var labels: Map[String, String] = nodes.map(n => n -> n).toMap
      (1 to 3).foreach { _ =>
        labels = nodes.map { n =>
          val counts = adj(n).map(labels).groupBy(identity)
            .map { case (l, xs) => (l, xs.size) }
          // mode: count desc, label asc
          n -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        }.toMap
      }
      val out = Graph.labelPropagation(edges.toDF("src", "dst").repartition(7), iters = 3)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out === labels, s"[seed $seed]")
    }
  }

  test("label propagation is invariant under input repartitioning") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.tabulate(150)(_ => (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}"))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val a = Graph.labelPropagation(df, iters = 3)
      .orderBy("node").collect().toSeq
    val b = Graph.labelPropagation(df.repartition(13), iters = 3)
      .orderBy("node").collect().toSeq
    assert(a === b)
  }

  test("kCore peels round by round: pendant chain drops before its anchor") {
    // 4-clique {1,2,3,4} + chain 1—5—6. k=2:
    // round 1 drops 6 (deg 1); round 2 drops 5 (deg fell to 1)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L)).toDF("src", "dst")
    val r1 = Graph.kCore(edges, k = 2, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(1L -> 4L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L))
    val r2 = Graph.kCore(edges, k = 2, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // stable by round 2: a third round changes nothing
    val r3 = Graph.kCore(edges, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 === r2)
  }

  test("kCore treats edges as undirected and dedups repeated pairs") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.kCore(edges, k = 1, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("commonNeighborLinks scores only non-adjacent pairs with shared-hub counts") {
    // path 1-2-3 plus 1-4, 3-4: non-adjacent pairs are (1,3) via hubs
    // {2,4} and (2,4) via hubs {1,3}; everything else is an edge.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.commonNeighborLinks(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSet === Set(
      (1L, 3L, 2L, 2L, 2L),
      (2L, 4L, 2L, 2L, 2L)))
  }

  test("commonNeighborLinks equals the naive two-hop join on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val got = Graph.commonNeighborLinks(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // naive: adjacency sets in driver code
    val und = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nbrs = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = nbrs.keys.toSeq.sorted
    val want = (for {
      a <- nodes; b <- nodes if a < b && !und((a, b))
      common = (nbrs(a) & nbrs(b)).size if common > 0
    } yield (a, b) -> (common.toLong, nbrs(a).size.toLong, nbrs(b).size.toLong)).toMap
    assert(got === want)
  }

  test("khopDistances is exact BFS: first visit wins, unreached absent") {
    // path 1-2-3-4-5 plus shortcut 1-4: dist(4)=1 via the shortcut, not 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val out = Graph.khopDistances(edges, seeds, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("khopDistances multi-source takes the nearest seed; seeds off-graph stay dist 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq(3L, 10L, 99L).toDF("node") // 99 is isolated
    val out = Graph.khopDistances(edges, seeds, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(
      3L -> 0L, 10L -> 0L, 99L -> 0L,
      2L -> 1L, 11L -> 1L, 1L -> 2L))
  }

  test("khopDistances maxHops 0 returns the seed set only") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = Graph.khopDistances(edges, Seq(Tuple1(1L)).toDF("node"), maxHops = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L))
  }

  test("commonNeighborLinks hub cap bounds the emission deterministically") {
    // star: hub 0 adjacent to 1..6; cap 3 keeps neighbors {1,2,3}, so
    // only pairs among the 3 smallest survive with n_common 1.
    val edges = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val out = Graph.commonNeighborLinks(edges, maxHubDegree = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("hits matches the sum-normalized integer recurrence on a brute-force model") {
    // random-ish directed bipartite-ish graph; mirror the operator's
    // exact integer recurrence in plain Scala BigInt and compare
    val edges = (0 until 60).map { i =>
      (s"u${i % 7}", s"v${(i * i + 3 * i) % 11}")
    }.distinct
    val iters = 3
    val out = Graph.hits(edges.toDF("src", "dst"), iters)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    val scale = BigInt(Graph.Scale)
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> scale).toMap
    var auth = Map.empty[String, BigInt]
    for (_ <- 1 to iters) {
      val araw = nodes.map(v =>
        v -> edges.filter(_._2 == v).map(e => hub(e._1)).sum).toMap
      val atot = araw.values.sum.max(1)
      auth = araw.map { case (v, r) => v -> (r * scale / atot) }
      val hraw = nodes.map(u =>
        u -> edges.filter(_._1 == u).map(e => auth(e._2)).sum).toMap
      val htot = hraw.values.sum.max(1)
      hub = hraw.map { case (u, r) => u -> (r * scale / htot) }
    }
    nodes.foreach { v =>
      assert(out(v) === (hub(v).toLong, auth(v).toLong), s"node $v")
    }
    // pure hubs (sources only) have auth 0; pure authorities hub 0
    assert(nodes.filter(_.startsWith("u")).forall(v => out(v)._2 == 0L))
    assert(nodes.filter(_.startsWith("v")).forall(v => out(v)._1 == 0L))
  }

  test("hits is invariant under input repartitioning and duplicate edges") {
    val edges = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("c", "y"), ("a", "x"))
    val once = Graph.hits(edges.toDF("src", "dst"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val again = Graph.hits(edges.toDF("src", "dst").repartition(5), 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(once === again)
  }
}
