package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation as repeated join+aggregate — the Pregel
  * pattern expressed in DataFrames (same altitude as GraphX's
  * `staticPageRank`, Malewicz et al. SIGMOD'10), complementing the
  * pointer-jumping connected components in [[Dedup.connectedComponents]].
  * Training-data use: importance-weighting documents/sources by the
  * centrality of their citation/link graph before mixture planning
  * (web-corpus curation keeps high-centrality hosts; cf. the quality
  * signals surveyed in RefinedWeb, Penedo et al. 2023).
  */
object Graph {

  /** Fixed-point scale for rank mass: 10^6 ≙ rank 1.0. */
  val Scale = 1000000L

  /** PageRank with a FIXED iteration count in exact fixed-point integer
    * arithmetic (damping 0.85 as the rational 85/100, GraphX-style
    * un-normalized formulation, init 1.0 per node):
    * {{{
    *   contrib(e)    = rank_fp(src) div outdeg(src)        per edge
    *   rank_fp'(v)   = (15·Scale + 85·Σ contrib) div 100
    * }}}
    * Every operation is integer, so results are bit-identical across
    * engines — the DuckDB oracle unrolls the same recurrence. Dangling
    * nodes keep receiving the reset mass but re-emit nothing (their
    * outgoing mass vanishes), matching GraphX's convention.
    *
    * 100 TB shape: per iteration ONE shuffle join of edges against the
    * current ranks on `src` and ONE aggregation onto `dst` — both
    * hash-partitioned on graph keys, nothing ever broadcast or
    * collected. Out-degrees are attached to the edge list ONCE up
    * front and the frame is pinned (`localCheckpoint`) because every
    * iteration re-reads it; ranks are pinned per iteration, which also
    * cuts the logical-plan lineage that would otherwise double per
    * round (the same discipline as [[Dedup.connectedComponents]]).
    * Iteration count is a parameter, not convergence-detected: rank
    * deltas are floats in spirit and a fixed horizon keeps the gate
    * deterministic; callers wanting convergence can compare successive
    * frames themselves.
    */
  def pageRank(
      edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = e0.join(deg, Seq("src")).localCheckpoint() // re-read every iteration
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint() // re-read every iteration
    var ranks = nodes.withColumn("rank_fp", lit(Scale))
    for (_ <- 1 to iters) {
      val inbound = e.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("rank_fp div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("inmass"))
      ranks = nodes
        .join(inbound, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"(15 * $Scale + 85 * coalesce(inmass, 0L)) div 100").as("rank_fp"))
        .localCheckpoint()
    }
    ranks
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999) with a FIXED
    * iteration count in exact fixed-point integers — the DIRECTED
    * twin of [[pageRank]] for bipartite-ish link structure: hubs point
    * at good authorities, authorities are pointed at by good hubs
    * (curation use: hub-quality of link/citation pages vs
    * authority-quality of content hosts). Per iteration:
    * {{{
    *   auth_raw(v) = Σ hub_fp(u)   over in-edges (u → v)
    *   auth_fp(v)  = auth_raw(v) · Scale div Σ auth_raw    (sum-norm)
    *   hub_raw(u)  = Σ auth_fp(v)  over out-edges (u → v)
    *   hub_fp(u)   = hub_raw(u) · Scale div Σ hub_raw
    * }}}
    * SUM normalization replaces the textbook L2 norm — a norm choice
    * only rescales the score vector (the ranking and the fixed
    * direction are the same), and the rational form keeps every step
    * integer-exact, so the oracle unrolls the identical recurrence.
    * Sums accumulate in decimal(38,0) (HUGEINT on the oracle side);
    * normalized scores live in [0, Scale].
    *
    * 100 TB shape: identical to [[pageRank]] — per half-step ONE keyed
    * join of the pinned edge frame against the current scores and ONE
    * aggregation, plus a one-row total broadcast for the
    * normalization; per-iteration `localCheckpoint` cuts the doubling
    * lineage. Nothing data-sized is collected or broadcast. */
  def hits(
      edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val d = "decimal(38,0)"
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    def normalize(raw: DataFrame, keyCol: String, out: String): DataFrame = {
      // one-row total; the div floors, so scores stay exact integers
      val tot = raw.agg(coalesce(sum("raw"), lit(0L)).cast(d).as("t"))
        .select(when(col("t") === 0, lit(1L).cast(d)).otherwise(col("t")).as("tot"))
      nodes.join(raw, col("node") === col(keyCol), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          expr(s"CAST(coalesce(raw, CAST(0 AS $d)) * $Scale AS $d) div tot")
            .as(out))
    }
    var scores = nodes.select(col("node"), lit(Scale).as("hub_fp"))
    var result: DataFrame = null
    for (_ <- 1 to iters) {
      val authRaw = e.join(scores.select(col("node"), col("hub_fp")),
          col("src") === col("node"))
        .groupBy("dst").agg(sum(col("hub_fp").cast(d)).as("raw"))
      val auth = normalize(authRaw, "dst", "auth_fp").localCheckpoint()
      val hubRaw = e.join(auth.select(col("node").as("anode"), col("auth_fp")),
          col("dst") === col("anode"))
        .groupBy("src").agg(sum(col("auth_fp").cast(d)).as("raw"))
      val hub = normalize(hubRaw, "src", "hub_fp").localCheckpoint()
      scores = hub
      result = hub.join(auth.withColumnRenamed("node", "n2"),
          col("node") === col("n2"))
        .select(col("node"), col("hub_fp"), col("auth_fp"))
    }
    result
  }

  /** Personalized PageRank (topic-sensitive PageRank, Haveliwala
    * WWW'02): the same fixed-point integer recurrence as [[pageRank]],
    * but ALL reset mass returns to the SEED set — scores become
    * "importance relative to the seeds", the related-item/related-host
    * expansion that a global rank can't express (a globally central hub
    * scores high everywhere; PPR only ranks it high if it's reachable
    * from the seeds). Init: rank = Scale on seeds, 0 elsewhere; step:
    * {{{
    *   rank_fp'(v) = (seed(v)·15·Scale + 85·Σ contrib) div 100
    * }}}
    * All-integer, bit-identical across engines; the oracle unrolls the
    * same recurrence. Unreached nodes legitimately hold rank 0 and are
    * kept (the caller filters).
    *
    * 100 TB shape: identical to [[pageRank]] — per iteration one keyed
    * join of the pinned edge frame against ranks and one aggregation
    * onto dst, plus a broadcast-sized seed-indicator join folded into
    * the node frame ONCE up front; per-iteration `localCheckpoint` cuts
    * the doubling lineage. */
  def personalizedPageRank(
      edges: DataFrame, seeds: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst",
      seedCol: String = "node"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = e0.join(deg, Seq("src")).localCheckpoint() // re-read every iteration
    val seedSet = seeds.select(col(seedCol).as("node")).distinct()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .join(seedSet.withColumn("is_seed", lit(1L)), Seq("node"), "left")
      .na.fill(0L, Seq("is_seed"))
      .localCheckpoint() // re-read every iteration (carries the seed bit)
    var ranks = nodes.select(col("node"), (col("is_seed") * Scale).as("rank_fp"))
    for (_ <- 1 to iters) {
      val inbound = e.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("rank_fp div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("inmass"))
      ranks = nodes
        .join(inbound, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"(is_seed * 15 * $Scale + 85 * coalesce(inmass, 0L)) div 100")
            .as("rank_fp"))
        .localCheckpoint()
    }
    ranks
  }

  /** Exact per-node triangle counts on an undirected simple graph, via
    * the DEGREE-ORDERED wedge enumeration (the node-iterator of Suri &
    * Vassilvitskii, WWW'11 "Counting triangles and the curse of the last
    * reducer") — triadic closure is the clustering signal a curation
    * pipeline reads off its near-dup or co-occurrence graph: a dup pair
    * inside many triangles is a dense template cluster, not a chance
    * collision.
    *
    * Every undirected edge is directed from its LOWER-ranked endpoint to
    * its higher, ranking nodes by (degree, id). Each triangle {a,b,c}
    * then materializes as exactly ONE wedge b←a→c with rank(b)<rank(c)
    * plus the closing directed edge b→c — no triangle is double-counted
    * and none is missed, so this equals the naive triple-join (the
    * oracle, and TriangleCountSpec pins the equality on random graphs).
    *
    * Why this survives 100 TB where the naive u<v triple join dies:
    * wedges are generated per directed out-neighborhood, and directing
    * by degree bounds every out-degree by O(√m) — the star node that
    * makes id-ordered enumeration quadratic (the "last reducer") emits
    * nothing, because all its edges point INTO it. Three hash shuffles
    * total (degree agg, wedge self-join on the pivot, closure join on
    * the wedge endpoints); nothing is broadcast or collected. The edge
    * frame is pinned (`localCheckpoint`) because it feeds the degree
    * pass, both wedge sides, and the closure probe.
    */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint() // feeds degrees, both wedge sides, closure
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // rank = (deg, node): struct comparison gives the total order
    val ranked = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        struct(col("du").as("d"), col("u").as("n")).as("ru"), col("u"),
        struct(col("dv").as("d"), col("v").as("n")).as("rv"), col("v"))
    val dirE = ranked.select(
      when(col("ru") < col("rv"), col("u")).otherwise(col("v")).as("a"),
      when(col("ru") < col("rv"), col("rv")).otherwise(col("ru")).as("rb"),
      when(col("ru") < col("rv"), col("v")).otherwise(col("u")).as("b"))
    val wedges = dirE.as("e1").join(dirE.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.rb") < col("e2.rb"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tris = wedges.join(dirE.select(col("a").as("y"), col("b").as("z")),
      Seq("y", "z"), "left_semi")
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .join(deg.select("node"), Seq("node"), "right")
      .na.fill(0L, Seq("n_triangles"))
  }

  /** Label-propagation communities (Raghavan et al. 2007) with a FIXED
    * iteration count and a DETERMINISTIC mode rule: each node adopts the
    * most frequent label among its neighbors, ties broken by the
    * smallest label (count desc, label asc — the same integer ordering
    * trick every top-k gate uses), isolated nodes keep their own.
    * Community detection groups the link graph into topical/host
    * clusters for corpus curation (sample per community, cap dominant
    * ones) — coarser than [[Dedup.connectedComponents]] (which finds
    * exact reachability), denser than [[pageRank]] (which scores, not
    * groups).
    *
    * Deterministic by construction (integer counts, total tie order), so
    * the oracle unrolls the same recurrence as chained CTEs. Fixed
    * horizon, not convergence: LPA on synchronous updates can
    * oscillate; a fixed count keeps the gate exact, and callers compare
    * successive frames if they want a stopping rule.
    *
    * 100 TB shape: per iteration one join of the (pinned) undirected
    * edge list against current labels on the neighbor key and one
    * two-level aggregate collapsing to (node, label) counts — both hash
    * exchanges on graph keys, nothing broadcast or collected;
    * `localCheckpoint` per round cuts the doubling lineage exactly as
    * [[pageRank]] does. */
  def labelPropagation(
      edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v")).distinct()
    val und = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint() // re-read every iteration
    val nodes = und.select(col("u").as("node")).distinct().localCheckpoint()
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val neighborLabels = und
        .join(labels, col("v") === col("node"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("u").orderBy(col("cnt").desc, col("label").asc)
      val winner = neighborLabels
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("u").as("node"), col("label"))
      labels = nodes.join(winner, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** k-core peeling with a FIXED round count: each round drops every
    * node whose current degree is below `k` together with its incident
    * edges, then emits the survivors' degrees — the dense-subgraph
    * filter link-graph curation runs to separate well-embedded hosts
    * from stragglers (Seidman 1983's k-core; Batagelj–Zaveršnik gives
    * the sequential O(m) peel, this is the synchronous distributed
    * form). A fixed horizon rather than convergence detection keeps the
    * gate deterministic and the cost exactly R·(agg + two semi-joins) —
    * the [[pageRank]]/[[labelPropagation]] idiom; most graphs stabilize
    * in a few rounds (the gate's co-supply graph by round 3), and
    * callers wanting the true fixpoint iterate until the edge count
    * stops changing.
    *
    * Input edges are treated as UNDIRECTED: both orientations are added
    * and deduped, so degree = out-degree in the symmetrized frame.
    *
    * 100 TB shape: per round ONE partial-aggregated degree count and
    * two co-partitioned LEFT SEMI joins of the edge list against the
    * ≤|nodes| survivor frame — all hash exchanges on graph keys,
    * nothing broadcast-unbounded, nothing collected; `localCheckpoint`
    * per round cuts the doubling lineage. */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "need positive k and rounds")
    var e = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      e = e.join(keep, Seq("src"), "left_semi")
        .join(keep.select(col("src").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
        .localCheckpoint()
    }
    e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }

  /** Common-neighbor link prediction (Liben-Nowell & Kleinberg CIKM'03):
    * score every NON-adjacent pair (a < b) by the number of neighbors
    * the two nodes share, emitting the INTEGER ingredients
    * (n_common, deg_a, deg_b) — Jaccard (n_common / (deg_a + deg_b −
    * n_common)) and Adamic-Adar-style weightings are left to the
    * consumer; the counts carry strictly more information and no engine
    * ever divides or takes a log (house determinism rule). Training-data
    * use: proposing "same cluster?" candidate pairs between documents /
    * hosts that share many dedup-group or citation neighbors without
    * being directly linked themselves.
    *
    * Shape: each shared neighbor is a hub; pairs within a hub's sorted
    * neighbor array are emitted with the same codegen array
    * comprehension as [[Baskets.cooccurrence]] — collect the
    * neighborhood per hub (ONE keyed shuffle, map-side combined), emit
    * C(deg, 2) ordered pairs per hub, count per pair (second shuffle,
    * map-side combined), then LEFT ANTI the existing edge list (a < b
    * normalized, co-partitioned on the pair key) so only unlinked pairs
    * survive, and attach both endpoint degrees from the ≤|nodes| degree
    * frame.
    *
    * 100 TB shape: total emission is Σ min(deg, cap)² — `maxHubDegree`
    * bounds the mega-hub that would otherwise emit C(10⁶, 2) pairs
    * (a web-scale host graph is power-law; the cap keeps the smallest
    * `cap` neighbor ids, deterministically). The cap trades exactness
    * for survival exactly like [[Baskets.cooccurrence]]'s spam-basket
    * guard; the oracle gate runs uncapped on a bounded-degree graph.
    * Nothing is broadcast unboundedly, nothing collected; the edge
    * frame is pinned (`localCheckpoint`) because it feeds the
    * adjacency, the degree pass, and the anti-join. */
  def commonNeighborLinks(
      edges: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      maxHubDegree: Int = Int.MaxValue): DataFrame = {
    require(maxHubDegree >= 2, s"maxHubDegree must be >= 2: $maxHubDegree")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint() // feeds adjacency, degrees, and the anti-join
    val adj = und.select(col("u").as("hub"), col("v").as("nbr"))
      .unionAll(und.select(col("v").as("hub"), col("u").as("nbr")))
    val deg = adj.groupBy(col("hub").as("node")).agg(count(lit(1)).as("deg"))
    val counted = adj.groupBy("hub")
      .agg(slice(sort_array(collect_set(col("nbr"))), 1, maxHubDegree).as("_ns"))
      .filter(size(col("_ns")) >= 2)
      .select(explode(expr(
        """flatten(transform(_ns, (x, i) ->
          |  transform(slice(_ns, i + 2, size(_ns)), y -> struct(x AS a, y AS b))))"""
          .stripMargin)).as("_pair"))
      .select(col("_pair.a").as("a"), col("_pair.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
    counted
      .join(und.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), Seq("b"))
      .select("a", "b", "n_common", "deg_a", "deg_b")
  }

  /** Multi-source BFS: the exact hop distance from the nearest seed,
    * up to `maxHops` — "everything within k hops of the flagged set"
    * (contamination blast radius, spam neighborhoods, related-host
    * expansion in corpus curation). Output: (node, dist) for every
    * reached node, dist ∈ [0, maxHops]; unreached nodes are absent.
    *
    * Frontier-based, the textbook distributed BFS: round h joins ONLY
    * the round-(h−1) frontier against the edge list and anti-joins the
    * visited set, so total work is Σ |frontier_h ⋈ edges| — each edge is
    * relaxed at most twice over the whole run (once per endpoint's
    * first visit), NOT per round; a naive "join everything each round"
    * re-relaxes the whole graph maxHops times. First visit = minimum
    * distance by induction, so no min-aggregate pass is needed.
    *
    * 100 TB shape: per round one co-partitioned join (frontier ⋈ edges
    * on the node key) and one anti-join against visited — both keyed
    * exchanges, nothing broadcast unboundedly, nothing collected.
    * `localCheckpoint` per round cuts the doubling lineage (the
    * [[Dedup.connectedComponents]] discipline); the visited frame grows
    * monotonically to ≤|nodes|. */
  def khopDistances(
      edges: DataFrame, seeds: DataFrame, maxHops: Int,
      srcCol: String = "src", dstCol: String = "dst",
      seedCol: String = "node"): DataFrame = {
    require(maxHops >= 0, s"maxHops must be non-negative: $maxHops")
    val und = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint() // re-read every round
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = dist
    var h = 1
    while (h <= maxHops && !frontier.isEmpty) {
      val next = frontier.select(col("node").as("src"))
        .join(und, Seq("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(h.toLong).as("dist"))
        .localCheckpoint()
      dist = dist.unionAll(next).localCheckpoint()
      frontier = next
      h += 1
    }
    dist
  }
}
