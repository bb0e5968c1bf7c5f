package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized cross-checks of the round-5 operators against brute-force
  * in-memory reference models (deterministic seeds, like
  * AppendStateMachineSpec): the DuckDB gate pins ONE dataset; these pin
  * the semantics over many random shapes — duplicate timestamps, empty
  * keys, single-row chunks, oversized costs. */
class PipelineOpsPropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("asOf matches the brute-force nearest-earlier model on random inputs") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(seed)
      val nKeys = 1 + rnd.nextInt(5)
      val left = (0 until 200).map { i =>
        (i.toLong, rnd.nextInt(nKeys).toString, rnd.nextInt(50).toLong)
      } // (id, key, ts)
      // right: unique per (key, ts) as the operator requires
      val right = rnd.shuffle(
        (for (k <- 0 until nKeys; t <- 0 until 50) yield (k.toString, t.toLong))
          .toVector).take(60)
        .map { case (k, t) => (k, t, rnd.nextInt(1000).toLong) } // (key, rts, v)

      val expected: Map[Long, Option[Long]] = left.map { case (id, k, ts) =>
        val candidates = right.filter(r => r._1 == k && r._2 <= ts)
        id -> (if (candidates.isEmpty) None
               else Some(candidates.maxBy(_._2)._3))
      }.toMap

      val out = AsOfJoin.asOf(
          left.toDF("id", "k", "ts"), right.toDF("k", "rts", "v"),
          Seq("k"), "ts", "rts", Seq("v"))
        .select("id", "asof_v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(out === expected, s"[seed $seed]")
    }
  }

  test("assignBins matches the sequential packing model on random costs") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(100 + seed)
      val budget = 10L + rnd.nextInt(40)
      val chunkSize = 1L + rnd.nextInt(30)
      // sparse, shuffled ids: chunks of varying fill, some singleton
      val rows = rnd.shuffle(
        (0 until 300).filter(_ => rnd.nextBoolean()).toVector)
        .map(i => (i.toLong, 1L + rnd.nextInt((2 * budget).toInt)))

      val expected: Map[Long, Long] = rows.sortBy(_._1)
        .groupBy { case (id, _) => id / chunkSize }
        .flatMap { case (chunk, inChunk) =>
          var cum = 0L
          inChunk.sortBy(_._1).map { case (id, cost) =>
            cum += cost
            id -> (chunk * Packing.BinStride + (cum - 1) / budget)
          }
        }

      val out = Packing.assignBins(
          rows.toDF("id", "cost").repartition(7), "id", "cost", budget, chunkSize)
        .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === expected, s"[seed $seed, budget $budget, chunk $chunkSize]")
    }
  }

  test("stratifiedSample equals the hash-order model and never exceeds quotas") {
    (0 until 3).foreach { seed =>
      val rnd = new Random(200 + seed)
      val rows = (0 until 400).map(i => (i.toLong, rnd.nextInt(6).toString))
      val quota = 1 + rnd.nextInt(30)

      def hashOf(id: Long): String = {
        val d = java.security.MessageDigest.getInstance("MD5")
        d.digest(s"strat:$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      }
      val expected = rows.groupBy(_._2).flatMap { case (_, group) =>
        group.sortBy { case (id, _) => (hashOf(id), id) }.take(quota)
      }.map(_._1).toSet

      val out = Sampling.stratifiedSample(
          rows.toDF("id", "g").repartition(5), "g", "id", quota)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(out === expected, s"[seed $seed, quota $quota]")
    }
  }

  test("connected components match brute-force union-find on random graphs") {
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // component = min vertex id; only vertices that appear in edges
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      touched.map(v => v -> {
        var r = find(v.toInt); r.toLong
      }).toMap
    }
    (0 until 5).foreach { seed =>
      val rnd = new Random(seed)
      val n = 10 + rnd.nextInt(40)
      val m = 5 + rnd.nextInt(3 * n)
      val edges = (0 until m).map { _ =>
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        if (a == b) (a.toLong, ((b + 1) % n).toLong) else (a.toLong, b.toLong)
      }
      val expected = unionFind(n, edges)
      val out = Dedup.connectedComponents(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === expected, s"[seed $seed, n=$n, m=$m]")
    }
  }

  test("connected components converge on a long chain (pointer-jumping depth)") {
    // a 150-hop path: plain neighbor-min needs ~150 rounds; the jump step
    // must bring it inside the default round budget
    val chain = (0L until 150L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 151)
    assert(out.values.forall(_ === 0L), "every chain vertex must reach component 0")
  }

  test("dedupSpans matches the brute-force span-coverage model on random corpora") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(300 + seed)
      val n = 2 + rnd.nextInt(3) // span length 2-4
      val vocab = Vector("a", "b", "c", "d") // tiny vocab forces collisions
      val docs = (0 until 30).map { id =>
        val len = 1 + rnd.nextInt(12)
        (id.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }

      // model: spans → (owner, docs containing); covered positions in
      // non-owner docs; kept = words at uncovered positions
      val spansOf = docs.map { case (id, t) =>
        val ws = t.split(" ")
        id -> ws.sliding(n).zipWithIndex.collect {
          case (s, i) if s.length == n => (s.mkString(" "), i)
        }.toVector
      }.toMap
      val bySpan = spansOf.toVector
        .flatMap { case (id, ss) => ss.map { case (s, _) => (s, id) } }
        .groupBy(_._1).map { case (s, rows) =>
          s -> (rows.map(_._2).distinct.sorted, rows.map(_._2).min)
        }
      val expected = docs.map { case (id, t) =>
        val ws = t.split(" ")
        val flagged = spansOf(id).filter { case (s, _) =>
          val (docIds, owner) = bySpan(s); docIds.size >= 2 && owner != id
        }
        val covered = flagged.flatMap { case (_, i) => i until (i + n) }.toSet
        val keptText = ws.zipWithIndex.collect {
          case (w, i) if !covered.contains(i) => w
        }.mkString(" ")
        id -> ((keptText, covered.size.toLong, flagged.size.toLong))
      }.toMap

      val out = TextCorpus.dedupSpans(
          docs.toDF("doc_id", "text").repartition(5), n = n, minDocs = 2)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(out === expected, s"[seed $seed, n $n]")
    }
  }

  test("scd2Intervals matches the sequential run-collapse model on random logs") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(300 + seed)
      val nUsers = 1 + rnd.nextInt(6)
      val log = (0 until 250).map { i =>
        (rnd.nextInt(nUsers).toLong, i.toLong, s"v${rnd.nextInt(4)}")
      }
      // reference model: per user, ordered scan collapsing equal runs
      val expected = log.groupBy(_._1).flatMap { case (u, rows) =>
        val ordered = rows.sortBy(_._2)
        val runs = scala.collection.mutable.Buffer.empty[(String, Long, Long)] // (v, from, n)
        ordered.foreach { case (_, ord, v) =>
          if (runs.nonEmpty && runs.last._1 == v)
            runs(runs.length - 1) = (v, runs.last._2, runs.last._3 + 1)
          else runs += ((v, ord, 1L))
        }
        runs.zipWithIndex.map { case ((v, from, n), i) =>
          val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
          (u, v, from, to, n, if (to.isEmpty) 1L else 0L)
        }
      }.toSet

      val out = Behavioral.scd2Intervals(
          log.toDF("user_id", "event_id", "event_type").repartition(7),
          "user_id", "event_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4), r.getLong(5)))
        .toSet
      assert(out === expected, s"[seed $seed]")
      // intervals tile the log: per-user row counts sum to the log size
      assert(out.toSeq.map(_._5).sum === 250L, s"[seed $seed] rows lost or duplicated")
    }
  }

  test("transitionCounts matches the sequential pair model on random logs") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(400 + seed)
      val nUsers = 1 + rnd.nextInt(5)
      val log = (0 until 200).map { i =>
        (rnd.nextInt(nUsers).toLong, i.toLong, s"t${rnd.nextInt(3)}")
      }
      val pairs = log.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val o = rows.sortBy(_._2).map(_._3)
        o.zip(o.drop(1))
      }
      val counts = pairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      val fromTotals = pairs.groupBy(_._1).map { case (f, xs) => f -> xs.size.toLong }
      val expected = counts.map { case ((f, t), c) =>
        (f, t) -> ((c, c * 1000000L / fromTotals(f)))
      }

      val out = Behavioral.transitionCounts(
          log.toDF("user_id", "event_id", "event_type").repartition(9),
          "user_id", "event_id", "event_type")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
      assert(out === expected, s"[seed $seed]")
    }
  }

  test("weightedSample equals the k smallest hash-div-weight priorities on random weights") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(500 + seed)
      val rows = (0 until 150).map(i => (i.toLong, 1L + rnd.nextInt(1000)))
      val k = 1 + rnd.nextInt(60)
      def hash60(id: Long): Long = {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"wsamp:$id".getBytes("UTF-8"))
        (h.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))) >>> 4
      }
      val expected = rows.map { case (id, w) => (hash60(id) / w, id) }
        .sorted.take(k).map(_._2).toSet
      val out = Sampling.weightedSample(rows.toDF("id", "w").repartition(6), "id", "w", k)
        .collect().map(_.getLong(0)).toSet
      assert(out === expected, s"[seed $seed, k $k]")
    }
  }

  test("rollingSumByTime matches the brute-force trailing-window model on random events") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(300 + seed)
      val window = 1L + rnd.nextInt(30)
      val rows = (0 until 200).map { i =>
        (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(60).toLong, // dup ts likely
          (rnd.nextInt(2000) - 1000).toDouble / 4.0) // negative + exact quarters
      } // (k, id, ts, v)
      val expected: Map[Long, (Double, Long)] = rows.map { case (k, id, ts, _) =>
        val in = rows.filter(r => r._1 == k && r._3 >= ts - window && r._3 <= ts)
        // quarters sum exactly in double, so the reference sum is exact
        id -> (in.map(_._4).sum, in.size.toLong)
      }.toMap
      val out = Stats.rollingSumByTime(
          rows.toDF("k", "id", "ts", "v").repartition(7), "k", "id", "ts", "v", window)
        .collect().map(r => r.getLong(1) -> (r.getDouble(4), r.getLong(5))).toMap
      assert(out === expected, s"[seed $seed, window $window]")
    }
  }

  test("kCore peeled to stability equals the sequential peel fixpoint on random graphs") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(400 + seed)
      val k = 2 + rnd.nextInt(3)
      val edges = (0 until 120).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter(e => e._1 != e._2).distinct
      // sequential reference: peel until no change (the true k-core)
      var adj = edges.flatMap(e => Seq(e, e.swap)).distinct
      var changed = true
      while (changed) {
        val deg = adj.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = adj.filter(e => keep(e._1) && keep(e._2))
        changed = next.size != adj.size
        adj = next
      }
      val expected = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      // enough synchronous rounds always reach the fixpoint
      val out = Graph.kCore(edges.toDF("src", "dst").repartition(5), k, rounds = 25)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === expected, s"[seed $seed, k $k]")
    }
  }

  test("paretoFrontier matches brute-force dominance on duplicate-heavy random sets") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(500 + seed)
      val rows = (0 until 150).map(i =>
        ("g" + rnd.nextInt(3), i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
      val expected = rows.filter { case (g, _, x, y) =>
        !rows.exists { case (g2, _, x2, y2) =>
          g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
      }.map(_._2).toSet
      val out = Skyline.paretoFrontier(
          rows.toDF("g", "id", "x", "y").repartition(4), "g", "id", "x", "y")
        .collect().map(_.getLong(1)).toSet
      assert(out === expected, s"[seed $seed]")
    }
  }

  test("containmentPairs is lossless vs brute force on random corpora") {
    (0 until 4).foreach { seed =>
      val rnd = new Random(700 + seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "epsi", "zeta",
        "etaa", "thet", "iota", "kapp")
      // docs with heavy overlap: random word sequences plus planted
      // prefixes/excerpts so containment pairs actually exist
      val bases = (0 until 12).map { i =>
        (0 until (5 + rnd.nextInt(15))).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val excerpts = bases.take(4).map(t => t.substring(0, math.max(8, t.length / 2)))
      val texts = bases ++ excerpts
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val (tn, td) = Seq((7, 10), (8, 10), (9, 10))(rnd.nextInt(3))
      val fast = Dedup.containmentPairs(docs, "text", "doc_id",
          tNum = tn, tDen = td, shingleSize = 4)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sh = docs.select(col("doc_id"),
          Dedup.shingleHashes(col("text"), 4).as("sh"))
        .as[(Long, Seq[Long])].collect().toMap
      val brute = (for {
        a <- sh.keys; b <- sh.keys if a != b
        inter = sh(a).toSet.intersect(sh(b).toSet).size
        if inter.toLong * td >= sh(a).size.toLong * tn
      } yield (a, b)).toSet
      assert(fast === brute, s"[seed $seed t=$tn/$td]")
    }
  }

  test("mannWhitneyU matches the brute-force pair-counting model on random tied data") {
    // U_A = #{(x in A, y in B): x > y} + 0.5 * #{ties}; doubled to stay
    // integer. Heavy tie mass on purpose (values drawn from 0..9).
    (0 until 5).foreach { seed =>
      val rnd = new Random(300 + seed)
      val a = Vector.fill(20 + rnd.nextInt(60))(rnd.nextInt(10).toLong)
      val b = Vector.fill(20 + rnd.nextInt(60))(rnd.nextInt(10).toLong)
      val u2aBrute = a.iterator.map { x =>
        2L * b.count(x > _) + b.count(x == _)
      }.sum
      val u2bBrute = 2L * a.size * b.size - u2aBrute
      val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
      val r = Stats.mannWhitneyU(df, "g", "v", "a", "b").head()
      assert((r.getLong(0), r.getLong(1), r.getDecimal(2).longValueExact(),
        r.getDecimal(3).longValueExact()) ===
        ((a.size.toLong, b.size.toLong, u2aBrute, u2bBrute)), s"[seed $seed]")
    }
  }

  test("knBigramModel: probabilities sum to exactly 1 over the full vocab (interpolation identity)") {
    // Interpolated KN is a proper distribution: for every context w1,
    // sum over ALL w2 of p(w2|w1) = 1, where an unseen (w1,w2) gets the
    // pure continuation term D * N1+(w1.)/c(w1.) * pcont(w2). Checked in
    // exact BigInt rationals over a random corpus (alphabet of 6, so
    // unseen pairs are common).
    (0 until 3).foreach { seed =>
      val rnd = new Random(400 + seed)
      val words = Vector("a", "b", "c", "d", "e", "f")
      val text = Vector.fill(120)(words(rnd.nextInt(words.size))).mkString(" ")
      val m = Lexical.knBigramModel(Seq((1L, text)).toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((BigInt(r.getDecimal(3).toBigInteger), BigInt(r.getDecimal(4).toBigInteger))))
        .toMap
      // rebuild the count tables the same way the operator defines them
      val toks = text.split("\\s+").toVector
      val bigrams = toks.sliding(2).map(p => (p(0), p(1))).toVector
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val c1 = bigrams.groupBy(_._1._1).map { case (w, m2) => w -> m2.values.sum }
      val nFollow = bigrams.keys.groupBy(_._1).map { case (w, ks) => w -> ks.size.toLong }
      val nPrec = bigrams.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
      val nTypes = bigrams.size.toLong
      c1.keys.foreach { w1 =>
        val den = BigInt(4) * c1(w1) * nTypes
        // observed mass from the operator's own output
        val seen = words.flatMap(w2 => m.get((w1, w2))).map { case (n, d) =>
          assert(den == d); n
        }.sum
        // unseen mass: 3 * N1+(w1.) * N1+(.w2) over w2 with no (w1,w2)
        val unseen = words.filterNot(w2 => m.contains((w1, w2)))
          .map(w2 => BigInt(3) * nFollow(w1) * BigInt(nPrec.getOrElse(w2, 0L))).sum
        assert(seen + unseen == den,
          s"[seed $seed] p(.|$w1) sums to ${seen + unseen}/$den, not 1")
      }
    }
  }

  test("pairwiseClusterEval matches brute-force pair sets on random assignments") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(500 + seed)
      val n = 30 + rnd.nextInt(120)
      val rows = (0L until n.toLong).map(i =>
        (i, rnd.nextInt(8).toLong, rnd.nextInt(6).toLong))
      def pairsBy(f: ((Long, Long, Long)) => (Long, Long)): Set[(Long, Long)] =
        (for {
          x <- rows; y <- rows if x._1 < y._1 && f(x) == f(y)
        } yield (x._1, y._1)).toSet
      val pred = pairsBy(r => (r._2, 0L))
      val gold = pairsBy(r => (r._3, 0L))
      val tp = pred.intersect(gold)
      val r = Validation.pairwiseClusterEval(
        rows.toDF("id", "pred", "gold"), "id", "pred", "gold").head()
      def dec(i: Int) = r.getDecimal(i).longValueExact()
      assert((r.getLong(0), dec(1), dec(2), dec(3), dec(4), dec(5)) ===
        ((n.toLong, pred.size.toLong, gold.size.toLong, tp.size.toLong,
          (pred.size - tp.size).toLong, (gold.size - tp.size).toLong)),
        s"[seed $seed]")
    }
  }

  test("chiSquareDrift matches the brute-force Pearson model on random category mixes") {
    (0 until 5).foreach { seed =>
      val rnd = new Random(700 + seed)
      val cats = Vector("a", "b", "c", "d", "e")
      // skewed, partially-disjoint category draws on both sides
      val aSide = Vector.fill(30 + rnd.nextInt(100))(cats(rnd.nextInt(4)))
      val bSide = Vector.fill(30 + rnd.nextInt(100))(cats(1 + rnd.nextInt(4)))
      val got = Stats.chiSquareDrift(
          aSide.toDF("c"), bSide.toDF("c"), "c").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          BigInt(r.getDecimal(3).toBigInteger),
          BigInt(r.getDecimal(4).toBigInteger), r.getLong(5)))).toMap
      val na = BigInt(aSide.size); val nb = BigInt(bSide.size)
      (aSide ++ bSide).distinct.foreach { c =>
        val oa = BigInt(aSide.count(_ == c)); val ob = BigInt(bSide.count(_ == c))
        val num = (oa * nb - ob * na).pow(2)
        val den = na * nb * (oa + ob)
        val ppm = (num / den) * 1000000 + (num % den) * 1000000 / den
        assert(got(c) === ((oa.toLong, ob.toLong, num, den, ppm.toLong)),
          s"[seed $seed cat $c]")
      }
      // Σ term_ppm tracks the float chi2 within rounding (k terms → k ppm floors)
      val chi2Float = (aSide ++ bSide).distinct.map { c =>
        val oa = aSide.count(_ == c).toDouble; val ob = bSide.count(_ == c).toDouble
        math.pow(oa * nb.toDouble - ob * na.toDouble, 2) /
          (na.toDouble * nb.toDouble * (oa + ob))
      }.sum
      val chi2Fp = got.values.map(_._5).sum / 1e6
      assert(math.abs(chi2Float - chi2Fp) < got.size * 1e-6 + 1e-9, s"[seed $seed]")
    }
  }

  test("poissonBootstrapSums matches the MessageDigest brute-force draw, and weights behave") {
    def md5u(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val cdf = Seq(367879L, 735758L, 919698L, 981011L, 996340L,
      999405L, 999916L, 999989L, 999998L, 999999L)
    def weight(u: Long): Long =
      cdf.indexWhere(u < _) match { case -1 => 10L; case k => k.toLong }

    val rnd = new Random(42)
    val rows = (0L until 200L).map(i =>
      (i, if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(1000).toLong))
    val got = Sampling.poissonBootstrapSums(
        rows.toDF("id", "g", "v"), "g", "v", "id", b = 8, salt = "t")
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val expected = (for {
      b <- 0 until 8
      (id, g, v) <- rows
    } yield (b, g, weight(md5u(s"t#$b:$id")), v))
      .groupBy { case (b, g, _, _) => (b, g) }
      .map { case (k, vs) =>
        k -> ((vs.size.toLong, vs.map(_._3).sum, vs.map(t => t._3 * t._4).sum))
      }
    assert(got === expected)
    // sanity: total replicate mass ≈ n (Poisson(1) mean 1) — loose band
    val totalW = got.values.map(_._2).sum
    assert(totalW > 8 * 200 * 7 / 10 && totalW < 8 * 200 * 13 / 10,
      s"weight mass $totalW implausible for 1600 draws of Poisson(1)")
  }

  test("prototypeDistances matches the brute-force assignment/median/flag model") {
    (0 until 3).foreach { seed =>
      val rnd = new Random(800 + seed)
      val dim = 3
      val n = 20 + rnd.nextInt(30)
      val vecs = (0L until n.toLong).map(i =>
        (i, Vector.fill(dim)((rnd.nextInt(41) - 20).toFloat)))
      val k = 3
      val got = Clustering.prototypeDistances(
          vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
          k = k, kNum = 3L, kDen = 2L).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1),
          BigDecimal(r.getDecimal(2)), r.getBoolean(4)))).toMap
      // brute force in BigDecimal — the operator's decimal-sum contract
      def d2(v: Vector[Float], c: Vector[Float]): BigDecimal =
        v.zip(c).map { case (x, y) =>
          BigDecimal((x.toDouble - y.toDouble) * (x.toDouble - y.toDouble))
            .setScale(10, BigDecimal.RoundingMode.HALF_UP)
        }.sum
      val seeds = vecs.take(k).map(_._2)
      val assign = vecs.map { case (id, v) =>
        val ds = seeds.zipWithIndex.map { case (c, ci) => (d2(v, c), ci.toLong) }
        val best = ds.minBy(identity)
        (id, best._2, best._1)
      }
      val medByC = assign.groupBy(_._2).map { case (c, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._1))
        c -> sorted((sorted.size + 1) / 2 - 1)._3
      }
      assign.foreach { case (id, c, dist) =>
        val (gc, gd, gf) = got(id)
        assert(gc === c, s"[seed $seed id $id] cluster")
        assert(gd === dist, s"[seed $seed id $id] distance")
        assert(gf === (dist * 2 > medByC(c) * 3), s"[seed $seed id $id] flag")
      }
    }
  }
}
