package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators._
import graft.streaming.{EventTimeOps, StatefulOps}

/** Warehouse/CDC analytics, entity resolution, exact feature statistics, weighted sampling.
  *
  * One gate trait of [[SparkEntry]] (round-11 split of the single-file
  * registry): the operator defs, their `queries` entries, and their
  * DuckDB oracle twins travel together; SparkEntry composes the maps. */
private[graft] trait WarehouseGates extends GateSupport {

  // ==================================================================
  // Round-8 additions: warehouse/CDC analytics, entity resolution,
  // exact feature statistics, weighted sampling
  // ==================================================================

  import graft.operators.{Behavioral, FuzzyJoin}

  /** SCD2 validity intervals ([[graft.operators.Behavioral.scd2Intervals]])
    * over the events log: per user, consecutive equal event_type runs
    * collapsed to [valid_from, valid_to) in event_id order. */
  protected def scd2Intervals(s: SparkSession, dir: String): DataFrame =
    Behavioral.scd2Intervals(t(s, dir, "events"), "user_id", "event_id", "event_type")
      .orderBy("user_id", "valid_from")

  /** Point-in-time SCD2 lookup ([[graft.operators.Behavioral
    * .pointInTime]]): each purchase annotated with the user's state —
    * the current interval of the SCD2 dimension built from their
    * NON-purchase activity — at the purchase's position. Contiguous
    * intervals reduce the range membership to an as-of rule, so the
    * oracle is DuckDB's native ASOF JOIN over the same dimension CTE. */
  protected def scd2PointLookup(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val dim = Behavioral.scd2Intervals(
      ev.filter(col("event_type") =!= "purchase"), "user_id", "event_id", "event_type")
    val facts = ev.filter(col("event_type") === "purchase").select("event_id", "user_id")
    Behavioral.pointInTime(facts, dim, "user_id", "event_id", "event_type")
      .select(col("event_id"), col("user_id"),
        coalesce(col("dim_event_type"), lit("none")).as("state_at_purchase"))
      .orderBy("event_id")
  }

  /** First-order Markov transition counts + integer-ppm conditional
    * probabilities ([[graft.operators.Behavioral.transitionCounts]]). */
  protected def eventTransitions(s: SparkSession, dir: String): DataFrame =
    Behavioral.transitionCounts(t(s, dir, "events"), "user_id", "event_id", "event_type")
      .orderBy("from_type", "to_type")

  /** Streaming transition extraction ([[graft.streaming.StatefulOps
    * .transitionPairsWithState]]) in BATCH mode, grouped to the Markov
    * matrix — same output as `event_transitions` (per-user ts order
    * equals event_id order in this data), so the gate shares that
    * oracle; the cross-batch incremental behavior is pinned in
    * StatefulStreamingSpec. */
  protected def transitionStateBatch(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StatefulOps
    val pairs = StatefulOps.transitionPairsWithState(
      StatefulOps.typedEvents(eventsNs(s, dir)))
    pairs.toDF("user_id", "from_type", "to_type")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("transitions"))
      .withColumn("prob_ppm",
        expr("transitions * 1000000L div sum(transitions) over (partition by from_type)"))
      .orderBy("from_type", "to_type")
  }

  /** Blocked fuzzy entity matching ([[graft.operators.FuzzyJoin
    * .editDistancePairs]]): part-name pairs within 2 Levenshtein edits,
    * blocked on the noun (second token) so the quadratic compare never
    * leaves a block.
    *
    * Bench note (sf0.1, measured ~5.5 s round 8): the DP itself is 112
    * distinct name pairs (~nothing); the cost is expanding and then
    * determinism-sorting the ~2.4M matching record pairs the 64
    * heavily-repeated fixture names produce — the operator's own output
    * size, not a plan defect — and the plan is all-broadcast
    * (PlanShapeSpec pins it). */
  protected def fuzzyNamePairs(s: SparkSession, dir: String): DataFrame = {
    // minDist = 1: identical names are exact-dedup's find (at sf0.1 they
    // alone expand to ~3.1M record pairs), so the gate measures the
    // near-match band the operator exists for. The gate stays OUTPUT-
    // bound even so: the synthetic fixture's 64 names are mutually near
    // (dist ∈ [1,2] expands to ~2.4M record pairs), so the ~6 s at sf0.1
    // is materialization + presentation sort of the answer itself —
    // DuckDB needs ~10 s for the identical query. Real name columns are
    // sparser; candidate volume, not the DP, is the knob that matters.
    val part = t(s, dir, "part")
    FuzzyJoin.editDistancePairs(part, "p_partkey", "p_name",
        blockKey = split(col("p_name"), " ").getItem(1), maxDist = 2, minDist = 1)
      .orderBy("id_a", "id_b")
  }

  /** Golden-record survivorship ([[FuzzyJoin.goldenRecords]]): the
    * fuzzy name clusters collapsed to one canonical part each —
    * longest name wins, ties by name then id; singletons kept. */
  protected def goldenRecordsQuery(s: SparkSession, dir: String): DataFrame =
    FuzzyJoin.goldenRecords(t(s, dir, "part"), "p_partkey", "p_name",
        blockKey = split(col("p_name"), " ").getItem(1), maxDist = 2)
      .orderBy("survivor_id")

  /** Deterministic weighted sample ([[graft.operators.Sampling
    * .weightedSample]]): 500 documents drawn ∝ n_chars by salted
    * hash-priority — sampling ∝ length for a training mix. */
  protected def weightedSampleQuery(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(t(s, dir, "documents"), "doc_id", "n_chars", k = 500)
      .orderBy("priority", "doc_id")

  /** Exact-moment Pearson correlation matrix
    * ([[graft.operators.Stats.corrMatrix]]) over lineitem's numeric
    * measures — integer moments, pair-wise common downscale, one fixed
    * IEEE op sequence; see the operator doc for the cross-engine
    * determinism argument. */
  protected def corrMatrixQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    Stats.corrMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("col_a", "col_b")
  }

  /** Per-source winsorization of document lengths
    * ([[graft.operators.Stats.winsorize]]): clip n_chars into the
    * [p05, p95] rank-quantile band of its own source. */
  protected def winsorizedValues(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Stats
    Stats.winsorize(t(s, dir, "documents"), "source", "doc_id", "n_chars",
        pLo = 0.05, pHi = 0.95)
      .orderBy("source", "doc_id")
  }

  /** Z-order codes ([[graft.sources.ZOrder.mortonCode]]) over
    * lineitem's (part, supplier) keys — the multi-dimensional
    * data-skipping sort key ([[graft.sources.ZOrder.writeZOrdered]]
    * lays files out along it; ZOrderSpec proves the per-file
    * bounding-box property). Pure integer bit arithmetic ⇒ exact. */
  protected def zorderCodes(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        graft.sources.ZOrder.mortonCode(col("l_partkey"), col("l_suppkey")).as("zcode"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Two-round deterministic Lloyd k-means
    * ([[graft.operators.Clustering.kmeansTwoRounds]]) over the
    * embeddings table, k=4 seeded by the four lowest vec_ids; emits both
    * rounds' assignments per vector. */
  protected def kmeansAssign(s: SparkSession, dir: String): DataFrame =
    graft.operators.Clustering
      .kmeansTwoRounds(t(s, dir, "embeddings"), "vec_id", "embedding", k = 4)
      .orderBy("vec_id")

  /** Prototype-distance pruning facts ([[graft.operators.Clustering
    * .prototypeDistances]], the Sorscher et al. data-pruning rank):
    * per vector its seed assignment, exact decimal distance, cluster
    * lower-median distance, and the 1.5×-median `is_far` flag —
    * decimals rendered as strings at the gate boundary. */
  protected def prototypeDistGate(s: SparkSession, dir: String): DataFrame =
    graft.operators.Clustering.prototypeDistances(
        t(s, dir, "embeddings"), k = 4, kNum = 3L, kDen = 2L)
      .withColumn("dist2", col("dist2").cast("string"))
      .withColumn("med2", col("med2").cast("string"))
      .orderBy("vec_id")

  /** 20-bin equi-width price histogram
    * ([[graft.operators.Stats.equiWidthHistogram]]) over lineitem. */
  protected def priceHistogram(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats
      .equiWidthHistogram(t(s, dir, "lineitem").select("l_extendedprice"),
        "l_extendedprice", bins = 20)
      .orderBy("bin")

  /** Per-user EWMA of the last 8 event values
    * ([[graft.operators.Stats.ewmaLastN]]; α = ½ so every weight is an
    * exact binary power). */
  protected def ewmaUserValue(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats
      .ewmaLastN(t(s, dir, "events"), "user_id", "ts", "event_id", "value", nMax = 8)
      .orderBy("user_id")

  /** Time-weighted average ([[graft.operators.Stats.timeWeightedAvg]])
    * of each user's value gauge — the step-function time integral that
    * an event-weighted mean gets wrong when sampling density tracks
    * value; exact integers, TWAP = num/den downstream. */
  protected def timeWeightedValue(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.timeWeightedAvg(
        t(s, dir, "events").select(
          col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          col("event_id"),
          (col("value").cast("decimal(30,6)") * 1000000L).cast("long")
            .as("v_us")),
        "user_id", "ts_us", "event_id", "v_us")
      // gate boundary: wide decimal renders as strings (house style)
      .withColumn("twap_num", col("twap_num").cast("string"))
      .orderBy("user_id")

  /** Per-source Pareto frontier ([[graft.operators.Skyline
    * .paretoFrontier]]) on (token count, distinct-token count) — the
    * "keep the best length/richness trade-offs" selection. */
  protected def paretoDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("x"),
      size(filter(array_distinct(split(lower(trim(col("text"))), "[^a-z0-9]+")),
        tk => tk =!= "")).cast("long").as("y"))
    graft.operators.Skyline.paretoFrontier(d, "source", "doc_id", "x", "y")
      .orderBy("source", "doc_id")
  }

  /** Top-30 BPE merge candidates ([[graft.operators.TextCorpus
    * .bpePairCounts]]): adjacent character pairs weighted by word
    * frequency — the corpus-scale inner step of tokenizer training. */
  protected def bpePairCountsQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextCorpus.bpePairCounts(t(s, dir, "documents"), "text", topN = 30)

  /** Character Simpson diversity
    * ([[graft.functions.CharDiversity]]): per-doc letter counts and the
    * 1 − Σc²/n² diversity index — the no-logarithm entropy cousin, exact
    * in one double division. */
  protected def charDiversityQuery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.CharDiversity.charDiversity(col("text")).as("cd"))
      .select(col("doc_id"),
        col("cd.n_alpha").as("n_alpha"),
        col("cd.c2_sum").as("c2_sum"),
        (lit(1.0) - col("cd.c2_sum").cast("double")
          / (col("cd.n_alpha") * col("cd.n_alpha")).cast("double")).as("simpson"))
      .orderBy("doc_id")

  /** Per-user × event-type running counts via Spark 4's arbitrary-state
    * API ([[graft.streaming.TransformWithStateOps.typeCountsWithState]]
    * — MapState, delta-proportional state I/O). Batch mode runs the
    * processor over empty state, so the result is exactly the grouped
    * count the oracle states; the incremental Update-mode behavior is
    * pinned by TransformWithStateSpec. */
  protected def twsTypeCounts(s: SparkSession, dir: String): DataFrame =
    graft.streaming.TransformWithStateOps
      .typeCountsWithState(graft.streaming.StatefulOps.typedEvents(t(s, dir, "events")))
      .toDF()
      .select(col("userId").as("user_id"), col("eventType").as("event_type"), col("n"))
      .orderBy("user_id", "event_type")

  /** 12-core of the March-1995 co-supply graph
    * ([[graft.operators.Graph.kCore]], 3 peel rounds — the graph
    * stabilizes by round 3): surviving nodes with their final degrees. */
  protected def kcoreNodes(s: SparkSession, dir: String): DataFrame = {
    val march = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-03-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_orderkey").as("ok"))
    val li = t(s, dir, "lineitem").select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .join(march, Seq("ok"))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
      .select(col("a.sk").as("src"), col("b.sk").as("dst"))
    graft.operators.Graph.kCore(e, k = 12, rounds = 3).orderBy("node")
  }

  /** Per-event-type inter-arrival gap quantiles (lag diff in exact
    * micros, then [[graft.operators.Stats.groupedQuantiles]]'s rank
    * rule) — the cadence profile behind trigger-interval and watermark
    * tuning. */
  protected def interarrivalStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val gaps = eventsNs(s, dir)
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), expr("(ts - prev) div 1000").as("gap_us"))
    graft.operators.Stats.groupedQuantiles(gaps, "event_type", "gap_us",
        ps = Seq(0.5, 0.9))
      .orderBy("event_type", "p")
  }

  /** Hourly LOCF grid of each user's value ([[graft.operators.Resample
    * .locfGrid]]): the irregular event log resampled to a dense per-user
    * hourly series with gaps carried forward — every exchange keyed,
    * per-key bounded sort, grid-sized (output-bound) explode. The
    * oracle rebuilds the grid with unnest(generate_series) and DuckDB's
    * IGNORE NULLS window. */
  protected def resampleLocf(s: SparkSession, dir: String): DataFrame =
    graft.operators.Resample.locfGrid(
        eventsNs(s, dir).select(col("user_id"), col("ts"), col("event_id"), col("value")),
        "user_id", "ts", "value", "event_id",
        step = 3600L * 1000000000L)
      .orderBy("user_id", "bucket")

  /** 24-hour trailing rolling sum of each user's event values
    * ([[graft.operators.Stats.rollingSumByTime]]) — continuous sliding
    * semantics at every event, vs `windowed_stats`' tumbling buckets. */
  protected def rollingUserValue(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.rollingSumByTime(
        eventsNs(s, dir).select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"), col("value")),
        "user_id", "event_id", "ts_us", "value",
        windowMicros = 86400L * 1000000L)
      .orderBy("user_id", "ts_us", "event_id")

  /** Per-source rank normalization: each doc's length mapped to its
    * source-relative rank fraction (r−1)/(n−1) — the quantile-uniform
    * feature transform; ranks are integers (ties broken by doc_id) and
    * the one division is exact IEEE. */
  protected def rankNormalize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      .select(col("source"), col("doc_id"), col("n_chars"),
        ((col("r") - 1).cast("double") / (col("n") - 1).cast("double")).as("pct"))
      .orderBy("source", "doc_id")
  }

  /** Quality-argmax survivor selection per near-dup cluster: instead of
    * the keep-min-id policy (`dedup_exact_survivors`), keep each
    * cluster's LONGEST member (ties → min id) — the policy a pipeline
    * wants when near-dups include truncated copies. Rides the SAME
    * group table as `cluster_split` ([[sharedNearDupGroups]]) — one
    * dedup pass feeds all consumers. */
  protected def dedupBestSurvivors(s: SparkSession, dir: String): DataFrame = {
    val lens = docsWithDups(s, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    sharedNearDupGroups(s, dir).join(lens, Seq("doc_id"))
      .groupBy("group_id")
      .agg(max(struct(col("len").as("len"), (-col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("group_id"), (-col("best.nid")).as("keep_id"),
        col("best.len").as("keep_len"), col("n_members"))
      .orderBy("group_id")
  }

  /** Image near-duplicate pairs by 64-bit perceptual average-hash
    * ([[graft.operators.Multimodal.imageNearDups]], 4×16 banding, exact
    * popcount verify): the deterministic synthetic images plus
    * pixel-perturbed copies (id + 10000). Like `multimodal_features`,
    * no second engine implements the codec, so the gate pins against a
    * committed golden CSV and OperatorsSpec recomputes it. */
  protected def imageNearDupsGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = Multimodal.syntheticMedia(s, 200)
    val perturbed = items.filter(_.kind == "image").map { m =>
      Multimodal.Codecs.decodePpm(m.bytes) match {
        case Some((w, h, rgb)) =>
          val out = rgb.clone()
          var i = 0
          while (i < out.length) {
            if (i % 97 == 0) out(i) = ((out(i) & 0xff) ^ 0x03).toByte
            i += 1
          }
          m.copy(mediaId = m.mediaId + 10000,
            bytes = Multimodal.Codecs.encodePpm(w, h, out))
        case None => m.copy(mediaId = m.mediaId + 10000)
      }
    }
    Multimodal.imageNearDups(items.union(perturbed), maxHamming = 2)
      .orderBy("id_a", "id_b")
  }

  /** DCT-pHash image near-dups ([[graft.operators.Multimodal
    * .imagePHashDups]]): plants BRIGHTNESS-SCALED copies (every channel
    * ×3/4 — a pure positive luma scaling, never clipping, the global
    * edit class pHash's sign-vs-median structure is invariant to,
    * id + 10000) next to the xor-noise copies the aHash gate uses
    * (id + 20000). Golden-CSV gated like the other codec-backed gates;
    * regeneration + planted recall pinned in OperatorsSpec. */
  protected def imagePHashDupsGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = Multimodal.syntheticMedia(s, 200)
    def mapImages(idOffset: Long)(f: Array[Byte] => Array[Byte]) =
      items.filter(_.kind == "image").map { m =>
        Multimodal.Codecs.decodePpm(m.bytes) match {
          case Some((w, h, rgb)) =>
            m.copy(mediaId = m.mediaId + idOffset,
              bytes = Multimodal.Codecs.encodePpm(w, h, f(rgb)))
          case None => m.copy(mediaId = m.mediaId + idOffset)
        }
      }
    val brightened = mapImages(10000L) { rgb =>
      rgb.map(b => (((b & 0xff) * 3) / 4).toByte)
    }
    val noisy = mapImages(20000L) { rgb =>
      val out = rgb.clone()
      var i = 0
      while (i < out.length) {
        if (i % 97 == 0) out(i) = ((out(i) & 0xff) ^ 0x03).toByte
        i += 1
      }
      out
    }
    Multimodal.imagePHashDups(items.union(brightened).union(noisy), maxHamming = 3)
      .orderBy("id_a", "id_b")
  }

  /** Audio + video near-duplicate pairs by 64-bit perceptual
    * fingerprints ([[graft.operators.Multimodal.audioNearDups]]
    * delta-sign energy fingerprint; [[graft.operators.Multimodal
    * .videoThumbDups]] first-frame aHash — both through the shared
    * 4×16-band + popcount engine). Planted perturbed copies (id +
    * 10000): audio samples nudged ±3, video frame bytes xor'd slightly.
    * Golden-CSV gated like the other codec-backed gates. */
  protected def mediaFingerprintDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.Codecs
    val items = Multimodal.syntheticMedia(s, 200)
    val perturbed = items.filter(m => m.kind == "audio" || m.kind == "video").map { m =>
      m.kind match {
        case "audio" =>
          Codecs.decodeWavPcm16(m.bytes) match {
            case Some((sr, samples)) =>
              val out = samples.clone()
              var i = 0
              while (i < out.length) {
                if (i % 13 == 0) out(i) = (out(i) + ((i % 7) - 3)).toShort
                i += 1
              }
              m.copy(mediaId = m.mediaId + 10000, bytes = Codecs.encodeWavPcm16(sr, out))
            case None => m.copy(mediaId = m.mediaId + 10000)
          }
        case _ =>
          val out = m.bytes.clone()
          var i = 16 // past the GVID header
          while (i < out.length) {
            if (i % 101 == 0) out(i) = ((out(i) & 0xff) ^ 0x02).toByte
            i += 1
          }
          m.copy(mediaId = m.mediaId + 10000, bytes = out)
      }
    }
    val all = items.union(perturbed)
    Multimodal.audioNearDups(all, maxHamming = 2)
      .withColumn("modality", lit("audio"))
      .unionByName(Multimodal.videoThumbDups(all, maxHamming = 2)
        .withColumn("modality", lit("video")))
      .orderBy("modality", "id_a", "id_b")
  }

  /** Trim-robust video dedup ([[graft.operators.Multimodal
    * .videoContentDups]]): originals vs TRIMMED copies (id + 20000,
    * first frame dropped) — the copies the thumbnail screen
    * (`media_fingerprint_dups`) cannot see, found by sampled-frame-set
    * overlap. Golden-CSV gated. */
  protected def videoContentDupsGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.Codecs
    val items = Multimodal.syntheticMedia(s, 200)
    val trimmed = items.filter(_.kind == "video").flatMap { m =>
      Codecs.decodeVideoHeader(m.bytes) match {
        case Some((frameCount, w, h)) if frameCount >= 2 =>
          val frames = (1 until frameCount).flatMap(i =>
            Codecs.decodeVideoFrame(m.bytes, i).map(_._3))
          Some(m.copy(mediaId = m.mediaId + 20000,
            bytes = Codecs.encodeVideo(w, h, frames),
            durationMs = m.durationMs - 1000L))
        case _ => None
      }
    }
    Multimodal.videoContentDups(items.union(trimmed), everyMs = 1000L, minShared = 1)
      .orderBy("id_a", "id_b")
  }

  /** Four REAL BPE training rounds ([[graft.operators.TextCorpus
    * .bpeTrainMerges]]): the learned merge table, with rounds 2+
    * counting pairs over the REBUILT symbol sequences — the oracle
    * unrolls the same greedy-leftmost merge via run-parity windows, so
    * any drift in merge application diverges the next round's counts. */
  protected def bpeMerges(s: SparkSession, dir: String): DataFrame =
    graft.operators.TextCorpus.bpeTrainMerges(t(s, dir, "documents"), "text", nMerges = 4)
      .orderBy("rank")

  /** The tokenizer's SERVING half ([[graft.operators.TextCorpus
    * .bpeEncode]]): encode the corpus with the round-4 trained merges —
    * per doc, word/token counts and the full merged-symbol sequence.
    * The oracle re-derives the same merges (the bpe_merges chain) and
    * re-applies them via the run-parity windows, so any drift in the
    * greedy-leftmost application diverges the token text. */
  protected def bpeEncodeGate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.TextCorpus.bpeEncode(docs,
        graft.operators.TextCorpus.bpeTrainMerges(docs, "text", nMerges = 4))
      .orderBy("doc_id")
  }

  /** The round trip that closes the tokenizer ([[graft.operators
    * .TextCorpus.bpeEncodeIds]] → [[graft.operators.TextCorpus
    * .bpeDecode]]): encode the corpus to token ids with the round-4
    * trained merges, decode straight back, and emit the decoded text
    * next to the token count. The oracle never sees the ids — it
    * asserts the LAW: decoded text must equal the normalized word
    * sequence (and n_tokens must match the oracle's independent merge
    * replay), so an id collision, a dropped separator, or a vocab
    * mismatch between the two literal maps all diverge the hash. */
  protected def bpeDecodeGate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val merges =
      graft.operators.TextCorpus.bpeTrainMerges(docs, "text", nMerges = 4)
    graft.operators.TextCorpus.bpeDecode(
        graft.operators.TextCorpus.bpeEncodeIds(docs, merges), merges)
      .select("doc_id", "n_tokens", "decoded_text")
      .orderBy("doc_id")
  }

  /** Seed width for the unigram-LM gates — wide enough that real
    * multi-char pieces compete, small enough that the oracle's LIMIT
    * cut stays comfortably inside the (score desc, piece) total order. */
  private val UnigramSeedMulti = 120

  /** Unigram-LM trainer ([[graft.operators.UnigramLm.trainPieces]]):
    * two integer-exact Viterbi-EM rounds over the word-frequency table;
    * the final piece table (piece, score, piece_id) hash-matches the
    * oracle's unrolled CTE chain — seed grid, two EM rounds of
    * positional-DP Viterbi + usage re-score + prune, id assignment by
    * (score desc, piece). */
  protected def unigramTrainGate(s: SparkSession, dir: String): DataFrame =
    graft.operators.UnigramLm
      .trainPieces(unigramDocs(s, dir), "text", iters = 2, seedMulti = UnigramSeedMulti)
      .orderBy("piece_id")

  /** Serving segmentation ([[graft.operators.UnigramLm.segmentWords]]):
    * every distinct corpus word Viterbi-segmented under the trained
    * scores — fewest pieces, then greatest score, then lexicographic;
    * any drift in the DP (objective order, tie-breaks, coverage)
    * diverges (n_pieces, score, pieces_text). */
  protected def unigramSegmentGate(s: SparkSession, dir: String): DataFrame = {
    val docs = unigramDocs(s, dir)
    val pieces = graft.operators.UnigramLm
      .trainPieces(docs, "text", iters = 2, seedMulti = UnigramSeedMulti)
    graft.operators.UnigramLm
      .segmentWords(graft.operators.UnigramLm.wordFreq(docs).select("word"), pieces)
      .orderBy("word")
  }

  /** Piece-text serving ([[graft.operators.UnigramLm.encode]]) — the
    * bpe_encode surface under unigram segmentation: per doc word/token
    * counts and the full piece sequence. */
  protected def unigramEncodeGate(s: SparkSession, dir: String): DataFrame = {
    val docs = unigramDocs(s, dir)
    val pieces = graft.operators.UnigramLm
      .trainPieces(docs, "text", iters = 2, seedMulti = UnigramSeedMulti)
    graft.operators.UnigramLm.encode(docs, pieces).orderBy("doc_id")
  }

  /** The unigram round trip ([[graft.operators.UnigramLm.encodeIds]] →
    * [[graft.operators.UnigramLm.decode]]): encode the corpus to piece
    * ids, decode straight back. The oracle never sees the ids — it
    * asserts the LAW (decoded text == the normalized in-domain word
    * sequence; n_tokens == its own independent Viterbi replay), the
    * `bpe_decode` rigor. */
  protected def unigramRoundtripGate(s: SparkSession, dir: String): DataFrame = {
    val docs = unigramDocs(s, dir)
    val pieces = graft.operators.UnigramLm
      .trainPieces(docs, "text", iters = 2, seedMulti = UnigramSeedMulti)
    graft.operators.UnigramLm
      .decode(graft.operators.UnigramLm.encodeIds(docs, pieces), pieces)
      .select("doc_id", "n_tokens", "decoded_text")
      .orderBy("doc_id")
  }

  protected def warehouseGateQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_intervals" -> scd2Intervals _,
    "scd2_point_lookup" -> scd2PointLookup _,
    "event_transitions" -> eventTransitions _,
    "transition_state_batch" -> transitionStateBatch _,
    "fuzzy_name_pairs" -> fuzzyNamePairs _,
    "golden_records" -> goldenRecordsQuery _,
    "weighted_sample" -> weightedSampleQuery _,
    "corr_matrix" -> corrMatrixQuery _,
    "winsorized_values" -> winsorizedValues _,
    "zorder_codes" -> zorderCodes _,
    "kmeans_assign" -> kmeansAssign _,
    "prototype_distances" -> prototypeDistGate _,
    "price_histogram" -> priceHistogram _,
    "ewma_user_value" -> ewmaUserValue _,
    "time_weighted_value" -> timeWeightedValue _,
    "pareto_docs" -> paretoDocs _,
    "bpe_pair_counts" -> bpePairCountsQuery _,
    "char_diversity" -> charDiversityQuery _,
    "tws_type_counts" -> twsTypeCounts _,
    "kcore_nodes" -> kcoreNodes _,
    "interarrival_stats" -> interarrivalStats _,
    "rolling_user_value" -> rollingUserValue _,
    "resample_locf" -> resampleLocf _,
    "rank_normalize" -> rankNormalize _,
    "dedup_best_survivors" -> dedupBestSurvivors _,
    "image_near_dups" -> imageNearDupsGate _,
    "image_phash_dups" -> imagePHashDupsGate _,
    "media_fingerprint_dups" -> mediaFingerprintDups _,
    "video_content_dups" -> videoContentDupsGate _,
    "bpe_merges" -> bpeMerges _,
    "bpe_encode" -> bpeEncodeGate _,
    "bpe_decode" -> bpeDecodeGate _,
    "unigram_lm_train" -> unigramTrainGate _,
    "unigram_lm_segment" -> unigramSegmentGate _,
    "unigram_lm_encode" -> unigramEncodeGate _,
    "unigram_lm_roundtrip" -> unigramRoundtripGate _,
  )

  protected def warehouseGateOracles: Map[String, String] = Map(
    "image_phash_dups" ->
      // golden CSV like image_near_dups (no second engine implements
      // the PPM codec / 32×32 DCT); 201 rows = the 67 originals paired
      // with both planted copies (darkened ×3/4 and xor-noise) plus the
      // copies paired with each other, all at Hamming ≤ 2
      """SELECT id_a, id_b, hamming
         FROM read_csv('/root/repo/src/test/resources/image_phash_golden.csv',
           header=true,
           columns={'id_a':'BIGINT','id_b':'BIGINT','hamming':'BIGINT'})
         ORDER BY id_a, id_b""",
    "image_near_dups" ->
      // no second engine implements the PPM codec/aHash — golden CSV
      // (committed, regenerated+pinned by OperatorsSpec). The synthetic
      // corpus' images share a gradient structure, so many TRUE
      // low-Hamming pairs exist beyond the planted id+10000 copies;
      // the golden records them all.
      """SELECT id_a, id_b, hamming
         FROM read_csv('/root/repo/src/test/resources/image_neardup_golden.csv',
           header=true,
           columns={'id_a':'BIGINT','id_b':'BIGINT','hamming':'BIGINT'})
         ORDER BY id_a, id_b""",
    "media_fingerprint_dups" ->
      // golden CSV like image_near_dups; audio's delta-sign fingerprint
      // is fully discriminative on this corpus (exactly the 67 planted
      // pairs), video thumbnails share gradient structure like images
      """SELECT id_a, id_b, hamming, modality
         FROM read_csv('/root/repo/src/test/resources/media_fingerprint_golden.csv',
           header=true,
           columns={'id_a':'BIGINT','id_b':'BIGINT','hamming':'BIGINT','modality':'VARCHAR'})
         ORDER BY modality, id_a, id_b""",
    "bpe_merges" -> bpeMergesOracle,
    "bpe_encode" -> bpeEncodeOracle,
    "bpe_decode" -> bpeDecodeOracle,
    "unigram_lm_train" -> unigramTrainOracle(UnigramSeedMulti),
    "unigram_lm_segment" -> unigramSegmentOracle(UnigramSeedMulti),
    "unigram_lm_encode" -> unigramEncodeOracle(UnigramSeedMulti),
    "unigram_lm_roundtrip" -> unigramRoundtripOracle(UnigramSeedMulti),
    "video_content_dups" ->
      // golden CSV (codec-backed); cross-video pairs are real — the
      // synthetic frames share gradient structure, so exact frame-hash
      // collisions across clips are common and the golden records them
      """SELECT id_a, id_b, shared_frames
         FROM read_csv('/root/repo/src/test/resources/video_content_golden.csv',
           header=true,
           columns={'id_a':'BIGINT','id_b':'BIGINT','shared_frames':'BIGINT'})
         ORDER BY id_a, id_b""",
    "scd2_intervals" ->
      // gaps-and-islands: lag change flag -> running-sum run id -> one
      // row per run; the open interval has valid_to NULL / is_current 1
      """WITH lagged AS (SELECT user_id, event_id, event_type,
                CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
                       IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
              FROM events),
            runs AS (SELECT user_id, event_id, event_type,
                sum(chg) OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
              FROM lagged),
            grp AS (SELECT user_id, run_id, min(event_type) AS event_type,
                CAST(min(event_id) AS BIGINT) AS valid_from,
                CAST(count(*) AS BIGINT) AS n_rows
              FROM runs GROUP BY user_id, run_id)
         SELECT user_id, event_type, valid_from,
                lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
                n_rows,
                CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
                       IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
         FROM grp ORDER BY user_id, valid_from""",
    "scd2_point_lookup" ->
      // the dimension CTE is the scd2_intervals construction over
      // non-purchase events; contiguous intervals make the range lookup
      // an ASOF join, which DuckDB ships natively
      """WITH e AS (SELECT user_id, event_id, event_type FROM events
                    WHERE event_type <> 'purchase'),
            lagged AS (SELECT user_id, event_id, event_type,
                CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
                       IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
              FROM e),
            runs AS (SELECT user_id, event_id, event_type,
                sum(chg) OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
              FROM lagged),
            dim AS (SELECT user_id, min(event_id) AS valid_from,
                min(event_type) AS event_type
              FROM runs GROUP BY user_id, run_id),
            f AS (SELECT event_id, user_id FROM events WHERE event_type = 'purchase')
         SELECT f.event_id, f.user_id,
                coalesce(d.event_type, 'none') AS state_at_purchase
         FROM f ASOF LEFT JOIN dim d
           ON f.user_id = d.user_id AND f.event_id >= d.valid_from
         ORDER BY f.event_id""",
    "event_transitions" ->
      // first-order Markov transitions; conditional probability as
      // integer ppm (truncating // on exact counts, as Spark's div)
      """WITH pairs AS (SELECT
                lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS from_type,
                event_type AS to_type
              FROM events),
            cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS transitions
              FROM pairs WHERE from_type IS NOT NULL GROUP BY from_type, to_type)
         SELECT from_type, to_type, transitions,
                CAST(transitions * 1000000 // sum(transitions)
                  OVER (PARTITION BY from_type) AS BIGINT) AS prob_ppm
         FROM cnt ORDER BY from_type, to_type""",
    "transition_state_batch" ->
      // batch-mode transitionPairsWithState + group = the relational
      // transition matrix (per-user ts order == event_id order here),
      // so the gate shares the event_transitions oracle verbatim
      """WITH pairs AS (SELECT
                lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS from_type,
                event_type AS to_type
              FROM events),
            cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS transitions
              FROM pairs WHERE from_type IS NOT NULL GROUP BY from_type, to_type)
         SELECT from_type, to_type, transitions,
                CAST(transitions * 1000000 // sum(transitions)
                  OVER (PARTITION BY from_type) AS BIGINT) AS prob_ppm
         FROM cnt ORDER BY from_type, to_type""",
    "fuzzy_name_pairs" ->
      // blocked on the noun (second token); the length-band filter is a
      // necessary condition for edit distance, so it only prunes;
      // DuckDB's levenshtein == Spark's (unit-cost DP edit distance)
      """WITH p AS (SELECT p_partkey AS id, p_name AS nm,
                split_part(p_name, ' ', 2) AS blk FROM part)
         SELECT a.id AS id_a, b.id AS id_b, a.nm AS name_a, b.nm AS name_b,
                CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
         FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
         WHERE abs(length(a.nm) - length(b.nm)) <= 2
           AND levenshtein(a.nm, b.nm) BETWEEN 1 AND 2
         ORDER BY id_a, id_b""",
    "golden_records" ->
      // name-level reachability clusters (the record-pair expansion is
      // never needed for survivorship), survivor by (len desc, nm, id)
      """WITH RECURSIVE p AS (SELECT p_partkey AS id, p_name AS nm,
                split_part(p_name, ' ', 2) AS blk FROM part),
              names AS (SELECT DISTINCT nm, blk FROM p),
              np AS (SELECT a.nm AS na, b.nm AS nb FROM names a JOIN names b
                     ON a.blk = b.blk AND a.nm < b.nm
                     WHERE abs(length(a.nm) - length(b.nm)) <= 2
                       AND levenshtein(a.nm, b.nm) BETWEEN 1 AND 2),
              edges AS (SELECT na AS src, nb AS dst FROM np
                        UNION ALL SELECT nb, na FROM np),
              reach(nm, comp) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.nm),
              lbl AS (SELECT nm, min(comp) AS cluster_name FROM reach GROUP BY nm),
              rec AS (SELECT p.id, p.nm, COALESCE(l.cluster_name, p.nm) AS cluster_name
                      FROM p LEFT JOIN lbl l ON l.nm = p.nm),
              agg AS (SELECT cluster_name, count(*) AS n_records,
                        count(DISTINCT nm) AS n_names
                      FROM rec GROUP BY cluster_name),
              pick AS (SELECT cluster_name, id AS survivor_id, nm AS survivor_name
                       FROM (SELECT cluster_name, id, nm,
                               row_number() OVER (PARTITION BY cluster_name
                                 ORDER BY length(nm) DESC, nm, id) AS rn
                             FROM rec) WHERE rn = 1)
         SELECT pick.survivor_id, pick.survivor_name,
                CAST(agg.n_records AS BIGINT) AS n_records,
                CAST(agg.n_names AS BIGINT) AS n_names
         FROM pick JOIN agg USING (cluster_name) ORDER BY survivor_id""",
    "weighted_sample" ->
      // hash-priority weighted sampling: 60-bit salted-md5 uniform
      // floor-divided by the weight, k smallest win (ties by id)
      """SELECT doc_id, n_chars,
                CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  // CAST(n_chars AS BIGINT) AS priority
         FROM documents WHERE n_chars > 0
         ORDER BY priority, doc_id LIMIT 500""",
    "corr_matrix" ->
      // exact integer moments in centi-units (sum(BIGINT) is HUGEINT in
      // DuckDB = exact int128, Spark's decimal(38,0)); each pair's
      // (cov, vx, vy) divides by one common power of ten until the
      // largest fits 15 digits (< 2^53), because HUGEINT->DOUBLE casts
      // round differently across engines past 2^53 while BIGINT->DOUBLE
      // is exact on both; the divisor is string-built ('1' || zeros) —
      // power(10, 23) is itself not an exact double
      """WITH m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                CAST(sum(CAST(round(l_quantity  * 100) AS BIGINT)) AS HUGEINT) AS s_q,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS s_e,
                CAST(sum(CAST(round(l_discount  * 100) AS BIGINT)) AS HUGEINT) AS s_d,
                CAST(sum(CAST(round(l_tax       * 100) AS BIGINT)) AS HUGEINT) AS s_t,
                CAST(sum(CAST(round(l_quantity  * 100) AS BIGINT) * CAST(round(l_quantity  * 100) AS BIGINT)) AS HUGEINT) AS p_qq,
                CAST(sum(CAST(round(l_quantity  * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS p_qe,
                CAST(sum(CAST(round(l_quantity  * 100) AS BIGINT) * CAST(round(l_discount  * 100) AS BIGINT)) AS HUGEINT) AS p_qd,
                CAST(sum(CAST(round(l_quantity  * 100) AS BIGINT) * CAST(round(l_tax       * 100) AS BIGINT)) AS HUGEINT) AS p_qt,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS p_ee,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount  * 100) AS BIGINT)) AS HUGEINT) AS p_ed,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_tax       * 100) AS BIGINT)) AS HUGEINT) AS p_et,
                CAST(sum(CAST(round(l_discount  * 100) AS BIGINT) * CAST(round(l_discount  * 100) AS BIGINT)) AS HUGEINT) AS p_dd,
                CAST(sum(CAST(round(l_discount  * 100) AS BIGINT) * CAST(round(l_tax       * 100) AS BIGINT)) AS HUGEINT) AS p_dt,
                CAST(sum(CAST(round(l_tax       * 100) AS BIGINT) * CAST(round(l_tax       * 100) AS BIGINT)) AS HUGEINT) AS p_tt
              FROM lineitem),
            tri AS (
              -- pair orientation follows the Spark cols order
              -- (quantity, extendedprice, discount, tax), col_a = earlier
              SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                     n*p_qe - s_q*s_e AS cov, n*p_qq - s_q*s_q AS vx, n*p_ee - s_e*s_e AS vy FROM m
              UNION ALL SELECT 'l_quantity', 'l_discount',
                     n*p_qd - s_q*s_d, n*p_qq - s_q*s_q, n*p_dd - s_d*s_d FROM m
              UNION ALL SELECT 'l_quantity', 'l_tax',
                     n*p_qt - s_q*s_t, n*p_qq - s_q*s_q, n*p_tt - s_t*s_t FROM m
              UNION ALL SELECT 'l_extendedprice', 'l_discount',
                     n*p_ed - s_e*s_d, n*p_ee - s_e*s_e, n*p_dd - s_d*s_d FROM m
              UNION ALL SELECT 'l_extendedprice', 'l_tax',
                     n*p_et - s_e*s_t, n*p_ee - s_e*s_e, n*p_tt - s_t*s_t FROM m
              UNION ALL SELECT 'l_discount', 'l_tax',
                     n*p_dt - s_d*s_t, n*p_dd - s_d*s_d, n*p_tt - s_t*s_t FROM m),
            sc AS (SELECT col_a, col_b, cov, vx, vy,
                CAST('1' || repeat('0', greatest(0,
                  length(CAST(greatest(abs(cov), vx, vy) AS VARCHAR)) - 15)) AS HUGEINT) AS down
              FROM tri)
         SELECT col_a, col_b,
                CAST(CAST(cov // down AS BIGINT) AS DOUBLE)
                  / (sqrt(CAST(CAST(vx // down AS BIGINT) AS DOUBLE))
                     * sqrt(CAST(CAST(vy // down AS BIGINT) AS DOUBLE))) AS corr
         FROM sc ORDER BY col_a, col_b""",
    "zorder_codes" ->
      // Morton interleave: bit i of l_partkey at position 2i, of
      // l_suppkey at 2i+1 — integer shifts/masks, exact on both engines
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                CAST(list_sum(list_transform(range(0, 21),
                  i -> (((l_partkey >> i) & 1) << (2*i))
                     + (((l_suppkey >> i) & 1) << (2*i + 1)))) AS BIGINT) AS zcode
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "winsorized_values" ->
      // per-source [p05, p95] rank-quantile clip; bounds are actual data
      // elements by the length_quantiles rank rule
      """WITH v AS (SELECT source, doc_id, n_chars FROM documents),
            ranked AS (SELECT source, n_chars,
                CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars) AS BIGINT) AS rn
              FROM v),
            counts AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY source),
            bounds AS (SELECT c.source,
                max(CASE WHEN r.rn = CAST(floor(CAST(0.05 AS DOUBLE) * (c.n - 1)) + 1 AS BIGINT)
                      THEN r.n_chars END) AS lo,
                max(CASE WHEN r.rn = CAST(floor(CAST(0.95 AS DOUBLE) * (c.n - 1)) + 1 AS BIGINT)
                      THEN r.n_chars END) AS hi
              FROM counts c JOIN ranked r ON r.source = c.source GROUP BY c.source)
         SELECT v.source, v.doc_id, v.n_chars, b.lo, b.hi,
                CASE WHEN v.n_chars < b.lo THEN b.lo
                     WHEN v.n_chars > b.hi THEN b.hi
                     ELSE v.n_chars END AS clipped
         FROM v JOIN bounds b ON v.source = b.source
         ORDER BY v.source, v.doc_id""",
    "prototype_distances" ->
      // round-1 of the kmeans CTE with the winning distance kept; the
      // cluster lower median picks by the (dist, vec_id) rank rule; the
      // flag is the cross-multiplied decimal compare dist*2 > med*3
      """WITH e AS (
           SELECT vec_id, generate_subscripts(embedding, 1) AS d,
                  unnest(embedding)::DOUBLE AS x
           FROM embeddings),
         cent1 AS (SELECT vec_id AS cid, d, x AS c FROM e WHERE vec_id < 4),
         d1 AS (SELECT e.vec_id, c.cid,
                       SUM(CAST((e.x - c.c)*(e.x - c.c) AS DECIMAL(30,10))) AS dist
                FROM e JOIN cent1 c USING (d) GROUP BY 1, 2),
         a1 AS (SELECT vec_id, cid AS c1, dist FROM (
                  SELECT vec_id, cid, dist,
                         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                  FROM d1) WHERE rn = 1),
         m AS (SELECT c1, dist AS med2 FROM (
                 SELECT c1, dist, vec_id,
                        ROW_NUMBER() OVER (PARTITION BY c1 ORDER BY dist, vec_id) AS rn,
                        COUNT(*) OVER (PARTITION BY c1) AS n
                 FROM a1) WHERE rn = (n + 1) // 2)
         SELECT a1.vec_id, a1.c1,
                CAST(a1.dist AS VARCHAR) AS dist2,
                CAST(m.med2 AS VARCHAR) AS med2,
                a1.dist * 2 > m.med2 * 3 AS is_far
         FROM a1 JOIN m USING (c1) ORDER BY vec_id""",
    "kmeans_assign" ->
      // Clustering.kmeansTwoRounds unrolled: decimal-sum distances make
      // the argmin order-independent; round-2 compares the n-scaled form
      // Σ(n·x − s)²/n². DECIMAL(30,6) on the round-2 terms keeps the
      // unscaled sum < 2^53 so the final CAST AS DOUBLE is one
      // correctly-rounded conversion in both engines.
      """WITH e AS (
           SELECT vec_id, generate_subscripts(embedding, 1) AS d,
                  unnest(embedding)::DOUBLE AS x
           FROM embeddings),
         cent1 AS (SELECT vec_id AS cid, d, x AS c FROM e WHERE vec_id < 4),
         d1 AS (SELECT e.vec_id, c.cid,
                       SUM(CAST((e.x - c.c)*(e.x - c.c) AS DECIMAL(30,10))) AS dist
                FROM e JOIN cent1 c USING (d) GROUP BY 1, 2),
         a1 AS (SELECT vec_id, cid AS c1 FROM (
                  SELECT vec_id, cid,
                         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                  FROM d1) WHERE rn = 1),
         s2 AS (SELECT a1.c1 AS cid, e.d,
                       SUM(CAST(e.x AS DECIMAL(30,10))) AS s, COUNT(*) AS n
                FROM e JOIN a1 USING (vec_id) GROUP BY 1, 2),
         d2 AS (SELECT e.vec_id, s2.cid, s2.n,
                       SUM(CAST((CAST(s2.n AS DOUBLE)*e.x - CAST(s2.s AS DOUBLE))
                              * (CAST(s2.n AS DOUBLE)*e.x - CAST(s2.s AS DOUBLE))
                              AS DECIMAL(30,6))) AS num
                FROM e JOIN s2 USING (d) GROUP BY 1, 2, 3),
         a2 AS (SELECT vec_id, cid AS c2 FROM (
                  SELECT vec_id, cid,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY CAST(num AS DOUBLE) / CAST(n*n AS DOUBLE), cid) AS rn
                  FROM d2) WHERE rn = 1)
         SELECT a1.vec_id, a1.c1, a2.c2
         FROM a1 JOIN a2 USING (vec_id) ORDER BY vec_id""",
    "price_histogram" ->
      // Stats.equiWidthHistogram: multiply before divide, stated in the
      // same order as the Spark expression so bucket edges are
      // bit-identical
      """WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
                    FROM lineitem)
         SELECT LEAST(19, FLOOR((l_extendedprice - lo) * 20 / (hi - lo)))::BIGINT AS bin,
                count(*) AS n, min(l_extendedprice) AS lo_v, max(l_extendedprice) AS hi_v
         FROM lineitem, b GROUP BY 1 ORDER BY 1""",
    "ewma_user_value" ->
      // Stats.ewmaLastN: α = ½ weights are exact binary powers, the
      // weighted sum is decimal (order-independent), the normalizer
      // 1 − 2⁻ⁿ is exact in double
      """SELECT user_id, count(*) AS n_used,
                CAST(SUM(CAST(value * POWER(0.5, rn) AS DECIMAL(30,12))) AS DOUBLE)
                  / (1.0 - POWER(0.5, count(*))) AS ewma
         FROM (SELECT user_id, value,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) WHERE rn <= 8
         GROUP BY user_id ORDER BY user_id""",
    "time_weighted_value" ->
      // Stats.timeWeightedAvg: step-function integral, value holds to
      // the next observation (ties ordered by event_id), last holds to
      // the global horizon; exact integers, HUGEINT sum as VARCHAR
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
                CAST(CAST(value AS DECIMAL(30,6)) * 1000000 AS BIGINT) AS vus
              FROM events),
          h AS (SELECT max(tus) AS horizon FROM e),
          x AS (SELECT user_id, tus, vus,
                  lead(tus) OVER (PARTITION BY user_id
                    ORDER BY tus, event_id) AS nxt
                FROM e)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
                CAST(h.horizon - min(tus) AS BIGINT) AS twap_den,
                CAST(sum(CAST(vus AS HUGEINT)
                         * (coalesce(nxt, h.horizon) - tus)) AS VARCHAR)
                  AS twap_num
         FROM x, h GROUP BY user_id, h.horizon ORDER BY user_id""",
    "pareto_docs" ->
      // Skyline.paretoFrontier semantics stated directly as the NOT
      // EXISTS dominance test (the window formulation is the
      // implementation; SkylineSpec proves them equivalent)
      """WITH t AS (SELECT doc_id, source,
                           len(string_split_regex(trim(text), '\s+'))::BIGINT AS x,
                           len(list_filter(list_distinct(
                             string_split_regex(lower(trim(text)), '[^a-z0-9]+')),
                             tk -> tk <> ''))::BIGINT AS y
                    FROM documents)
         SELECT source, doc_id, x, y FROM t a
         WHERE NOT EXISTS (SELECT 1 FROM t b WHERE b.source = a.source
                           AND b.x >= a.x AND b.y >= a.y
                           AND (b.x > a.x OR b.y > a.y))
         ORDER BY source, doc_id""",
    "bpe_pair_counts" ->
      // TextCorpus.bpePairCounts; CAST AS BIGINT for the HUGEINT sum
      // (the text_bpe_tokens lesson)
      """SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM (
           SELECT word, count(*) AS cnt FROM (
             SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
             FROM documents) w
           WHERE length(word) >= 2 GROUP BY word) wf,
           unnest(list_transform(range(1, length(word)), i -> word[i:i+1])) AS u(pair)
         GROUP BY pair ORDER BY pair_count DESC, pair LIMIT 30""",
    "char_diversity" ->
      // CharDiversityExpr: integer letter counts; the Simpson index is
      // the only double and it is one exact division
      """SELECT doc_id, n_alpha, c2_sum,
                1.0 - CAST(c2_sum AS DOUBLE) / CAST(n_alpha*n_alpha AS DOUBLE) AS simpson
         FROM (
           SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_alpha,
                  CAST(SUM(cnt*cnt) AS BIGINT) AS c2_sum FROM (
             SELECT doc_id, ch, count(*)::BIGINT AS cnt
             FROM (SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
                   FROM documents)
             WHERE ch BETWEEN 'a' AND 'z' GROUP BY doc_id, ch) GROUP BY doc_id)
         ORDER BY doc_id""",
    "tws_type_counts" ->
      // batch transformWithState over empty state ≡ the grouped count
      """SELECT user_id, event_type, count(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "kcore_nodes" ->
      // Graph.kCore unrolled to 3 peel rounds over the symmetrized
      // distinct co-supply edges
      """WITH march AS (SELECT o_orderkey AS ok FROM orders
                        WHERE o_orderdate >= '1995-03-01' AND o_orderdate < '1995-04-01'),
         li AS (SELECT l_orderkey AS ok, l_suppkey AS sk
                FROM lineitem JOIN march ON l_orderkey = march.ok),
         pairs AS (SELECT a.sk AS src, b.sk AS dst
                   FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk),
         e0 AS (SELECT DISTINCT src, dst FROM
                 (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs)),
         k1 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e0 GROUP BY src)
                WHERE deg >= 12),
         e1 AS (SELECT e.src, e.dst FROM e0 e
                JOIN k1 a ON e.src = a.src JOIN k1 b ON e.dst = b.src),
         k2 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e1 GROUP BY src)
                WHERE deg >= 12),
         e2 AS (SELECT e.src, e.dst FROM e1 e
                JOIN k2 a ON e.src = a.src JOIN k2 b ON e.dst = b.src),
         k3 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e2 GROUP BY src)
                WHERE deg >= 12),
         e3 AS (SELECT e.src, e.dst FROM e2 e
                JOIN k3 a ON e.src = a.src JOIN k3 b ON e.dst = b.src)
         SELECT src AS node, count(*) AS deg FROM e3 GROUP BY src ORDER BY node""",
    "interarrival_stats" ->
      // lag gap in exact micros, then the floor(p*(n-1))+1 rank rule
      // (the length_quantiles oracle shape)
      """WITH g AS (SELECT event_type,
                           epoch_us(ts) - lag(epoch_us(ts)) OVER (
                             PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
                    FROM events),
         v AS (SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL),
         ranked AS (SELECT event_type, gap_us,
                      CAST(row_number() OVER (PARTITION BY event_type
                        ORDER BY gap_us) AS BIGINT) AS rn
                    FROM v),
         counts AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows
                    FROM v GROUP BY event_type),
         targets AS (SELECT event_type, n_rows, p.p AS p,
                       CAST(floor(p.p * (n_rows - 1)) + 1 AS BIGINT) AS rn
                     FROM counts,
                       (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS p) p)
         SELECT r.event_type, t.p, t.n_rows, r.gap_us AS value
         FROM ranked r JOIN targets t ON r.event_type = t.event_type AND r.rn = t.rn
         ORDER BY r.event_type, t.p""",
    "rolling_user_value" ->
      // Stats.rollingSumByTime: decimal(30,6) window sum (scale keeps
      // the unscaled sum < 2^53 → the double cast is one correctly
      // rounded conversion in both engines); time ties are RANGE peers
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
                CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS rolling_sum,
                COUNT(*) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
                  AS n_in_window
         FROM events ORDER BY user_id, ts_us, event_id""",
    "resample_locf" ->
      // Resample.locfGrid: hourly bucket = integer div (us here, ns on
      // the Spark side — identical quotients since ns = us·1000); last
      // obs per bucket picked by a total (ts, event_id) order
      """WITH obs AS (
           SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
                  epoch_us(ts) AS us, event_id, value
           FROM events),
              lastb AS (
           SELECT user_id, bucket, value FROM (
             SELECT *, row_number() OVER (
               PARTITION BY user_id, bucket
               ORDER BY us DESC, event_id DESC) AS rn
             FROM obs) WHERE rn = 1),
              grid AS (
           SELECT user_id, unnest(generate_series(lo, hi)) AS bucket
           FROM (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
                 FROM obs GROUP BY user_id))
         SELECT g.user_id, g.bucket,
                last_value(l.value IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
         FROM grid g LEFT JOIN lastb l
           ON g.user_id = l.user_id AND g.bucket = l.bucket
         ORDER BY g.user_id, g.bucket""",
    "rank_normalize" ->
      // integer ranks (ties by doc_id), one exact IEEE division
      """SELECT source, doc_id, n_chars,
                CAST(r - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS pct
         FROM (SELECT source, doc_id, n_chars,
                      CAST(row_number() OVER (PARTITION BY source
                        ORDER BY n_chars, doc_id) AS BIGINT) AS r,
                      CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
               FROM documents)
         ORDER BY source, doc_id""",
    "dedup_best_survivors" ->
      // the near_dup_groups reachability CTE + per-cluster argmax on raw
      // text length (ties -> min doc_id)
      s"""WITH RECURSIVE docs AS (SELECT doc_id, trim(text) AS text FROM $docsWithDupsSql dd),
          sh AS (SELECT doc_id,
                   list_distinct([substr(text, i, 5) FOR i IN range(1, greatest(length(text)-4, 1)+1)]) AS s
                 FROM docs),
          pairs AS (SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.s, b.s))::DOUBLE
                     / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
            WHERE jaccard >= 0.5),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                    UNION ALL SELECT id_b, id_a FROM pairs),
          reach(id, comp) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
          grp AS (SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS group_id
                  FROM reach GROUP BY id),
          lens AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len
                   FROM $docsWithDupsSql d2),
          ranked AS (SELECT g.group_id, g.doc_id, l.len,
                       row_number() OVER (PARTITION BY g.group_id
                         ORDER BY l.len DESC, g.doc_id ASC) AS rn,
                       CAST(count(*) OVER (PARTITION BY g.group_id) AS BIGINT) AS n_members
                     FROM grp g JOIN lens l ON g.doc_id = l.doc_id)
         SELECT group_id, doc_id AS keep_id, len AS keep_len, n_members
         FROM ranked WHERE rn = 1 ORDER BY group_id""",
  )
}
