package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan invariants of the gate queries, asserted as tests so a
  * plan regression (a lost broadcast hint, a filter that stops pushing,
  * an accidental cartesian) fails the suite instead of waiting for a
  * human to read ExplainAudit. Runs at sf0.001 — plan SHAPE, not speed.
  *
  * AQE is left on (as in Bench/Verify): `collect()` finalizes the
  * adaptive plan before inspection. */
class PlanShapeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = finalPlanAt(name, sf)

  private def finalPlanAt(name: String, sfDir: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // finalize AQE
    // AdaptiveSparkPlan.toString prints "== Final Plan ==" followed by
    // "== Initial Plan ==" — keep only the final section, or operator
    // counts double
    val full = df.queryExecution.executedPlan.toString()
    val cut = full.indexOf("== Initial Plan ==")
    if (cut >= 0) full.substring(0, cut) else full
  }

  private def count(plan: String, op: String): Int =
    plan.split('\n').count(_.contains(op))

  test("dimension joins broadcast; nothing falls back to sort-merge or nested-loop") {
    Seq("q3_top_revenue", "q5_nation_revenue", "top_suppliers_per_nation").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "BroadcastHashJoin") >= 1, s"$q lost its broadcast join")
      assert(count(p, "SortMergeJoin") === 0, s"$q fell back to sort-merge")
      assert(count(p, "BroadcastNestedLoopJoin") === 0, s"$q has a nested-loop join")
      assert(count(p, "CartesianProduct") === 0, s"$q has a cartesian product")
    }
  }

  test("scan-level filters push into the parquet scan") {
    Seq("q1_pricing_summary", "q3_top_revenue").foreach { q =>
      val p = finalPlan(q)
      val pushed = "PushedFilters: \\[[^\\]]*[A-Za-z][^\\]]*\\]".r.findAllIn(p).size
      assert(pushed >= 1, s"$q pushes no filters to its scans")
    }
  }

  test("as-of join is a single keyed shuffle, never a range/nested-loop join") {
    val p = finalPlan("asof_join")
    assert(count(p, "Window") >= 1, "asof lost its window formulation")
    assert(count(p, "BroadcastNestedLoopJoin") === 0, "asof degenerated to a range join")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "SortMergeJoin") === 0)
  }

  test("deterministic split/mixture are pure projections: no shuffle before the aggregate") {
    // one Exchange for the groupBy count, one for the final sort — the
    // sampling itself must not add any
    Seq("sample_split_counts", "weighted_mixture").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "Exchange") <= 2, s"$q shuffles more than aggregate+sort:\n$p")
    }
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    Seq("q1_pricing_summary", "distinct_counts").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "HashAggregate") >= 2, s"$q is missing partial aggregation")
    }
  }

  test("corpus shuffle windows per shard, never over one global partition") {
    val p = finalPlan("corpus_shuffle")
    assert(count(p, "Window") >= 1)
    // a global row_number would plan Exchange SinglePartition before the
    // Window — the serialization this operator exists to avoid
    val windowAt = p.split('\n').indexWhere(_.contains("Window"))
    val single = p.split('\n').zipWithIndex
      .exists { case (l, i) => i > windowAt && l.contains("SinglePartition") }
    assert(!single, s"corpus_shuffle degenerated to a single-partition window:\n$p")
  }

  test("equi-depth tilings rank per physical slice, never one global ntile sort") {
    // distributedNtile (r12 verdict #4): the data-sized rank must be a
    // row_number window partitioned by the physical slice id (_pid) —
    // parallel — and no windowed ntile may remain (a global/per-group
    // ntile funnels the frame into one task per group). The bounded
    // offsets windows (SinglePartition over |partitions|·|groups| rows)
    // are configuration-sized by construction and exempt.
    Seq("rfm_scores", "price_equidepth", "calibration_bins",
        "length_deciles", "ccnet_buckets").foreach { q =>
      val p = finalPlan(q)
      assert(!p.contains("ntile("), s"$q still plans a windowed ntile:\n$p")
      val rankLines = p.split('\n').filter(_.contains("row_number()"))
      assert(rankLines.nonEmpty, s"$q lost its distributed rank window:\n$p")
      rankLines.foreach { l =>
        assert(l.contains("_pid"),
          s"$q ranks without the physical-slice key (one-task sort?): $l")
      }
    }
  }

  test("html extraction rides the scan: no join, no aggregate, one presentation sort") {
    // document→content is a pure projection (nested HOFs over the block
    // array); the block-detail twin adds one narrow posexplode. The ONLY
    // exchange either may plan is the gate's own orderBy.
    Seq("html_extract", "html_extract_text").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "Join") === 0, s"$q plans a join:\n$p")
      assert(count(p, "HashAggregate") === 0, s"$q plans an aggregate:\n$p")
      assert(count(p, "Exchange") <= 1, s"$q shuffles beyond the output sort:\n$p")
    }
  }

  test("link extraction rides the scan; the host graph is one keyed aggregate, no join") {
    val pl = finalPlan("html_links")
    assert(count(pl, "Join") === 0, s"html_links plans a join:\n$pl")
    assert(count(pl, "HashAggregate") === 0, s"html_links aggregates:\n$pl")
    assert(count(pl, "Exchange") <= 1, s"html_links shuffles beyond the sort:\n$pl")
    val pg = finalPlan("link_host_graph")
    assert(count(pg, "Join") === 0, s"link graph joins:\n$pg")
    assert(count(pg, "HashAggregate") >= 2, s"link graph lost map-side combine:\n$pg")
  }

  test("crawl policy: rules join is BROADCAST (data side never shuffles for it)") {
    val p = finalPlan("crawl_policy_filter")
    assert(count(p, "BroadcastHashJoin") >= 1, s"rules join lost its broadcast:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"policy match went cartesian:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0,
      s"prefix match fell into a nested loop:\n$p")
  }

  test("canonical collapse: extraction rides the scan, one keyed window, no join") {
    val p = finalPlan("html_canonical")
    assert(count(p, "Join") === 0, s"html_canonical plans a join:\n$p")
    assert(count(p, "HashAggregate") === 0, s"html_canonical aggregates:\n$p")
    assert(p.contains("Window"), s"html_canonical lost its collapse window:\n$p")
    // one hash exchange on canon_url + the gate's own presentation sort
    assert(count(p, "Exchange") <= 2, s"html_canonical over-shuffles:\n$p")
  }

  test("frontier schedule: distributed top-K batch pick, rank per host, no global sort") {
    val p = finalPlan("frontier_schedule")
    assert(p.contains("TakeOrderedAndProject"),
      s"batch pick lost its distributed top-K:\n$p")
    // every rank window is KEYED — queue position by host, the inner
    // frontier cap by domain; a global (keyless) window would read
    // `windowspecdefinition(url_norm...` with no partition column
    val rankLines = p.split('\n').filter(_.contains("windowspecdefinition"))
    assert(rankLines.nonEmpty && rankLines.forall(l =>
        l.contains("windowspecdefinition(host") ||
          l.contains("windowspecdefinition(domain")),
      s"a rank window lost its partition key (global sort at scale):\n$p")
    assert(count(p, "CartesianProduct") === 0, s"schedule went cartesian:\n$p")
  }

  test("kmv sketch build: distributed top-K, never a global sort of the hash space") {
    val p = finalPlan("kmv_sketch")
    assert(p.contains("TakeOrderedAndProject"),
      s"kmv build lost its per-partition k-heads:\n$p")
    assert(count(p, "HashAggregate") >= 2,
      s"kmv distinct lost map-side combine:\n$p")
  }

  test("source overlap joins on digests, never cartesian") {
    val p = finalPlan("source_overlap")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("repetition stats aggregate partially before both shuffles") {
    val p = finalPlan("repetition_stats")
    assert(count(p, "HashAggregate") >= 3, s"repetition_stats lost partial aggregation:\n$p")
  }

  test("interval join stays an equi-join with range filters, never nested-loop") {
    val p = finalPlan("interval_join")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0, s"interval join degenerated:\n$p")
  }

  test("quality filter aggregates partially and joins on doc_id without cartesian") {
    val p = finalPlan("quality_filter")
    assert(count(p, "HashAggregate") >= 3)
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("span dedup joins on span hashes with partial aggregation, never cartesian") {
    val p = finalPlan("span_dedup")
    // span stats + two doc_id aggregations all partial-aggregate
    assert(count(p, "HashAggregate") + count(p, "ObjectHashAggregate") >= 4,
      s"span dedup lost its partial aggregation:\n$p")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("mixture plan broadcasts the weights and total, never shuffling them") {
    val p = finalPlan("mixture_plan")
    assert(count(p, "BroadcastHashJoin") >= 1, s"weights join lost its broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0)
    assert(count(p, "CartesianProduct") === 0)
  }

  test("vocab encode broadcasts the vocabulary to the word probe") {
    val p = finalPlan("vocab_encode")
    assert(count(p, "BroadcastHashJoin") >= 1, s"vocab join lost its broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0)
    assert(count(p, "CartesianProduct") === 0)
  }

  test("embedding quantization is a pure projection: no exchange before the sort") {
    val p = finalPlan("quantize_embeddings")
    assert(count(p, "Exchange") <= 1, // only the final orderBy
      s"quantization added a shuffle:\n$p")
    assert(count(p, "Join") === 0, s"quantization should not join:\n$p")
  }

  test("incremental dedup probes the index by broadcast; the corpus never sort-merges") {
    val p = finalPlan("incremental_dedup")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"index probe or verify fetch lost its broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0, s"corpus-side shuffle crept in:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("PII scrub and compression signal are single-scan pure projections") {
    Seq("pii_scrub", "compression_signal").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "Scan parquet") === 1, s"$q re-scans the corpus:\n$p")
      assert(count(p, "Join") === 0, s"$q should not join:\n$p")
      assert(count(p, "HashAggregate") === 0, s"$q should not aggregate:\n$p")
      assert(count(p, "Exchange") <= 1, s"$q shuffles beyond the gate orderBy:\n$p")
    }
  }

  test("bloom contamination probes map-side and never goes cartesian") {
    val p = finalPlan("bloom_contamination")
    assert(p.contains("bloom_might_contain_long"),
      s"the Bloom prefilter fell out of the plan:\n$p")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("negative sampling joins on the bucket key, never cartesian") {
    val p = finalPlan("negative_samples")
    assert(count(p, "CartesianProduct") === 0, s"negative sampling went cartesian:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
    assert(count(p, "SortMergeJoin") === 0)
  }

  test("distinctive terms scan the corpus once; both consumers reuse the aggregate") {
    val p = finalPlan("distinctive_terms")
    assert(count(p, "Scan parquet") === 0,
      s"a consumer re-ran the corpus explode instead of reading the checkpoint:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("corpus report makes exactly two corpus passes (volumes+langs share a tree)") {
    val p = finalPlan("corpus_report")
    assert(count(p, "Scan parquet") <= 4, // union doubles each logical pass
      s"corpus_report re-scans beyond the volumes+langs / digest trees:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("ncm classify broadcasts one packed prototype row; corpus never sort-merges") {
    val p = finalPlan("ncm_classify")
    assert(count(p, "SortMergeJoin") === 0, s"ncm_classify shuffle-joined:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("semantic dedup joins on the cluster key, never cartesian") {
    val p = finalPlan("semantic_dedup")
    assert(count(p, "CartesianProduct") === 0, s"semantic_dedup went cartesian:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("chunk windows and cdc chunks ride the scan: one pass, no join, no aggregate") {
    Seq("chunk_windows", "cdc_chunks").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "Scan parquet") === 1, s"$q re-scans the corpus:\n$p")
      assert(count(p, "Join") === 0, s"$q should not join:\n$p")
      assert(count(p, "HashAggregate") === 0, s"$q should not aggregate:\n$p")
      assert(count(p, "Exchange") <= 1, s"$q shuffles beyond the gate orderBy:\n$p")
    }
  }

  test("lexical scoring joins stay broadcast: the corpus never shuffles for a join") {
    Seq("bm25_topk", "lm_bigram_score").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "BroadcastHashJoin") >= 1, s"$q lost its broadcast probes:\n$p")
      assert(count(p, "SortMergeJoin") === 0, s"$q shuffle-joined the corpus:\n$p")
      assert(count(p, "CartesianProduct") === 0)
    }
  }

  test("corpus diff is one co-partitioned full-outer join on hash projections") {
    val p = finalPlan("corpus_diff")
    assert(count(p, "FullOuter") >= 1, s"corpus_diff lost its full-outer join:\n$p")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("pagerank iterations never broadcast ranks or go cartesian") {
    val p = finalPlan("purchase_pagerank")
    assert(count(p, "CartesianProduct") === 0, s"pagerank went cartesian:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("hybrid RRF fuses query-bounded lists: broadcasts only, no sort-merge") {
    // the corpus-sized side of each retriever never shuffles for a join —
    // BM25 probes broadcast query vocab, the vector side broadcasts the
    // query vectors (the =!= condition makes that side nested-loop over
    // the BROADCAST queries, which is the designed plan, not a fallback);
    // fusion itself runs on |queries|×Σk rows
    val p = finalPlan("hybrid_rrf_topk")
    assert(count(p, "BroadcastHashJoin") >= 2, s"retrievers lost their broadcasts:\n$p")
    assert(count(p, "SortMergeJoin") === 0, s"hybrid fell back to sort-merge:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("pq encode is a pure projection; ADC scoring broadcasts the query LUTs") {
    // the corpus side never shuffles: encode is a HOF projection over a
    // literal codebook, and the scoring join is the queries BROADCAST
    // against the codes (the cross-with-filter plans as nested-loop over
    // the broadcast, which is the designed shape for a tiny query set)
    val p = finalPlan("pq_topk")
    assert(count(p, "SortMergeJoin") === 0, s"pq fell back to sort-merge:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"pq went cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"pq lost the query-LUT broadcast:\n$p")
  }

  test("fuzzy matching: the DP runs per distinct name pair, records join by broadcast") {
    // both expansion joins build on small sides (name pairs, record dim)
    // — broadcast hash joins, never a record-pair sort-merge or cartesian
    val p = finalPlan("fuzzy_name_pairs")
    assert(count(p, "BroadcastHashJoin") >= 2, s"fuzzy expansion lost its broadcasts:\n$p")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("scd2 intervals plan over ONE exchange: all windows share the entity key") {
    // the operator itself (no output sort): the change-flag window, the
    // running-sum window, the per-run aggregate, and the lead window all
    // cluster by user_id, so one hash exchange serves the whole plan
    val df = graft.operators.Behavioral.scd2Intervals(
      spark.read.parquet(s"$sf/events.parquet"), "user_id", "event_id", "event_type")
    df.collect()
    val full = df.queryExecution.executedPlan.toString()
    val cut = full.indexOf("== Initial Plan ==")
    val p = if (cut >= 0) full.substring(0, cut) else full
    assert(count(p, "Exchange") === 1, s"scd2 shuffled more than once:\n$p")
  }

  test("point-in-time lookup is the as-of shape: one keyed shuffle, no range join") {
    val p = finalPlan("scd2_point_lookup")
    assert(count(p, "CartesianProduct") === 0, s"point-in-time went cartesian:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0, s"range-join fallback:\n$p")
  }

  test("corr matrix is one partial-aggregated scan collapsing to a single row") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    val agg = graft.operators.Stats.corrMatrix(df,
      Seq("l_quantity", "l_extendedprice"))
    // the result frame is driver-built from ONE collected row; the scan
    // side shows up when the agg re-runs: assert the moment aggregation
    // partial-aggregates (HashAggregate x2) with a single exchange
    val plan = {
      def u(c: String) = col(c).cast("decimal(38,0)")
      val q = df.agg(org.apache.spark.sql.functions.count(col("l_quantity")),
        org.apache.spark.sql.functions.sum(u("l_quantity") * u("l_extendedprice")))
      q.collect()
      q.queryExecution.executedPlan.toString()
    }
    assert(count(plan, "HashAggregate") >= 2, s"moments not partial-aggregated:\n$plan")
    assert(agg.collect().length === 1)
  }

  test("whole-stage codegen covers the hot paths (no interpreted gaps in scans)") {
    Seq("q1_pricing_summary", "text_token_counts", "doc_fingerprints").foreach { q =>
      val p = finalPlan(q)
      val spans = "\\*\\((\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSet.size
      assert(spans >= 1, s"$q runs fully interpreted")
    }
  }

  test("k-means assignment is join-free: centroids ride as literals, no corpus join") {
    // the whole two-round pipeline may exchange for the final orderBy and
    // the (cluster, dim) update agg, but assignment must never join or
    // broadcast the corpus against a centroid table
    val p = finalPlan("kmeans_assign")
    assert(count(p, "Join") === 0, s"kmeans assignment joins:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("pareto skyline shuffles once on the group key; both windows share it") {
    val p = finalPlan("pareto_docs")
    // one exchange for the grouped windows + the gate's presentation sort
    assert(count(p, "Exchange") <= 2, s"skyline re-shuffles:\n$p")
    assert(count(p, "Join") === 0)
  }

  test("histogram broadcasts the one-row bounds and partial-aggregates the buckets") {
    val p = finalPlan("price_histogram")
    assert(count(p, "BroadcastNestedLoopJoin") + count(p, "BroadcastHashJoin") >= 1,
      s"bounds not broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0)
    assert(count(p, "HashAggregate") >= 2, s"bucket agg not partial:\n$p")
  }

  test("bpe pair counts partial-aggregate both levels (word freq, pair sum)") {
    val p = finalPlan("bpe_pair_counts")
    assert(count(p, "HashAggregate") >= 4, s"missing map-side combine:\n$p")
    assert(count(p, "TakeOrderedAndProject") === 1, s"top-N not TakeOrdered:\n$p")
  }

  test("char diversity rides the scan: no join, no exchange before the sort") {
    val p = finalPlan("char_diversity")
    assert(count(p, "Join") === 0)
    assert(count(p, "HashAggregate") === 0, s"char_diversity aggregates:\n$p")
  }

  test("hybrid join broadcasts the hot slice; nothing goes cartesian") {
    val p = finalPlan("hybrid_join")
    assert(count(p, "BroadcastHashJoin") >= 2, // hot-key routing + hot-slice join
      s"hybrid join lost its broadcasts:\n$p")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("rolling sums and rank normalize share one key partitioning; no joins") {
    Seq("rolling_user_value", "rank_normalize").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "Join") === 0, s"$q joins:\n$p")
      // the key-partitioned window + the gate's presentation sort
      assert(count(p, "Exchange") <= 3, s"$q re-shuffles:\n$p")
    }
  }

  test("media fingerprint dedup joins on band keys, never cartesian") {
    Seq("image_near_dups", "media_fingerprint_dups", "video_content_dups").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "CartesianProduct") === 0, s"$q went cartesian:\n$p")
      assert(count(p, "BroadcastNestedLoopJoin") === 0, s"$q nested-loops:\n$p")
    }
  }

  test("q7/q10 warehouse joins: dims broadcast, facts never nested-loop") {
    Seq("q7_volume_shipping", "q10_returned_items").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "BroadcastHashJoin") >= 1, s"$q lost its dim broadcast:\n$p")
      assert(count(p, "CartesianProduct") === 0, s"$q went cartesian:\n$p")
      assert(count(p, "BroadcastNestedLoopJoin") === 0, s"$q nested-loops:\n$p")
    }
  }

  test("q18 aggregates lineitem BEFORE its joins (aggregate-then-join shape)") {
    val p = finalPlan("q18_large_orders")
    // partial + final agg on l_orderkey, then the joins; top-100 is
    // TakeOrdered, never a global sort
    assert(count(p, "HashAggregate") >= 2, s"q18 lost map-side combine:\n$p")
    assert(count(p, "TakeOrderedAndProject") === 1, s"q18 sorts globally:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("q22 broadcasts the 1-row stats; the anti-join stays hash-keyed") {
    val p = finalPlan("q22_idle_customers")
    assert(count(p, "BroadcastNestedLoopJoin") <= 1, // the 1-row stats crossJoin only
      s"q22 nested-loops beyond the scalar broadcast:\n$p")
    assert(count(p, "LeftAnti") >= 1, s"q22 lost its anti-join:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("cube report is ONE Expand + one aggregation pass, no join") {
    val p = finalPlan("cube_report")
    assert(count(p, "Expand") === 1, s"cube re-scans per grouping set:\n$p")
    assert(count(p, "Join") === 0)
  }

  test("line boilerplate joins on digests with partial aggregation, no broadcast of the df table") {
    val p = finalPlan("line_boilerplate")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
    assert(count(p, "HashAggregate") >= 2, s"line df count not partial:\n$p")
  }

  test("linear logit inference adds no join: weights fold into the projection") {
    val p = finalPlan("quality_lr_logit")
    assert(count(p, "Join") === 0, s"logit inference joins:\n$p")
    assert(count(p, "HashAggregate") >= 2, s"logit agg not partial:\n$p")
  }

  test("k-anonymity is one partial-aggregated groupBy") {
    val p = finalPlan("k_anonymity")
    assert(count(p, "Join") === 0)
    assert(count(p, "HashAggregate") >= 2, s"class count not partial:\n$p")
  }

  test("q4 EXISTS plans a semi join keyed on orderkey, never a nested loop") {
    val p = finalPlan("q4_late_orders")
    assert(count(p, "LeftSemi") >= 1, s"q4 lost its semi join:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0, s"q4 nested-loops:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("range bracket join is a broadcast equi-join, never a nested loop") {
    val p = finalPlan("range_bracket_join")
    assert(count(p, "BroadcastHashJoin") >= 1, s"range join lost its broadcast:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0, s"range join nested-loops:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("TPC-H completion family: dims broadcast, decorrelations stay hash-keyed") {
    // q19/q21 are empty at sf0.001 (AQE collapses an empty plan to
    // EmptyRelation, leaving nothing to assert) — pin them at sf0.01
    val at01 = Set("q19_disjunctive_revenue", "q21_waiting_suppliers")
    Seq("q2_min_cost_supplier", "q8_market_share", "q9_profit_by_nation",
        "q16_supplier_counts", "q17_small_quantity_revenue",
        "q19_disjunctive_revenue", "q20_excess_suppliers").foreach { q =>
      val p = if (at01(q)) finalPlanAt(q, "/root/testdata/sf0.01") else finalPlan(q)
      assert(count(p, "BroadcastNestedLoopJoin") === 0, s"$q nested-loops:\n$p")
      assert(count(p, "CartesianProduct") === 0, s"$q goes cartesian:\n$p")
      assert(count(p, "BroadcastHashJoin") >= 1, s"$q lost its broadcasts:\n$p")
    }
  }

  test("q21 double-EXISTS is aggregations + keyed joins, no self-join blowup") {
    val p = finalPlanAt("q21_waiting_suppliers", "/root/testdata/sf0.01")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
    assert(count(p, "HashAggregate") >= 4, s"q21 lost its per-order aggregations:\n$p")
  }

  test("co-purchase pairs never self-join: group, emit pairs, count") {
    val p = finalPlan("copurchase_pairs")
    assert(count(p, "Join") === 0, s"copurchase self-joins:\n$p")
    assert(count(p, "Generate") >= 1, s"pair explode missing:\n$p")
  }

  test("merge upsert is exactly one co-partitioned join") {
    val p = finalPlan("merge_upsert")
    assert(count(p, "Join") === 1, s"merge should be a single join:\n$p")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("LOCF resample: keyed windows and an output-bound grid explode") {
    val p = finalPlan("resample_locf")
    assert(count(p, "Generate") >= 1, s"grid explode missing:\n$p")
    assert(count(p, "Window") >= 1, s"LOCF window missing:\n$p")
    assert(count(p, "CartesianProduct") === 0)
    assert(!p.contains("No Partition Defined"), "unkeyed window")
  }

  test("DSv2 log scans carry pushed position filters in the scan description") {
    Seq("log_segment_scan", "bulk_import_scan").foreach { q =>
      val p = finalPlan(q)
      assert(p.contains("graft-log"), s"$q not reading through the DSv2 table:\n$p")
      assert(p.contains("PushedFilters=[") && p.contains("position"),
        s"$q lost its position pushdown:\n$p")
    }
  }

  test("incremental rollup is union + aggregate: no join, partial combine on both arms") {
    val p = finalPlan("incremental_rollup")
    assert(count(p, "Join") === 0, s"rollup maintenance must not join:\n$p")
    assert(count(p, "HashAggregate") >= 2, s"missing partial aggregation:\n$p")
  }

  test("sequential patterns: one keyed window, aggregation, no join") {
    val p = finalPlan("seq_patterns")
    assert(count(p, "Window") >= 1)
    assert(count(p, "Join") === 0, s"pattern mining must not join:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("link prediction emits pairs per hub: no cartesian, no nested loop") {
    val p = finalPlan("link_prediction")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
    assert(count(p, "Generate") >= 1, s"pair emission lost its explode:\n$p")
    assert(count(p, "HashAggregate") >= 2, s"pair counts lost map-side combine:\n$p")
  }

  test("attribution is one keyed window then filter: no join, no cartesian") {
    val p = finalPlan("attribution_last_touch")
    assert(count(p, "Window") >= 1)
    assert(count(p, "Join") === 0, s"attribution must not join:\n$p")
  }

  test("khop BFS rounds stay keyed: no cartesian, no nested loop") {
    val p = finalPlan("khop_distances")
    assert(count(p, "CartesianProduct") === 0)
    assert(count(p, "BroadcastNestedLoopJoin") === 0)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The 100 TB lever for selective dim→fact joins that are too big to
    // broadcast: Spark's InjectRuntimeFilter builds a bloom filter from
    // the filtered creation side and semi-filters the fact scan before
    // the shuffle. Defaults keep it off below 10 GB scans; this pins
    // that the engine DOES inject one once thresholds match the data.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k =>
      k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      import org.apache.spark.sql.functions.col
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      j.collect()
      val p = j.queryExecution.executedPlan.toString()
      assert(p.contains("might_contain") || p.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n${p.take(4000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("CDC replay and churn: one keyed pass each, no join") {
    Seq("cdc_apply", "cdc_churn").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "Join") === 0, s"$q joins:\n$p")
      // key exchange (+ the gate's presentation sort)
      assert(count(p, "Exchange") <= 3, s"$q re-shuffles:\n$p")
    }
  }

  test("feature scaling broadcasts the moments frame; the fact side never re-shuffles") {
    val p = finalPlan("feature_scaling")
    assert(count(p, "BroadcastHashJoin") === 1, s"moments not broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0, s"fell back to sort-merge:\n$p")
  }

  test("interpolation grid: running frames only — the quadratic following frame is banned") {
    Seq("resample_interp", "resample_locf").foreach { q =>
      val p = finalPlanAt(q, sf).toLowerCase
      assert(!p.contains("unboundedfollowing"),
        s"$q uses an O(span^2) unbounded-following frame")
    }
  }

  test("anomaly flags and journey paths: keyed windows, no join, no cartesian") {
    Seq("zscore_alerts", "conversion_paths").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "Join") === 0, s"$q joins:\n$p")
      assert(count(p, "CartesianProduct") === 0, s"$q went cartesian:\n$p")
    }
  }

  test("validation report: row rules collapse to one aggregate per table scan") {
    val p = finalPlan("data_validation")
    // row rules: ONE single-partition aggregate per table; the FK probe's
    // anti-join stays hash-keyed. The one tolerated nested-loop is
    // fkReport's 1-row × 1-row totals cross — constant-sized by shape.
    assert(count(p, "BroadcastNestedLoopJoin") <= 1, s"validation nested-loops:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"validation multiplies frames:\n$p")
  }

  test("sweep-line concurrency: explode + one keyed window + one aggregate, no join") {
    val p = finalPlan("concurrency_peak")
    assert(count(p, "Generate") >= 1, s"endpoint explode missing:\n$p")
    assert(count(p, "Join") === 0, s"concurrency_peak joins:\n$p")
  }

  test("stock ledger: secondary sort + fold, exactly one exchange before the presentation sort") {
    val p = finalPlan("stock_ledger")
    assert(count(p, "Join") === 0, s"ledger joins:\n$p")
    // key repartition + the gate's orderBy range exchange; nothing else
    assert(count(p, "Exchange") <= 2, s"ledger re-shuffles:\n$p")
  }

  test("item CF broadcasts the degree frames onto the pair table") {
    val p = finalPlan("item_cf_topk")
    assert(count(p, "BroadcastHashJoin") >= 2, s"degree frames not broadcast:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"item CF went cartesian:\n$p")
    assert(count(p, "SortMergeJoin") === 0, s"item CF sort-merges:\n$p")
  }

  test("gini / equidepth / ledger family: keyed windows, no cartesian") {
    Seq("gini_revenue", "price_equidepth", "new_vs_returning").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "CartesianProduct") === 0, s"$q went cartesian:\n$p")
      assert(count(p, "BroadcastNestedLoopJoin") === 0, s"$q nested-loops:\n$p")
    }
  }

  test("containment pairs: candidate generation is an equi-join, never all-pairs") {
    val p = finalPlan("containment_pairs")
    assert(count(p, "CartesianProduct") === 0, s"containment went cartesian:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0, s"containment nested-loops:\n$p")
  }

  test("seasonal decomposition: window partitioned by key, single data-sized agg") {
    val p = finalPlan("seasonal_decompose")
    // the window must be keyed — a global (empty-partition) window would
    // serialize the whole series table through one task; keyed windows
    // sit on a hash exchange over the series key
    assert(p.contains("hashpartitioning(event_type"),
      s"seasonal window lost its event_type partitioning:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("theil-sen: pair expansion stays inside a projection — no join at all") {
    val p = finalPlan("theil_sen_trend")
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "CartesianProduct", "BroadcastNestedLoopJoin").foreach { op =>
      assert(count(p, op) === 0, s"theil_sen grew a $op:\n$p")
    }
  }

  test("cusum: keyed windows + a broadcast totals join, nothing data-sized twice") {
    val p = finalPlan("cusum_changepoint")
    assert(p.contains("hashpartitioning(event_type"),
      s"cusum window lost its keyed partitioning:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 1, s"cusum totals join lost broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0 && count(p, "CartesianProduct") === 0)
  }

  test("fd audit: per-candidate pruned passes, never one Expand multi-distinct") {
    val p = finalPlan("fd_audit")
    assert(count(p, "Expand") === 0, s"fd_audit regressed to Expand:\n$p")
    assert(count(p, "CartesianProduct") === 0)
  }

  test("sync digest: commutative sums partial-aggregate; the diff joins buckets only") {
    val p = finalPlan("sync_digest")
    assert(count(p, "partial_sum") >= 2, s"sync_digest lost map-side combine:\n$p")
    assert(count(p, "CartesianProduct") === 0)
    // three exchanges total: one per digest side (|buckets| rows each)
    // plus the final order-by range partition; the full-outer bucket
    // join must ride the agg exchanges, not add its own (FullOuter
    // cannot broadcast — a 64-row sort-merge there is correct)
    assert(count(p, "Exchange") === 3, s"sync_digest grew an extra exchange:\n$p")
  }

  test("funnel CEP: step filter pushes to the scan before the state shuffle") {
    val p = finalPlan("funnel_state_batch")
    // batch mode lowers flatMapGroupsWithState to MapGroups
    assert(count(p, "MapGroups") === 1, s"funnel lost its state operator:\n$p")
    assert(p.contains("In(event_type"),
      s"funnel's step filter stopped pushing into the parquet scan:\n$p")
  }

  test("ivm join delta: every join broadcasts its small side, none degenerate") {
    val p = finalPlan("ivm_join_delta")
    assert(count(p, "BroadcastHashJoin") >= 2, s"ivm deltas lost broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0 && count(p, "CartesianProduct") === 0)
  }

  test("profiling/association gates never go cartesian") {
    Seq("collocations", "t_closeness", "spearman_corr", "seasonal_outliers",
        "quantile_align", "srm_check", "ind_audit", "order_audit").foreach { q =>
      assert(count(finalPlan(q), "CartesianProduct") === 0, s"$q went cartesian")
    }
  }

  test("recall-overlap gates: k-bounded equi-join intersections, brute force confined to the retrievers") {
    // the overlap machinery itself must never go quadratic: its joins
    // are equi-joins on (query, id) over k-bounded frames. Sort-merge is
    // acceptable there (the n_a/n_b FULL OUTER cannot broadcast by
    // definition, and the retrievers' own plans are pinned by their own
    // gates) — the invariant worth pinning is no nested-loop pairing
    // beyond the retrievers' intended broadcast brute-force scoring
    Seq("ann_recall_overlap", "ivf_recall_overlap").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "CartesianProduct") === 0, s"$q went cartesian:\n$p")
    }
  }

  test("time-weighted value: one keyed exchange feeds window and aggregate; horizon broadcasts") {
    val p = finalPlan("time_weighted_value")
    // events shuffle once on user_id (the lead window's partitioning is
    // reused by the groupBy); the one-row horizon arrives by broadcast
    assert(count(p, "Exchange hashpartitioning") <= 1,
      s"timeWeightedAvg re-shuffled between window and aggregate:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 1 &&
      count(p, "CartesianProduct") === 0,
      s"horizon stopped broadcasting:\n$p")
  }

  test("mann-whitney: distributed midrank — the data-sized window is keyed, only the |partitions| offsets frame is global") {
    val p = finalPlan("mann_whitney_u")
    // the data-sized pass is the count-by-value aggregate (map-side
    // combined); the cumulative midrank prefix then runs PARTITIONED by
    // spark_partition_id over the range-repartitioned |distinct v|
    // frame (r12: survives continuous domains where |distinct v| ≈
    // |rows|), and the ONLY single-partition window sits on the
    // |shuffle partitions|-row offsets aggregate, which joins back by
    // broadcast. Nothing sort-merges, nothing goes quadratic.
    assert(count(p, "HashAggregate") >= 2, s"lost the partial aggregate:\n$p")
    assert(count(p, "Window") === 2, s"window count changed:\n$p")
    assert(p.contains("hashpartitioning(_pid"),
      s"midrank window is no longer keyed by partition id:\n$p")
    assert("windowspecdefinition\\(_pid#\\d+, v#".r.findFirstIn(p).isDefined,
      s"the data-sized window lost its _pid partitioning:\n$p")
    assert("HashAggregate\\(keys=\\[_pid".r.findFirstIn(p).isDefined,
      s"offsets no longer aggregate per partition id:\n$p")
    assert(count(p, "BroadcastHashJoin") === 1,
      s"offsets stopped broadcasting back:\n$p")
    Seq("SortMergeJoin", "BroadcastNestedLoopJoin",
        "CartesianProduct").foreach { op =>
      assert(count(p, op) === 0, s"mann_whitney_u grew a $op:\n$p")
    }
  }

  test("chi-square drift: two partial-aggregated counts, a category-frame join, one-row totals broadcast — never data-sized pairing") {
    val p = finalPlan("chi_square_drift")
    // the two data-sized passes are the category counts (map-side
    // combined); the full-outer join runs on the |categories| frame and
    // the totals ride as a one-row broadcast nested loop
    assert(count(p, "HashAggregate") >= 4, s"lost partial category counts:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"chi_square_drift went cartesian:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 1,
      s"totals stopped broadcasting as the one-row BNLJ:\n$p")
  }

  test("prototype distances: assignment is a pure projection; only the k-row median frame joins back, by broadcast") {
    val p = finalPlan("prototype_distances")
    // seeds ride as literals — the corpus never joins for assignment;
    // the median window partitions by cluster; the |k|-row median frame
    // is the single (broadcast) join
    assert(count(p, "Window") >= 1 && count(p, "Window") <= 2,
      s"median windows changed shape:\n$p")
    assert(count(p, "BroadcastHashJoin") === 1,
      s"median frame stopped broadcasting:\n$p")
    Seq("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
      .foreach { op =>
        assert(count(p, op) === 0, s"prototype_distances grew a $op:\n$p")
      }
    assert(count(p, "Exchange SinglePartition") === 0,
      s"unexpected single-partition funnel:\n$p")
  }

  test("kn rare-rate scoring joins the corpus bigrams against the model without cartesian; one partial-aggregated doc rollup") {
    val p = finalPlan("kn_rare_rate")
    // the corpus-sized pass is the bigram explode + model join (left,
    // equi on (w1,w2) — broadcast at this scale) + groupBy(doc_id) with
    // map-side combine; nothing pairs quadratically
    assert(count(p, "HashAggregate") >= 2, s"lost the partial doc rollup:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"kn_rare_rate went cartesian:\n$p")
    // the model side may broadcast (expected here) or shuffle by key at
    // vocab scale — but a one-row BNLJ is only legal for the n_types
    // total inside the model fit, never for the scoring join
    assert(count(p, "BroadcastNestedLoopJoin") <= 1,
      s"scoring join degenerated to nested-loop:\n$p")
  }

  test("kneser-ney model: one data-sized bigram count; smoothing joins on the type frame; one-row total broadcasts") {
    val p = finalPlan("kn_bigram_model")
    // the only cross pairing is the one-row N1+(..) total riding a
    // broadcast nested loop; left totals / continuation counts join the
    // |bigram types| frame (broadcast or sort-merge both acceptable —
    // the frame is reduced either way)
    assert(count(p, "BroadcastNestedLoopJoin") <= 1 &&
      count(p, "CartesianProduct") === 0,
      s"kn_bigram_model paired something beyond the one-row total:\n$p")
  }

  test("cluster pair eval: C(n,2) arithmetic, never a pair join") {
    val p = finalPlan("cluster_pair_eval")
    // three keyed counts reduced to one row apiece, cross-joined as
    // one-row broadcasts: the assignment frame must never self-join
    // (a naive pairwise eval materializes O(n^2) pairs)
    assert(count(p, "CartesianProduct") === 0, s"pair eval went cartesian:\n$p")
    assert(count(p, "SortMergeJoin") === 0,
      s"pair eval self-joined the assignment frame:\n$p")
  }

  test("url normalization is a pure projection: the only exchange is the presentation sort") {
    val p = finalPlan("url_normalize")
    assert(count(p, "Exchange") <= 1, s"normalizer added a shuffle:\n$p")
    assert(count(p, "HashAggregate") === 0, s"normalizer aggregates:\n$p")
  }

  test("registrable-domain histogram: suffix match stays a projection (no join against the list)") {
    val p = finalPlan("url_domains")
    assert(count(p, "BroadcastHashJoin") === 0 && count(p, "SortMergeJoin") === 0,
      s"PSL match became a join:\n$p")
    assert(count(p, "HashAggregate") >= 2, "domain count lost map-side combine")
  }

  test("domain blocklist is a broadcast anti-join; the corpus side never shuffles for it") {
    val p = finalPlan("domain_blocklist_filter")
    assert(count(p, "BroadcastHashJoin") >= 1, s"blocklist lost its broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0, s"blocklist shuffled the corpus:\n$p")
  }

  test("hll registers: one partial-aggregated exchange of <= m rows per task, no join") {
    Seq("hll_registers", "hll_merge_registers").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "HashAggregate") >= 2, s"$q lost map-side register combine")
      assert(count(p, "BroadcastHashJoin") + count(p, "SortMergeJoin") === 0,
        s"$q joins:\n$p")
    }
  }

  test("cms counters: single scan (posexplode, not d unions), partial-aggregated, no join") {
    Seq("cms_counters", "cms_merge_counters").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "HashAggregate") >= 2, s"$q lost map-side cell combine")
      assert(count(p, "BroadcastHashJoin") + count(p, "SortMergeJoin") === 0,
        s"$q joins:\n$p")
    }
  }

  test("cms estimates: the bounded counter table broadcasts; the key side never shuffles for the lookup") {
    val p = finalPlan("cms_estimates")
    assert(count(p, "BroadcastHashJoin") >= 1, s"counter lookup lost its broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0, s"counter lookup shuffled:\n$p")
  }

  test("blocked-term screen: one combined regex per row — pure projection, no explode/join") {
    val p = finalPlan("blocked_term_hits")
    assert(count(p, "Exchange") <= 1, s"term screen added a shuffle:\n$p")
    assert(count(p, "Generate") === 0, s"term screen exploded tokens:\n$p")
  }

  test("cms join-size estimate: sketch-only arithmetic — the data is never re-joined") {
    val p = finalPlan("cms_join_size")
    assert(count(p, "CartesianProduct") === 0, s"join-size estimate went cartesian:\n$p")
    // the only join allowed is between the two <= d·w-row counter tables
    assert(count(p, "SortMergeJoin") === 0, s"counter tables sort-merged:\n$p")
  }

  test("nfc normalization is a pure projection (native expression, no shuffle)") {
    val p = finalPlan("nfc_normalize")
    assert(count(p, "Exchange") <= 1, s"normalize added a shuffle:\n$p")
    assert(count(p, "HashAggregate") === 0, s"normalize aggregates:\n$p")
  }

  test("grouped hll state: two chained partial aggregates, no join, no window") {
    val p = finalPlan("hll_grouped_state")
    assert(count(p, "HashAggregate") >= 2, "grouped registers lost map-side combine")
    assert(count(p, "BroadcastHashJoin") + count(p, "SortMergeJoin") === 0,
      s"grouped state joins:\n$p")
    assert(count(p, "Window") === 0, s"grouped state windows:\n$p")
  }

  test("ccnet buckets: distributed tiling — slice-keyed rank, offsets BROADCAST back") {
    // r13: scoreBuckets moved onto Stats.distributedNtile. The rank
    // window is slice-partitioned (covered by the equi-depth pin too);
    // the one join is the bounded offsets frame and must stay a
    // broadcast — a sort-merge here would mean the
    // |partitions|·|groups| frame stopped being recognized as tiny.
    val p = finalPlan("ccnet_buckets")
    assert(count(p, "Window") >= 1, "bucket split lost its window")
    assert(count(p, "BroadcastHashJoin") >= 1, s"offsets join lost its broadcast:\n$p")
    assert(count(p, "SortMergeJoin") === 0, s"bucket split sort-merge joins:\n$p")
  }

  test("distinct-n diversity: ngrams build inside the row; word-count-shaped aggregation only") {
    val p = finalPlan("distinct_bigram_diversity")
    assert(count(p, "Window") === 0, s"ngram build fell into a window:\n$p")
    assert(count(p, "SortMergeJoin") + count(p, "CartesianProduct") === 0,
      s"diversity joined:\n$p")
    assert(count(p, "HashAggregate") >= 2, "diversity lost partial aggregation")
  }

  test("qdigest builds (plain, weighted, grouped): map-side-combined leaf aggregate, then NO further exchange") {
    Seq("qdigest_nodes", "qdigest_weighted_nodes", "qdigest_grouped_nodes").foreach { q =>
      val p = finalPlan(q)
      // one shuffle for the leaf groupBy + the presentation sort; the
      // level-synchronous compression must add no per-level exchanges
      // or joins (single task for plain/weighted, one task per group
      // for grouped)
      assert(count(p, "HashAggregate") >= 2, s"$q lost map-side combine:\n$p")
      assert(count(p, "BroadcastHashJoin") + count(p, "SortMergeJoin")
        + count(p, "CartesianProduct") === 0, s"$q compress joins:\n$p")
      assert(count(p, "Window") === 0, s"$q compress windows:\n$p")
    }
  }

  test("bleu counts: word-count-shaped aggregates and equi-joins only") {
    val p = finalPlan("bleu_ngram_counts")
    assert(count(p, "CartesianProduct") === 0, s"bleu went cartesian:\n$p")
    assert(count(p, "Window") === 0, s"bleu windows:\n$p")
    assert(count(p, "HashAggregate") >= 2, "bleu lost partial aggregation")
  }

  test("qdigest ranks: the digest broadcasts; the probe side never shuffles") {
    val p = finalPlan("qdigest_ranks")
    assert(count(p, "SortMergeJoin") === 0, s"rank probe shuffled:\n$p")
    assert(count(p, "CartesianProduct") === 0, s"rank probe went cartesian:\n$p")
  }

  test("hits: keyed joins plus one-row normalization broadcasts only — never a data-sized cartesian") {
    val p = finalPlan("purchase_hits")
    assert(count(p, "CartesianProduct") === 0, s"hits went cartesian:\n$p")
    // the sum-normalization is a one-row BNLJ broadcast per half-step
    // (3 iterations x 2 halves = 6), the pagerank-family discipline;
    // anything beyond that bound means a real join degenerated
    assert(count(p, "BroadcastNestedLoopJoin") <= 6, s"hits grew data-sized BNLJs:\n$p")
  }

  test("gini/chao1: two chained aggregates, no join, no window") {
    Seq("source_lang_gini", "vocab_chao1").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "HashAggregate") >= 2, s"$q lost partial aggregation:\n$p")
      assert(count(p, "BroadcastHashJoin") + count(p, "SortMergeJoin")
        + count(p, "CartesianProduct") === 0, s"$q joins:\n$p")
      assert(count(p, "Window") === 0, s"$q windows:\n$p")
    }
  }

  test("relevance eval and pair audit never degenerate to a cartesian product") {
    // NOTE on what this does and does not pin: both gates legitimately
    // contain non-equi joins upstream (the brute-force scoring theta
    // join in mrr's exact side, the all-pairs id_a < id_b join in the
    // recall audit's ground truth) which plan as one-sided
    // BroadcastNestedLoopJoins on the bounded fixtures — so a BNLJ
    // count can't distinguish those from a regression. The invariant
    // that CAN be pinned is the absence of an unbroadcastable
    // CartesianProduct, the only shape that is catastrophic at scale.
    Seq("mrr_hits_eval", "minhash_recall_pairs").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "CartesianProduct") === 0, s"$q went cartesian:\n$p")
    }
  }

  test("unigram-LM: Viterbi is a pure projection over the word table — no join against a piece table, no window, no cartesian") {
    // the piece vocabulary is bounded (26 + seedMulti) and inlined as a
    // literal map, so segmentation/encode must never plan a join for it;
    // the only joins allowed are the corpus word -> segmented-word
    // equi-join in encodeIds (hash/broadcast)
    Seq("unigram_lm_train", "unigram_lm_segment", "unigram_lm_encode",
        "unigram_lm_roundtrip").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "CartesianProduct") === 0, s"$q went cartesian:\n$p")
      assert(count(p, "BroadcastNestedLoopJoin") === 0, s"$q has a nested-loop join:\n$p")
      assert(count(p, "Window") === 0, s"$q plans a window (ids must be driver-assigned):\n$p")
    }
    // train's RESULT is the driver-assembled piece table (LocalTableScan
    // — the EM's corpus jobs run separately); the serving gates' final
    // plans must keep the word collapse map-side combined
    Seq("unigram_lm_segment", "unigram_lm_encode", "unigram_lm_roundtrip").foreach { q =>
      val p = finalPlan(q)
      assert(count(p, "HashAggregate") >= 2, s"$q lost map-side partial aggregation:\n$p")
    }
    // segment is join-free end to end: one aggregate chain + projection
    val seg = finalPlan("unigram_lm_segment")
    assert(count(seg, "Join") === 0, s"segment should not join:\n$seg")
  }

  test("suffix dedup: keyed shuffles only — no cartesian, no nested-loop, class counts map-side combined") {
    // the doubling rounds run behind localCheckpoints; the visible final
    // plan is the class-count + island-merge tail, which must stay a
    // keyed aggregate + equi-join + per-doc window
    val p = finalPlan("suffix_dedup")
    assert(count(p, "CartesianProduct") === 0, s"suffix_dedup went cartesian:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0, s"suffix_dedup has a nested-loop join:\n$p")
    assert(count(p, "HashAggregate") >= 2, s"suffix_dedup lost map-side partial aggregation:\n$p")
  }

  test("suffix LRS: adjacency is an equi-join on rank+1, the answer a bounded top-1 — never a sort-the-world") {
    // the classes frame sits behind a localCheckpoint; the visible tail
    // is the within/adjacent candidate union + limit 1. A CartesianProduct
    // (all-pairs LCP) or a global Sort surviving to the root (instead of
    // TakeOrderedAndProject's per-partition heads) would be the
    // 100TB-fatal shapes
    val p = finalPlan("suffix_lrs")
    assert(count(p, "CartesianProduct") === 0, s"suffix_lrs went cartesian:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") === 0, s"suffix_lrs has a nested-loop join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"suffix_lrs top-1 should plan TakeOrderedAndProject, not a global sort:\n$p")
  }
}
