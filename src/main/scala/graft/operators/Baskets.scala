package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence — the co-view/co-purchase pair counts
  * behind "users who bought X also bought Y" and item-similarity
  * features. The naive formulation is a self-join of the (basket, item)
  * relation on basket, which shuffles the pair relation TWICE and
  * explodes quadratically on spam baskets (one 10k-item basket emits
  * 50M pairs). This builds pairs inside each basket group instead:
  *
  *   1. distinct (basket, item) → `collect_set` per basket (ONE shuffle,
  *      map-side combined);
  *   2. sort the item array and cap it at `maxBasketSize` (the standard
  *      spam-basket guard: beyond a few hundred items a basket carries
  *      no pairwise signal, only cost — the cap keeps the worst basket's
  *      emission at maxBasketSize²/2 and is deterministic, smallest
  *      items win);
  *   3. emit ordered pairs (a < b) with an array comprehension — codegen
  *      `transform`/`slice`/`flatten`, no UDF, no second shuffle of the
  *      input;
  *   4. count per pair (map-side combine) and keep `minSupport`+.
  *
  * 100 TB shape: two keyed exchanges total (basket, then pair), emission
  * bounded by Σ min(|basket|, cap)², and the pair frame that crosses the
  * second exchange is already partially combined. */
object Baskets {

  /** Directional association-rule counts: for every co-occurring pair,
    * (a, b, n_ab, n_a, n_b, n_total) — the INTEGER ingredients of
    * confidence (n_ab/n_a) and lift (n_ab·n_total/(n_a·n_b)), which are
    * left to the consumer: the counts carry strictly more information
    * and no engine ever divides (house determinism rule). Both rule
    * directions are emitted (a→b and b→a share n_ab).
    *
    * Cost on top of [[cooccurrence]]: one |items|-sized aggregate
    * (broadcast to the pair frame — item cardinality ≪ pair cardinality
    * by construction) and a 1-row basket-count crossJoin. */
  def ruleStats(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketSize: Int = 512,
      minSupport: Long = 1L): DataFrame = {
    val pairs = cooccurrence(df, basketCol, itemCol, maxBasketSize, minSupport)
    val directed = pairs.unionByName(pairs.select(
      col("b").as("a"), col("a").as("b"), col("n_baskets")))
    val items = df.select(col(basketCol).as("_basket"), col(itemCol).as("_item")).distinct()
    val itemCounts = items.groupBy("_item").agg(count(lit(1)).as("_n_item"))
    val total = items.select("_basket").distinct()
      .agg(count(lit(1)).as("n_total"))
    directed
      .join(broadcast(itemCounts).withColumnRenamed("_item", "a")
        .withColumnRenamed("_n_item", "n_a"), Seq("a"))
      .join(broadcast(itemCounts).withColumnRenamed("_item", "b")
        .withColumnRenamed("_n_item", "n_b"), Seq("b"))
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_baskets").as("n_ab"),
        col("n_a"), col("n_b"), col("n_total"))
  }

  /** Co-occurrence counts: (a, b, n_baskets) with a < b,
    * n_baskets >= minSupport. */
  def cooccurrence(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketSize: Int = 512,
      minSupport: Long = 1L): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2: $maxBasketSize")
    val items = df.select(col(basketCol).as("_basket"), col(itemCol).as("_item"))
      .distinct()
      .groupBy("_basket")
      .agg(slice(sort_array(collect_set(col("_item"))), 1, maxBasketSize).as("_items"))
      .filter(size(col("_items")) >= 2)
    items
      .select(explode(expr(
        // ordered pairs of the sorted array: x pairs with every later y
        """flatten(transform(_items, (x, i) ->
          |  transform(slice(_items, i + 2, size(_items)), y -> struct(x AS a, y AS b))))"""
          .stripMargin)).as("_pair"))
      .select(col("_pair.a").as("a"), col("_pair.b").as("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
  }

  /** Holdout evaluation of co-occurrence recommendations — the offline
    * eval loop a recommender pipeline runs before shipping a model:
    * split transactions by time (the `isTestCol` flag), build item
    * co-occurrence on the TRAIN side only, recommend each user the
    * top-k items co-occurring with their train items (summed co-counts,
    * ties to the smaller item id — a total order), excluding what they
    * already bought, and score hits against the TEST side. One summary
    * row: users recommended, recs issued, hits, test users, test
    * pairs — precision@k = hits/recs and recall = hits/test_pairs
    * render downstream as the two honest fractions.
    *
    * Time-based splitting is the correctness point: a random split
    * leaks future co-purchases into training and inflates every
    * metric (the `split_leakage` gate's lesson applied to recs).
    *
    * Shape: rides [[cooccurrence]] (bounded pair expansion, never
    * items×items); scoring joins the |users|×|train-items| distinct
    * frame to the directed pair table on the item key; the per-user
    * top-k is the stratified-sample ranking shape. Everything after
    * collapses to ONE row. */
  def recsHoldoutEval(
      tx: DataFrame, basketCol: String, userCol: String, itemCol: String,
      isTestCol: String, k: Int = 5, minCo: Long = 2L,
      maxBasketSize: Int = 512): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    val train = tx.filter(!col(isTestCol))
    val test = tx.filter(col(isTestCol))
    val co = cooccurrence(train, basketCol, itemCol, maxBasketSize, minCo)
    val directed = co.select(col("a").as("_from"), col("b").as("_to"), col("n_baskets"))
      .union(co.select(col("b").as("_from"), col("a").as("_to"), col("n_baskets")))
    val trainUI = train.select(col(userCol).as("_u"), col(itemCol).as("_i")).distinct()
    val scores = trainUI.join(directed, col("_i") === col("_from"))
      .groupBy(col("_u"), col("_to"))
      .agg(sum(col("n_baskets")).as("_score"))
      .join(trainUI.select(col("_u"), col("_i").as("_to")), Seq("_u", "_to"), "left_anti")
    val recs = scores.withColumn("_rn", row_number().over(
        Window.partitionBy(col("_u")).orderBy(col("_score").desc, col("_to").asc)))
      .filter(col("_rn") <= k)
      .localCheckpoint() // consumed twice (summary + hits); the rec build must not re-run
    val testUI = test.select(col(userCol).as("_u"), col(itemCol).as("_to")).distinct()
      .localCheckpoint()
    val hits = recs.join(testUI, Seq("_u", "_to"), "left_semi")
    recs.agg(count_distinct(col("_u")).as("n_users_recommended"),
        count(lit(1)).as("total_recs"))
      .crossJoin(hits.agg(count(lit(1)).as("total_hits")))
      .crossJoin(testUI.agg(count_distinct(col("_u")).as("n_test_users"),
        count(lit(1)).as("total_test_pairs")))
  }

  /** Item-item cosine similarity over implicit binary basket vectors —
    * the memory-based collaborative-filtering score:
    * `cos(a,b) = |baskets(a) ∩ baskets(b)| / √(|baskets(a)|·|baskets(b)|)`,
    * i.e. co-occurrence normalized by item popularity, which is what
    * separates "frequently bought together" from "both just popular".
    *
    * Shape: rides [[cooccurrence]] (one keyed exchange + bounded pair
    * expansion — never an items×items similarity matrix); the
    * per-item degree frame collapses to |items| rows and broadcasts
    * onto the pair table twice. The cosine itself is ONE fixed IEEE
    * expression over exact integer counts — engine-portable. */
  def itemCosine(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketSize: Int = 512,
      minSupport: Long = 1L): DataFrame = {
    val co = cooccurrence(df, basketCol, itemCol, maxBasketSize, minSupport)
    val deg = df.select(col(basketCol).as("_basket"), col(itemCol).as("_item"))
      .distinct()
      .groupBy("_item").agg(count(lit(1)).as("_deg"))
    co.join(broadcast(deg.select(col("_item").as("a"), col("_deg").as("deg_a"))), Seq("a"))
      .join(broadcast(deg.select(col("_item").as("b"), col("_deg").as("deg_b"))), Seq("b"))
      .withColumn("cosine",
        col("n_baskets").cast("double") /
          sqrt((col("deg_a") * col("deg_b")).cast("double")))
      .select("a", "b", "n_baskets", "deg_a", "deg_b", "cosine")
  }
}
