package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators._
import graft.streaming.{EventTimeOps, StatefulOps}

/** Analytics family over the TPC-H-ish tables (bench headliners).
  *
  * One gate trait of [[SparkEntry]] (round-11 split of the single-file
  * registry): the operator defs, their `queries` entries, and their
  * DuckDB oracle twins travel together; SparkEntry composes the maps. */
private[graft] trait AnalyticsGates extends GateSupport {

  // ==================================================================
  // Analytics family over the TPC-H-ish tables (bench headliners)
  // ==================================================================

  /** TPC-H Q1-shaped pricing summary: the canonical wide aggregation.
    * Decimal sums keep doubles bit-deterministic vs the oracle. */
  protected def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-shaped: join customer⨝orders⨝lineitem, top-10 revenue. */
  protected def q3TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("l_orderkey")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped: revenue by nation through a 5-way join. */
  protected def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(s, dir, "nation")
    val customer = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    val lineitem = t(s, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("n_name")
  }

  /** TPC-H Q6-shaped forecast-revenue: the canonical pure scan-filter
    * aggregate — every predicate pushes to the parquet scan (row-group
    * min/max skipping does the work at 100 TB; no shuffle at all, the
    * single-row aggregate merges partials). */
  protected def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(
        dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q4-shaped late-shipment priority count: orders with at least
    * one line shipped > 60 days after the order date, counted by
    * priority. The EXISTS is a LEFT SEMI join on the natural shuffle key
    * (orderkey) — each order emits at most once no matter how many lines
    * qualify, and the non-equi part (shipdate vs orderdate + 60d) rides
    * INSIDE the semi-join condition, so no post-join dedup and no
    * nested loop. */
  protected def q4LateOrders(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > date_add(o("o_orderdate"), 60),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q14-shaped promo revenue share: both terms of the ratio as
    * exact decimal sums in ONE conditional-aggregation pass (the ratio
    * itself is left to the consumer — engine float division would break
    * hash-exactness, and the two sums carry strictly more information).
    * Part is the dimension: broadcast. */
  protected def q14PromoShare(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0.0))).as("promo_revenue"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q7-shaped bilateral volume shipping: revenue between a nation
    * PAIR by ship year, both directions. The disjunctive pair predicate
    * ((A,B) or (B,A)) cannot be pushed through the joins by Catalyst, so
    * the necessary condition — supplier AND customer each belong to
    * {A, B} — is applied manually at the DIM side: suppliers/customers
    * join their (broadcast, 2-row-filtered) nation first, which prunes
    * lineitem by supplier nation BEFORE the orders shuffle (at 100 TB
    * that cuts the fact shuffle to ~2/|nations| of the log; the OR
    * itself then filters a tiny joined frame). */
  protected def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_18", "NATION_19")
    val nations = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
    val sup = t(s, dir, "supplier")
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(s, dir, "customer")
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    t(s, dir, "lineitem")
      .join(broadcast(sup), Seq("l_suppkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === pair.head && col("cust_nation") === pair(1)) ||
        (col("supp_nation") === pair(1) && col("cust_nation") === pair.head))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q10-shaped returned-item reporting: customers ranked by the
    * revenue they returned in one quarter. Facts (lineitem⋈orders)
    * shuffle on orderkey with BOTH filters pushed to the scans; the
    * customer join shuffles on custkey (customer is fact-sized at scale
    * — NOT broadcast); nation broadcasts. Top-20 plans as
    * TakeOrderedAndProject, never a global sort. */
  protected def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13-shaped customer order-count distribution: orders per
    * customer (LEFT join keeps the zero-order tail), then the histogram
    * of those counts. Two aggregations, each collapsing map-side —
    * the second one's input is |customers| rows and its output |distinct
    * counts|, so only the first exchange ever sees data volume. */
  protected def q13OrderDistribution(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q18-shaped large-volume customers: orders whose total
    * quantity crosses a threshold, with their customer. The HAVING
    * aggregation reduces lineitem to qualifying orderkeys FIRST (one
    * partial-agg shuffle on the join key itself), so the subsequent
    * orders/customer joins run on the small qualifying set — the
    * aggregate-before-join shape that at 100 TB turns a three-way fact
    * join into one fact aggregation plus two slim joins. */
  protected def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150.0)
    big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q22-shaped idle-rich customers: above-average balance, no
    * recent order, grouped by nation. The global average rides the plan
    * as a 1-row broadcast crossJoin (the [[gapDetection]] idiom); the
    * comparison is exact decimal cross-multiplication
    * (acctbal·n > Σacctbal) so no engine ever divides — averages of
    * doubles are order-dependent, products of decimals are not. The
    * recent-order probe is a LEFT ANTI join on custkey: nothing moves
    * but custkeys, and the anti side prunes at the exchange. */
  protected def q22IdleCustomers(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val stats = cust.filter(col("c_acctbal") > 0.0)
      .agg(
        sum(col("c_acctbal").cast("decimal(30,6)")).as("sum_pos"),
        count(lit(1)).as("n_pos"))
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select("o_custkey")
    cust.crossJoin(broadcast(stats))
      .filter(col("c_acctbal").cast("decimal(30,6)") * col("n_pos") > col("sum_pos"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_custs"),
        dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy("c_nationkey")
  }

  /** TPC-H Q2-shaped minimum-cost supplier. No `partsupp` table exists in
    * this schema, so the supply relation is DERIVED: per (part, supplier),
    * the minimum observed unit price over lineitem (min of a per-row IEEE
    * division — deterministic in any engine; `min` is order-independent,
    * unlike sums of doubles). The correlated `cost = (SELECT min ...)`
    * subquery decorrelates to a per-part min + an equality join back —
    * the classic magic-set rewrite, and the plan that survives 100 TB:
    * two shuffles on `partkey`, dims broadcast, no nested loop. */
  protected def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val supply = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val eligible = supply
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(t(s, dir, "part").filter(col("p_size") === 25)),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey").as("p_partkey"), col("l_suppkey").as("s_suppkey"),
        col("s_name"), col("n_name"), col("unit_cost"))
    val mins = eligible.groupBy("p_partkey")
      .agg(min("unit_cost").as("min_cost"))
    eligible.join(mins, Seq("p_partkey"))
      .filter(col("unit_cost") === col("min_cost"))
      .select("p_partkey", "s_suppkey", "s_name", "n_name", "unit_cost")
      .orderBy("p_partkey", "s_suppkey")
      .limit(100)
  }

  /** TPC-H Q8-shaped national market share: both terms of the share
    * ratio (one nation's revenue, all-nation revenue) per order year as
    * exact decimal sums in one conditional pass — the [[q14PromoShare]]
    * idiom applied to Q8's two-level aggregate. Customer region and part
    * type prune the fact early through broadcast dims. */
  protected def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val sup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("supp_nation"))
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(sup), Seq("l_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        dsum(when(col("supp_nation") === "NATION_5",
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0.0))).as("nation_revenue"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_year")
  }

  /** TPC-H Q9-shaped product-type profit by (supplier nation, order
    * year). No `partsupp.ps_supplycost` exists, so cost is adapted to
    * `p_retailprice · l_quantity · 0.1` — per-row IEEE arithmetic both
    * engines compute identically; the SUM is decimal-exact. The p_name
    * LIKE filter prunes part first (broadcast), the orders join carries
    * only qualifying lines. */
  protected def q9ProfitByNation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_name").contains("red"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(
        col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") * lit(0.1)).as("sum_profit"),
        count(lit(1)).as("n_items"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q11-shaped important stock: per-part supply value for one
    * nation's suppliers, kept when value exceeds a fixed fraction of the
    * nation's total — the HAVING-over-scalar-subquery shape. The total
    * rides as a 1-row broadcast crossJoin and the threshold test is
    * decimal cross-multiplication (`value·10000 > total`), never a
    * division ([[q22IdleCustomers]] idiom). Two aggregations over ONE
    * scan of the nation's lines; everything after the first groupBy is
    * |parts|-sized. */
  protected def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val natSup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val values = t(s, dir, "lineitem")
      .join(broadcast(natSup), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .join(broadcast(t(s, dir, "part").select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey")
      .agg(sum((col("l_quantity") * col("p_retailprice")).cast("decimal(30,6)")).as("value_dec"))
    val total = values.agg(sum(col("value_dec")).as("total_dec"))
    values.crossJoin(broadcast(total))
      .filter(col("value_dec") * 10000 > col("total_dec"))
      .select(col("p_partkey"), col("value_dec").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** TPC-H Q12-shaped priority split (no `l_shipmode` column exists;
    * `l_returnflag` stands in as the category): high- vs low-priority
    * line counts per flag for a one-year ship window — the conditional
    * two-count aggregate over a fact⨝fact equi-join on orderkey. */
  protected def q12PriorityByFlag(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q15-shaped top supplier(s): quarterly revenue per supplier,
    * return those achieving the maximum. Revenue stays DECIMAL through
    * the max-equality join (exact tie semantics; doubles would make
    * "equals the max" engine-dependent), cast to double only on output.
    * The max is a 1-row broadcast — the view+subquery of the original
    * decorrelated to agg → crossJoin → filter. */
  protected def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val revenue = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(30,6)")).as("rev_dec"))
    val top = revenue.agg(max(col("rev_dec")).as("max_rev"))
    revenue.crossJoin(broadcast(top))
      .filter(col("rev_dec") === col("max_rev"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16-shaped supplier counts per part attribute. The supply
    * relation is the DISTINCT (part, supplier) pairs observed in
    * lineitem (no partsupp table); the complaints exclusion is adapted
    * to a deterministic name predicate. COUNT(DISTINCT) shuffles only
    * the already-distinct pair frame; part attributes ride a broadcast. */
  protected def q16SupplierCounts(s: SparkSession, dir: String): DataFrame = {
    val badSup = t(s, dir, "supplier")
      .filter(col("s_name").endsWith("7")).select("s_suppkey")
    val parts = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
    t(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
      .join(badSup, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      .limit(100)
  }

  /** TPC-H Q17-shaped small-quantity revenue: lines of one brand+type
    * whose quantity is below 20% of the part's average quantity. The
    * correlated AVG decorrelates to a per-part (sum, count) + join-back,
    * and the `qty < 0.2·avg` test is exact integer/decimal
    * cross-multiplication `qty·5·cnt < sum` — no engine divides, so no
    * float threshold can disagree at the boundary. */
  protected def q17SmallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val brandParts = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#23" && col("p_type") === "SMALL")
      .select("p_partkey")
    val stats = li
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("decimal(30,6)")).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .withColumnRenamed("l_partkey", "p_partkey")
    li.join(broadcast(stats), col("l_partkey") === col("p_partkey"))
      .filter(col("l_quantity").cast("decimal(30,6)") * 5 * col("cnt") < col("sum_qty"))
      .agg(dsum(col("l_extendedprice")).as("total_extprice"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q19-shaped disjunctive revenue: OR of three (brand,
    * size-range, quantity-range) conjunct groups. Catalyst extracts the
    * common `l_quantity` bounds and the part-side disjuncts as pushable
    * conjuncts (OR-of-ANDs factoring), so both scans prune before the
    * broadcast join evaluates the residual OR exactly. */
  protected def q19DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q20-shaped excess suppliers: suppliers in one nation whose
    * 1997 shipped quantity of matching parts exceeds a threshold — the
    * nested IN-chain (supplier IN ... partsupp IN ... part) decorrelated
    * to agg → HAVING → LEFT SEMI into the supplier dim. Threshold test
    * on the decimal sum; only suppkeys cross the final exchange. */
  protected def q20ExcessSuppliers(s: SparkSession, dir: String): DataFrame = {
    val redParts = t(s, dir, "part")
      .filter(col("p_name").contains("red")).select("p_partkey")
    val shipped = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(30,6)")).as("qty"))
      .filter(col("qty") > lit(50).cast("decimal(30,6)"))
      .select("l_suppkey")
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q21-shaped waiting-inducing suppliers. The schema has no
    * commit/receipt dates, so "kept the order waiting" is adapted to
    * ship-time semantics with the SAME exists/not-exists shape: in a
    * finished multi-supplier order, the supplier whose latest line
    * shipped STRICTLY after every other supplier's (the unique latest
    * shipper). Both correlated EXISTS decorrelate to per-order counts:
    * (order, supplier) max-shipdate → per-order max + achiever count —
    * two co-partitioned aggregations on orderkey, no self-join blowup,
    * ties excluded exactly (timestamp equality, no float). */
  protected def q21WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val finished = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val perPair = t(s, dir, "lineitem")
      .join(finished, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("l_shipdate")).as("last_ship"))
    val perOrder = perPair.groupBy("l_orderkey")
      .agg(max(col("last_ship")).as("order_last"), count(lit(1)).as("n_supp"))
    val achievers = perPair.join(perOrder, Seq("l_orderkey"))
      .filter(col("last_ship") === col("order_last") && col("n_supp") > 1)
    val unique = achievers.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_ach")).filter(col("n_ach") === 1)
    achievers.join(unique, Seq("l_orderkey"), "left_semi")
      .join(broadcast(t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_11")),
            col("s_nationkey") === col("n_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Window top-k: 3 priciest parts per brand. */
  protected def topPartsPerBrand(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(s, dir, "part")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3L)
      .select("p_brand", "rnk", "p_partkey", "p_retailprice")
      .orderBy("p_brand", "rnk")
  }

  /** Top suppliers by account balance per nation: broadcast dim join +
    * window top-k over the supplier table. */
  protected def topSuppliersPerNation(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("n_name").orderBy(col("s_acctbal").desc, col("s_suppkey"))
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3L)
      .select("n_name", "rnk", "s_suppkey", "s_acctbal")
      .orderBy("n_name", "rnk")
  }

  /** Market-basket co-purchase pairs ([[graft.operators.Baskets
    * .cooccurrence]]): parts bought together in the same order, support
    * >= 2, top pairs. The cap (512) never triggers on this data — the
    * gate is exact vs the oracle's self-join formulation; BasketsSpec
    * proves the capped path separately. Two keyed exchanges total vs
    * the self-join's three. */
  protected def copurchasePairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Baskets.cooccurrence(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
      .select(col("a").as("p_a"), col("b").as("p_b"), col("n_baskets"))
      .orderBy(col("n_baskets").desc, col("p_a"), col("p_b"))
      .limit(200)

  /** Directional association rules ([[graft.operators.Baskets
    * .ruleStats]]): integer confidence/lift ingredients per co-purchase
    * direction — counts only, no engine divides. */
  protected def basketRules(s: SparkSession, dir: String): DataFrame =
    graft.operators.Baskets.ruleStats(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minSupport = 3L)
      .orderBy(col("n_ab").desc, col("a"), col("b"))
      .limit(100)

  /** Batch MERGE ([[graft.operators.Merge.upsert]]): the customer
    * snapshot after a change set derived from 2001 orders — balance
    * updated to the max 2001 order price, every 5th changed customer
    * deleted. One full-outer join on the key; the oracle states the
    * same MERGE as LEFT JOIN + COALESCE + delete filter. */
  protected def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val updates = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(col("o_totalprice")).as("c_acctbal"))
      .withColumn("del", col("c_custkey") % 5 === 0)
    graft.operators.Merge.upsert(
        t(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal"),
        updates, Seq("c_custkey"), deleteCol = Some("del"))
      .orderBy("c_custkey")
  }

  /** Self-maintainable rollup ([[graft.operators.Merge.maintainAgg]]):
    * the monthly revenue rollup maintained from a BASE AGGREGATE plus an
    * insert delta (orderkey ≡ 0 mod 8 plays the newly-arrived partition)
    * — bit-equal to the full recompute the oracle runs, because the sums
    * are exact decimals and decimal addition is associative. The gate
    * proves the maintenance identity; the 100 TB point is the cost
    * asymmetry (delta scan + megabyte rollup merge vs a full history
    * rescan). */
  protected def incrementalRollup(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").cast("decimal(30,6)").as("rev"))
    val baseAgg = o.filter(pmod(col("o_orderkey"), lit(8)) =!= 0)
      .groupBy("y", "m", "status")
      .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n_orders"))
    graft.operators.Merge.maintainAgg(
        baseAgg, o.filter(pmod(col("o_orderkey"), lit(8)) === 0),
        Seq("y", "m", "status"), Seq("rev"), "n_orders")
      .select(col("y"), col("m"), col("status"),
        col("rev").cast("double").as("revenue"), col("n_orders"))
      .orderBy("y", "m", "status")
  }

  /** Common-neighbor link prediction ([[Graph.commonNeighborLinks]])
    * over the co-purchase graph (edges = part pairs bought together in
    * ≥2 orders): the top-100 part pairs NOT bought together that share
    * the most co-purchase partners — integer (n_common, deg_a, deg_b)
    * ingredients, uncapped on this bounded-degree graph. */
  protected def linkPrediction(s: SparkSession, dir: String): DataFrame = {
    val edges = graft.operators.Baskets.cooccurrence(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
      .select(col("a").as("src"), col("b").as("dst"))
    graft.operators.Graph.commonNeighborLinks(edges)
      .orderBy(col("n_common").desc, col("a"), col("b"))
      .limit(100)
  }

  /** Contiguous sequential patterns ([[Behavioral.sequentialPatterns]]):
    * the top event-type trigrams across user timelines, support ≥ 2. */
  protected def seqPatterns(s: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.sequentialPatterns(t(s, dir, "events"),
        "user_id", "event_id", "event_type", len = 3, minSupport = 2L)
      .orderBy(col("support").desc, col("s0"), col("s1"), col("s2"))
      .limit(50)

  /** Last-touch attribution ([[Behavioral.lastTouchAttribution]]):
    * every purchase claims the user's most recent preceding view. */
  protected def attributionLastTouch(s: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.lastTouchAttribution(t(s, dir, "events"),
        "user_id", "event_id", "event_type",
        touchType = "view", convType = "purchase")
      .orderBy("user_id", "conv_ord")

  /** Exact rolling 7-day distinct actives
    * ([[Behavioral.rollingActiveUsers]]): DAU + trailing-week actives
    * per day, via forward event replication (no windowed DISTINCT). */
  protected def rollingActives(s: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.rollingActiveUsers(
        eventsNs(s, dir).withColumn("day", expr("ts div 86400000000000")),
        "user_id", "day", window = 7)
      .orderBy("day")

  /** RFM segmentation ([[Behavioral.rfmScores]]): quintile-scored
    * recency/frequency/monetary per user over the events table. */
  protected def rfmScoresQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Behavioral.rfmScores(t(s, dir, "events"),
        "user_id", "event_id", "value", tiles = 5)
      .orderBy("user_id")

  /** Multi-source BFS ([[Graph.khopDistances]]): hop distance from the
    * flagged seed parts (p_partkey < 25) through the co-purchase graph,
    * up to 3 hops — the contamination blast-radius query. */
  protected def khopDistancesQuery(s: SparkSession, dir: String): DataFrame = {
    val edges = graft.operators.Baskets.cooccurrence(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
      .select(col("a").as("src"), col("b").as("dst"))
    val seeds = t(s, dir, "part").filter(col("p_partkey") < 25)
      .select(col("p_partkey").as("node"))
    graft.operators.Graph.khopDistances(edges, seeds, maxHops = 3)
      .orderBy("node")
  }

  /** Time-bucketed aggregation over order dates. */
  protected def ordersMonthly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total"))
      .orderBy("y", "m")

  /** Exact distinct + grouped distinct — the oracle-checkable counterpart
    * of Bench's approx_distinct_counts (HLL sketches are engine-specific,
    * so the approximate variant has no cross-engine oracle). */
  protected def distinctCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_suppkey")).as("supps"))
      .orderBy("l_returnflag")

  /** Hierarchical ROLLUP report: revenue at (region, nation), region
    * subtotal, and grand-total levels in ONE aggregation — Spark's
    * `rollup` expands grouping sets inside a single partial-agg tree, so
    * the detail level is aggregated once and the coarser levels reduce
    * from tiny intermediate frames (no re-scan per level, unlike a UNION
    * of three GROUP BYs). `lvl` is `grouping_id()` (bit i set = column i
    * rolled up), identical to DuckDB `GROUPING(r_name, n_name)`. Dims
    * broadcast; the orders→customer join shuffles once on custkey. */
  protected def rollupReport(s: SparkSession, dir: String): DataFrame =
    // SQL rather than Dataset `.rollup`: rollup's Expand reuses the
    // grouping attrs' exprIds, and with keys sourced from two joined
    // Datasets the DetectAmbiguousSelfJoin rule false-positives on the
    // expanded duplicates; the SQL path carries no per-Dataset ids.
    // `grouping_id()` = DuckDB `GROUPING(r_name, n_name)` bit-for-bit.
    s.sql(
      s"""SELECT /*+ BROADCAST(n, r) */
                 r_name AS region_name, n_name AS nation_name,
                 CAST(grouping_id() AS BIGINT) AS lvl,
                 count(*) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
          FROM parquet.`$dir/orders.parquet` o
          JOIN parquet.`$dir/customer.parquet` c ON o_custkey = c_custkey
          JOIN parquet.`$dir/nation.parquet` n ON c_nationkey = n_nationkey
          JOIN parquet.`$dir/region.parquet` r ON n_regionkey = r_regionkey
          GROUP BY ROLLUP(r_name, n_name)
          ORDER BY lvl, coalesce(region_name, ''), coalesce(nation_name, '')""")

  /** CUBE report over (mktsegment, orderpriority): all four grouping
    * sets — detail, each single-dimension margin, grand total — in ONE
    * Expand + aggregation pass over orders (same single-scan argument as
    * [[rollupReport]]; CUBE's extra sets multiply the Expand's row
    * factor, not the scan count). Pure single-table, so no join
    * ambiguity and the Dataset `.cube` API applies directly. */
  protected def cubeReport(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("long").as("lvl"),
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("lvl"),
        coalesce(col("o_orderstatus"), lit("")),
        coalesce(col("o_orderpriority"), lit("")))

  /** PIVOT: per-user event-type count matrix — the long→wide reshape of
    * §2.4's aggregation family. The explicit value list keeps the output
    * schema static (no discovery pass over the data, which at 100 TB
    * would cost an extra distinct scan); the pivot itself compiles to
    * ONE conditional aggregation over a single shuffle on the group key,
    * identical to the CASE-WHEN formulation the oracle spells out. */
  protected def eventTypePivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** Ordered conversion funnel over the event log
    * ([[graft.operators.Behavioral.funnel]]). */
  protected def funnelSteps(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsNs(s, dir)
      .withColumn("ts_us", graft.streaming.EventTimeOps.floorDivMicros(col("ts")))
    graft.operators.Behavioral.funnel(ev, "user_id", "event_type", "ts_us",
        Seq("signup", "view", "click", "purchase"))
      .orderBy("step")
  }

  /** Weekly cohort retention grid
    * ([[graft.operators.Behavioral.cohortRetention]]). */
  protected def cohortRetentionQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsNs(s, dir)
      .withColumn("ts_us", graft.streaming.EventTimeOps.floorDivMicros(col("ts")))
    graft.operators.Behavioral.cohortRetention(ev, "user_id", "ts_us")
      .orderBy("cohort_week", "week_offset")
  }

  /** Per-source length deciles — the binning step before stratified
    * filtering (keep the middle deciles, drop the tails). The
    * (n_chars, doc_id) sort key is total, so tile assignment is
    * deterministic and engine-identical. Sources are few and
    * corpus-sized, so the tiling runs distributed
    * ([[graft.operators.Stats.distributedNtile]] — parallel
    * range-partitioned rank, never a one-task per-source sort). */
  protected def lengthDeciles(s: SparkSession, dir: String): DataFrame = {
    graft.operators.Stats.distributedNtile(
        t(s, dir, "documents"), 10, Seq("source"),
        Seq(col("n_chars"), col("doc_id")), "decile")
      .select("source", "doc_id", "n_chars", "decile")
      .orderBy("source", "doc_id")
  }

  /** Exact frequent tokens via the Misra–Gries sketch-then-recount plan
    * ([[graft.operators.HeavyHitters.frequentTokens]]): tokens with
    * count ≥ ceil(N/200), k = 511 counters (divisor < k+1 ⇒ provably
    * exact — the oracle is the naive global GROUP BY). */
  protected def frequentTokensQuery(s: SparkSession, dir: String): DataFrame = {
    val tokens = t(s, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
    graft.operators.HeavyHitters.frequentTokens(tokens, "word", k = 511, divisor = 200L)
      .orderBy("word")
  }

  /** DSIR importance scores ([[graft.operators.Dsir.importanceWeights]]):
    * hashed-unigram likelihood-ratio of the src18 slice vs the whole
    * corpus, in fixed-point integer arithmetic. */
  protected def dsirWeights(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dsir.importanceWeights(
        t(s, dir, "documents"), "doc_id", "text",
        isTarget = col("source") === "src18", buckets = 4096)
      .orderBy("doc_id")

  /** Robust per-source length outliers by exact median-absolute-deviation
    * ([[graft.operators.Stats.madOutliers]], k = 3): the documents whose
    * length sits more than 3 MADs from their source's median. */
  protected def madOutliersQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.madOutliers(
        t(s, dir, "documents"), "source", "doc_id", "n_chars")
      .orderBy("doc_id")

  /** Per-source length-distribution drift vs the rest of the corpus
    * ([[graft.operators.Stats.ksDrift]]): exact two-sample KS statistic
    * as an integer fraction — no floating point anywhere. */
  protected def ksDriftQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.ksDrift(t(s, dir, "documents"), "source", "n_chars")
      .orderBy("source")

  /** Categorical source-mix drift ([[graft.operators.Stats
    * .chiSquareDrift]]): the corpus vs a snapshot that silently lost
    * half of src1's documents (the differential-ingest failure this
    * check exists to catch) — exact per-category χ² terms; the
    * wide rationals render as strings (spearman discipline). */
  protected def chiSquareDriftQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val snapshot = docs.filter(
      !(col("source") === "src1" && pmod(col("doc_id"), lit(2)) === 0))
    graft.operators.Stats.chiSquareDrift(docs, snapshot, "source")
      .withColumn("chi2_num", col("chi2_num").cast("string"))
      .withColumn("chi2_den", col("chi2_den").cast("string"))
      .orderBy("category")
  }

  /** Embedding-space mean shift ([[graft.operators.Similarity
    * .embeddingMeanShift]]): the corpus vs the snapshot missing every
    * third vector — per-dimension exact micro-quantized sums and the
    * cross-multiplied squared centroid gap; completes the drift triad
    * next to `ks_drift` (ordered values) and `chi_square_drift`
    * (category mixes). */
  protected def embeddingShiftQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.operators.Similarity.embeddingMeanShift(
        emb, emb.filter(pmod(col("vec_id"), lit(3)) =!= 0))
      .orderBy("d")
  }

  /** Triangle counts on the MONTH-SLICED co-supplier graph (suppliers
    * sharing a March-1995 order; the slice is what keeps the graph
    * co-occurrence-shaped — the all-time graph converges on a complete
    * graph as orders accumulate, which no triangle algorithm outruns,
    * and real co-occurrence analyses window for exactly this reason).
    * Edge generation is a lineitem self-join bounded by order size;
    * counting is [[graft.operators.Graph.triangleCounts]]'s
    * degree-ordered wedge enumeration, oracled against the naive u<v
    * triple join it provably equals. */
  protected def triangleCountsQuery(s: SparkSession, dir: String): DataFrame = {
    val march = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-03-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_orderkey").as("ok"))
    val li = t(s, dir, "lineitem").select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .join(march, Seq("ok"))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
      .select(col("a.sk").as("src"), col("b.sk").as("dst"))
    graft.operators.Graph.triangleCounts(e).orderBy("node")
  }

  protected def analyticsGateQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary _,
    "q3_top_revenue" -> q3TopRevenue _,
    "q5_nation_revenue" -> q5NationRevenue _,
    "q4_late_orders" -> q4LateOrders _,
    "q6_forecast_revenue" -> q6ForecastRevenue _,
    "q14_promo_share" -> q14PromoShare _,
    "q7_volume_shipping" -> q7VolumeShipping _,
    "q10_returned_items" -> q10ReturnedItems _,
    "q13_order_distribution" -> q13OrderDistribution _,
    "q18_large_orders" -> q18LargeOrders _,
    "q22_idle_customers" -> q22IdleCustomers _,
    "q2_min_cost_supplier" -> q2MinCostSupplier _,
    "q8_market_share" -> q8MarketShare _,
    "q9_profit_by_nation" -> q9ProfitByNation _,
    "q11_important_parts" -> q11ImportantParts _,
    "q12_priority_by_flag" -> q12PriorityByFlag _,
    "q15_top_supplier" -> q15TopSupplier _,
    "q16_supplier_counts" -> q16SupplierCounts _,
    "q17_small_quantity_revenue" -> q17SmallQuantityRevenue _,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue _,
    "q20_excess_suppliers" -> q20ExcessSuppliers _,
    "q21_waiting_suppliers" -> q21WaitingSuppliers _,
    "top_parts_per_brand" -> topPartsPerBrand _,
    "top_suppliers_per_nation" -> topSuppliersPerNation _,
    "orders_monthly" -> ordersMonthly _,
    "copurchase_pairs" -> copurchasePairs _,
    "basket_rules" -> basketRules _,
    "merge_upsert" -> mergeUpsert _,
    "incremental_rollup" -> incrementalRollup _,
    "link_prediction" -> linkPrediction _,
    "seq_patterns" -> seqPatterns _,
    "attribution_last_touch" -> attributionLastTouch _,
    "khop_distances" -> khopDistancesQuery _,
    "rfm_scores" -> rfmScoresQuery _,
    "rolling_actives" -> rollingActives _,
    "distinct_counts" -> distinctCounts _,
    "rollup_report" -> rollupReport _,
    "cube_report" -> cubeReport _,
    "event_type_pivot" -> eventTypePivot _,
    "funnel_steps" -> funnelSteps _,
    "cohort_retention" -> cohortRetentionQuery _,
    "length_deciles" -> lengthDeciles _,
    "frequent_tokens" -> frequentTokensQuery _,
    "dsir_weights" -> dsirWeights _,
    "ks_drift" -> ksDriftQuery _,
    "chi_square_drift" -> chiSquareDriftQuery _,
    "embedding_mean_shift" -> embeddingShiftQuery _,
    "triangle_counts" -> triangleCountsQuery _,
    "mad_outliers" -> madOutliersQuery _,
  )

  protected def analyticsGateOracles: Map[String, String] = Map(
    "rollup_report" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
                CAST(GROUPING(r_name, n_name) AS BIGINT) AS lvl,
                count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY lvl, coalesce(r_name, ''), coalesce(n_name, '')""",
    "cube_report" ->
      """SELECT o_orderstatus, o_orderpriority,
                CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl,
                count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
         FROM orders
         GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY lvl, coalesce(o_orderstatus, ''), coalesce(o_orderpriority, '')""",
    "event_type_pivot" ->
      // PIVOT ≡ one conditional aggregation; count over the filtered
      // class, 0 when the user never produced the type
      """SELECT user_id,
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
                CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
                CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "frequent_tokens" ->
      // the naive global GROUP BY the sketch-then-recount plan provably
      // equals (threshold ceil(N/200) > N/(k+1) with k = 511)
      """WITH w AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
                    FROM documents),
              tot AS (SELECT count(*) AS n FROM w)
         SELECT word, count(*) AS cnt FROM w, tot
         GROUP BY word, tot.n
         HAVING count(*) >= (tot.n + 199) // 200
         ORDER BY word""",
    "dsir_weights" ->
      // same md5 bucket arithmetic as hashed_tf; same fixed-point
      // (scale·(n_t+1)) // (n_r+1) term, summed as BIGINT
      """WITH w AS (SELECT doc_id, source = 'src18' AS is_target,
                      unnest(string_split_regex(trim(text), '\s+')) AS word
                    FROM documents),
              b AS (SELECT doc_id, is_target,
                      ('0x' || substr(md5(word), 1, 8))::BIGINT % 4096 AS bucket
                    FROM w),
              dist AS (SELECT bucket,
                         sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS n_target,
                         count(*) AS n_raw
                       FROM b GROUP BY bucket)
         SELECT b.doc_id,
                CAST(sum((1000000 * (dist.n_target + 1)) // (dist.n_raw + 1))
                     AS BIGINT) AS dsir_score
         FROM b JOIN dist ON b.bucket = dist.bucket
         GROUP BY b.doc_id ORDER BY b.doc_id""",
    "embedding_mean_shift" ->
      // coordinates quantized to integer micros FIRST (order-independent
      // exact sums), then the cross-multiplied squared centroid gap per
      // dimension; d is 0-based like posexplode
      """WITH qa AS (SELECT generate_subscripts(embedding, 1) - 1 AS d,
                            CAST(round(unnest(embedding)::DOUBLE * 1000000)
                                 AS HUGEINT) AS xm
                     FROM embeddings),
              qb AS (SELECT generate_subscripts(embedding, 1) - 1 AS d,
                            CAST(round(unnest(embedding)::DOUBLE * 1000000)
                                 AS HUGEINT) AS xm
                     FROM embeddings WHERE vec_id % 3 <> 0),
              sa AS (SELECT d, sum(xm) AS s_a, CAST(count(*) AS HUGEINT) AS n_a
                     FROM qa GROUP BY d),
              sb AS (SELECT d, sum(xm) AS s_b, CAST(count(*) AS HUGEINT) AS n_b
                     FROM qb GROUP BY d)
         SELECT d, CAST(s_a AS VARCHAR) AS s_a, CAST(s_b AS VARCHAR) AS s_b,
                CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                CAST((s_a * n_b - s_b * n_a) * (s_a * n_b - s_b * n_a)
                     AS VARCHAR) AS shift2_num,
                CAST(n_a * n_b * n_a * n_b AS VARCHAR) AS shift2_den
         FROM sa JOIN sb USING (d) ORDER BY d""",
    "chi_square_drift" ->
      // Pearson χ² homogeneity, exact: per category the cross-multiplied
      // term (o_a·n_b − o_b·n_a)²/(n_a·n_b·(o_a+o_b)) in HUGEINT digits,
      // ppm by two-part floor division (no intermediate overflow)
      """WITH a AS (SELECT source AS category FROM documents),
              b AS (SELECT source AS category FROM documents
                    WHERE NOT (source = 'src1' AND doc_id % 2 = 0)),
              ca AS (SELECT category, CAST(count(*) AS HUGEINT) AS o_a
                     FROM a GROUP BY 1),
              cb AS (SELECT category, CAST(count(*) AS HUGEINT) AS o_b
                     FROM b GROUP BY 1),
              cells AS (SELECT category,
                          coalesce(o_a, 0) AS o_a, coalesce(o_b, 0) AS o_b
                        FROM ca FULL JOIN cb USING (category)),
              t AS (SELECT sum(o_a) AS n_a, sum(o_b) AS n_b FROM cells),
              terms AS (SELECT category, o_a, o_b,
                          (o_a * n_b - o_b * n_a) * (o_a * n_b - o_b * n_a)
                            AS num,
                          n_a * n_b * (o_a + o_b) AS den
                        FROM cells, t)
         SELECT category, CAST(o_a AS BIGINT) AS o_a, CAST(o_b AS BIGINT) AS o_b,
                CAST(num AS VARCHAR) AS chi2_num,
                CAST(den AS VARCHAR) AS chi2_den,
                CAST((num // den) * 1000000
                     + ((num % den) * 1000000) // den AS BIGINT) AS term_ppm
         FROM terms ORDER BY category""",
    "ks_drift" ->
      // same exact-integer KS construction: per-(source, value) counts,
      // group + corpus ECDFs at every corpus-distinct value, cross-
      // multiplied to the common denominator n_g·n_rest
      """WITH c AS (SELECT source AS grp, n_chars AS v, count(*) AS cnt
                    FROM documents GROUP BY 1, 2),
              grps AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_grp
                       FROM c GROUP BY grp),
              vt AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS v_cnt
                     FROM c GROUP BY v),
              tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM c),
              grid AS (SELECT g.grp, g.n_grp, vt.v,
                         CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
                       FROM grps g CROSS JOIN vt
                       LEFT JOIN c ON c.grp = g.grp AND c.v = vt.v),
              cg AS (SELECT grp, n_grp, v,
                       CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY v)
                            AS BIGINT) AS cum_grp
                     FROM grid),
              ca AS (SELECT v, CAST(sum(v_cnt) OVER (ORDER BY v) AS BIGINT)
                       AS cum_all FROM vt)
         SELECT cg.grp AS source, cg.n_grp AS n_group,
                tot.n_all - cg.n_grp AS n_rest,
                CAST(max(abs(cum_grp * (tot.n_all - cg.n_grp)
                             - (cum_all - cum_grp) * cg.n_grp)) AS BIGINT)
                  AS ks_num,
                cg.n_grp * (tot.n_all - cg.n_grp) AS ks_den,
                CAST(max(abs(cum_grp * (tot.n_all - cg.n_grp)
                             - (cum_all - cum_grp) * cg.n_grp)) * 1000000
                     // (cg.n_grp * (tot.n_all - cg.n_grp)) AS BIGINT)
                  AS ks_fp
         FROM cg JOIN ca ON cg.v = ca.v CROSS JOIN tot
         GROUP BY cg.grp, cg.n_grp, tot.n_all
         ORDER BY source""",
    "mad_outliers" ->
      // same exact construction: lower discrete median at rank
      // (n+1)//2, integer deviations, strict dev > 3*mad flag
      """WITH v AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars
                    FROM documents),
              r1 AS (SELECT source, doc_id, n_chars,
                       CAST(row_number() OVER (PARTITION BY source
                         ORDER BY n_chars) AS BIGINT) AS rn FROM v),
              cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                      FROM v GROUP BY source),
              med AS (SELECT r1.source, r1.n_chars AS med FROM r1
                      JOIN cnt ON r1.source = cnt.source
                       AND r1.rn = (cnt.n + 1) // 2),
              d AS (SELECT v.source, v.doc_id, v.n_chars, med.med,
                      abs(v.n_chars - med.med) AS dev
                    FROM v JOIN med ON v.source = med.source),
              r2 AS (SELECT source, dev,
                       CAST(row_number() OVER (PARTITION BY source
                         ORDER BY dev) AS BIGINT) AS rn FROM d),
              mad AS (SELECT r2.source, r2.dev AS mad FROM r2
                      JOIN cnt ON r2.source = cnt.source
                       AND r2.rn = (cnt.n + 1) // 2)
         SELECT d.source, d.doc_id, d.n_chars, d.med,
                CAST(mad.mad AS BIGINT) AS mad
         FROM d JOIN mad ON d.source = mad.source
         WHERE d.dev > 3 * mad.mad
         ORDER BY d.doc_id""",
    "triangle_counts" ->
      // the naive canonical u<v triple join the degree-ordered wedge
      // plan provably equals; nodes = every edge endpoint
      """WITH o AS (SELECT o_orderkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1995-03-01'
                      AND o_orderdate < TIMESTAMP '1995-04-01'),
              e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
                    FROM lineitem a JOIN lineitem b
                      ON a.l_orderkey = b.l_orderkey
                     AND a.l_suppkey < b.l_suppkey
                    JOIN o ON a.l_orderkey = o.o_orderkey),
              tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
                      FROM e e1
                      JOIN e e2 ON e2.u = e1.v
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
              n AS (SELECT u AS node FROM e UNION SELECT v FROM e),
              pn AS (SELECT x AS node FROM tri
                     UNION ALL SELECT y FROM tri
                     UNION ALL SELECT z FROM tri),
              tc AS (SELECT node, count(*) AS t FROM pn GROUP BY node)
         SELECT n.node, CAST(coalesce(tc.t, 0) AS BIGINT) AS n_triangles
         FROM n LEFT JOIN tc ON n.node = tc.node
         ORDER BY n.node""",
    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
              f1 AS (SELECT user_id, min(us) AS t FROM e
                     WHERE event_type = 'signup' GROUP BY user_id),
              f2 AS (SELECT e.user_id, min(us) AS t FROM e
                     JOIN f1 ON e.user_id = f1.user_id
                     WHERE event_type = 'view' AND us > f1.t GROUP BY e.user_id),
              f3 AS (SELECT e.user_id, min(us) AS t FROM e
                     JOIN f2 ON e.user_id = f2.user_id
                     WHERE event_type = 'click' AND us > f2.t GROUP BY e.user_id),
              f4 AS (SELECT e.user_id, min(us) AS t FROM e
                     JOIN f3 ON e.user_id = f3.user_id
                     WHERE event_type = 'purchase' AND us > f3.t GROUP BY e.user_id)
         SELECT * FROM (
           SELECT 1 AS step, 'signup' AS event_type, count(*) AS entities FROM f1
           UNION ALL SELECT 2, 'view', count(*) FROM f2
           UNION ALL SELECT 3, 'click', count(*) FROM f3
           UNION ALL SELECT 4, 'purchase', count(*) FROM f4)
         ORDER BY step""",
    "cohort_retention" ->
      """WITH iw AS (SELECT DISTINCT user_id,
                       epoch_us(ts) // 604800000000 AS week FROM events),
              c AS (SELECT user_id, min(week) AS cohort_week
                    FROM iw GROUP BY user_id)
         SELECT c.cohort_week, iw.week - c.cohort_week AS week_offset,
                count(DISTINCT iw.user_id) AS active_entities
         FROM iw JOIN c ON iw.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "length_deciles" ->
      """SELECT source, doc_id, n_chars,
                CAST(ntile(10) OVER (PARTITION BY source
                  ORDER BY n_chars, doc_id) AS BIGINT) AS decile
         FROM documents ORDER BY source, doc_id""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
                count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_top_revenue" ->
      """SELECT l_orderkey,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_nation_revenue" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY n_name""",
    "q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q14_promo_share" ->
      """SELECT CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                  AS DECIMAL(30,6))) AS DOUBLE) AS promo_revenue,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue,
                count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'""",
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
                count(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24.0""",
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                EXTRACT(year FROM l_shipdate) AS l_year,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
            OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
         GROUP BY 1, 2, 3, 4
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q18_large_orders" ->
      """WITH big AS (
           SELECT l_orderkey,
                  CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) > 150.0)
         SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
         FROM big
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q22_idle_customers" ->
      """WITH stats AS (
           SELECT sum(CAST(c_acctbal AS DECIMAL(30,6))) AS sum_pos,
                  count(*) AS n_pos
           FROM customer WHERE c_acctbal > 0.0),
              recent AS (
           SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
         SELECT c_nationkey, count(*) AS n_custs,
                CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_acctbal
         FROM customer, stats
         WHERE CAST(c_acctbal AS DECIMAL(30,6)) * n_pos > sum_pos
           AND c_custkey NOT IN (SELECT o_custkey FROM recent)
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q2_min_cost_supplier" ->
      """WITH supply AS (
           SELECT l_partkey, l_suppkey,
                  min(l_extendedprice / l_quantity) AS unit_cost
           FROM lineitem GROUP BY l_partkey, l_suppkey),
              eligible AS (
           SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                  s_name, n_name, unit_cost
           FROM supply
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
           JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
           JOIN part ON p_partkey = l_partkey AND p_size = 25),
              mins AS (
           SELECT p_partkey, min(unit_cost) AS min_cost
           FROM eligible GROUP BY p_partkey)
         SELECT e.p_partkey, e.s_suppkey, e.s_name, e.n_name, e.unit_cost
         FROM eligible e JOIN mins m
           ON e.p_partkey = m.p_partkey AND e.unit_cost = m.min_cost
         ORDER BY e.p_partkey, e.s_suppkey LIMIT 100""",
    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
                CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_5'
                  THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                  AS DECIMAL(30,6))) AS DOUBLE) AS nation_revenue,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue,
                count(*) AS n_items
         FROM lineitem
         JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
         JOIN orders ON o_orderkey = l_orderkey
           AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation n2 ON n2.n_nationkey = s_nationkey
         WHERE o_custkey IN (
           SELECT c_custkey FROM customer
           JOIN nation n1 ON n1.n_nationkey = c_nationkey
           JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'AMERICA')
         GROUP BY year(o_orderdate) ORDER BY o_year""",
    "q9_profit_by_nation" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  - p_retailprice * l_quantity * 0.1
                  AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit,
                count(*) AS n_items
         FROM lineitem
         JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON n_nationkey = s_nationkey
         JOIN orders ON o_orderkey = l_orderkey
         GROUP BY n_name, year(o_orderdate)
         ORDER BY nation, o_year DESC""",
    "q11_important_parts" ->
      """WITH vals AS (
           SELECT p_partkey,
                  sum(CAST(l_quantity * p_retailprice AS DECIMAL(30,6))) AS value_dec
           FROM lineitem
           JOIN part ON p_partkey = l_partkey
           WHERE l_suppkey IN (
             SELECT s_suppkey FROM supplier
             JOIN nation ON n_nationkey = s_nationkey
             WHERE n_name = 'NATION_7')
           GROUP BY p_partkey),
              tot AS (SELECT sum(value_dec) AS total_dec FROM vals)
         SELECT p_partkey, CAST(value_dec AS DOUBLE) AS value
         FROM vals, tot WHERE value_dec * 10000 > total_dec
         ORDER BY value DESC, p_partkey""",
    "q12_priority_by_flag" ->
      """SELECT l_returnflag,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q15_top_supplier" ->
      """WITH revenue AS (
           SELECT l_suppkey,
                  sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(30,6))) AS rev_dec
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
         FROM revenue JOIN supplier ON s_suppkey = l_suppkey
         WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)
         ORDER BY s_suppkey""",
    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
                count(DISTINCT l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sup
         JOIN part ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
           AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
           AND l_suppkey NOT IN (
             SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100""",
    "q17_small_quantity_revenue" ->
      """WITH stats AS (
           SELECT l_partkey AS p_partkey,
                  sum(CAST(l_quantity AS DECIMAL(30,6))) AS sum_qty,
                  count(*) AS cnt
           FROM lineitem
           WHERE l_partkey IN (
             SELECT p_partkey FROM part
             WHERE p_brand = 'Brand#23' AND p_type = 'SMALL')
           GROUP BY l_partkey)
         SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
                  AS total_extprice,
                count(*) AS n_items
         FROM lineitem JOIN stats ON p_partkey = l_partkey
         WHERE CAST(l_quantity AS DECIMAL(30,6)) * 5 * cnt < sum_qty""",
    "q19_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
                count(*) AS n_items
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)""",
    "q20_excess_suppliers" ->
      """SELECT s_suppkey, s_name
         FROM supplier
         JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
         WHERE s_suppkey IN (
           SELECT l_suppkey FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             AND l_partkey IN (
               SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
           GROUP BY l_suppkey
           HAVING sum(CAST(l_quantity AS DECIMAL(30,6))) > 50)
         ORDER BY s_suppkey""",
    "q21_waiting_suppliers" ->
      """WITH per_pair AS (
           SELECT l_orderkey, l_suppkey, max(l_shipdate) AS last_ship
           FROM lineitem
           WHERE l_orderkey IN (
             SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
           GROUP BY l_orderkey, l_suppkey),
              per_order AS (
           SELECT l_orderkey, max(last_ship) AS order_last,
                  count(*) AS n_supp
           FROM per_pair GROUP BY l_orderkey),
              achievers AS (
           SELECT p.l_orderkey, p.l_suppkey
           FROM per_pair p JOIN per_order o ON p.l_orderkey = o.l_orderkey
           WHERE p.last_ship = o.order_last AND o.n_supp > 1),
              uniq AS (
           SELECT l_orderkey FROM achievers
           GROUP BY l_orderkey HAVING count(*) = 1)
         SELECT s_name, count(*) AS numwait
         FROM achievers
         JOIN uniq ON achievers.l_orderkey = uniq.l_orderkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_11'
         GROUP BY s_name
         ORDER BY numwait DESC, s_name LIMIT 20""",
    "top_parts_per_brand" ->
      """SELECT p_brand, rnk, p_partkey, p_retailprice FROM (
           SELECT p_brand, p_partkey, p_retailprice,
                  row_number() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey) AS rnk
           FROM part) WHERE rnk <= 3
         ORDER BY p_brand, rnk""",
    "top_suppliers_per_nation" ->
      """SELECT n_name, rnk, s_suppkey, s_acctbal FROM (
           SELECT n_name, s_suppkey, s_acctbal,
                  row_number() OVER (PARTITION BY n_name
                                     ORDER BY s_acctbal DESC, s_suppkey) AS rnk
           FROM supplier JOIN nation ON s_nationkey = n_nationkey) WHERE rnk <= 3
         ORDER BY n_name, rnk""",
    "orders_monthly" ->
      """SELECT EXTRACT(year FROM o_orderdate) AS y,
                EXTRACT(month FROM o_orderdate) AS m,
                count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
         FROM orders GROUP BY y, m ORDER BY y, m""",
    "copurchase_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         SELECT a.l_partkey AS p_a, b.l_partkey AS p_b, count(*) AS n_baskets
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY a.l_partkey, b.l_partkey
         HAVING count(*) >= 2
         ORDER BY n_baskets DESC, p_a, p_b LIMIT 200""",
    "basket_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
              pairs AS (
           SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS n_ab
           FROM items a JOIN items b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
           GROUP BY a.l_partkey, b.l_partkey
           HAVING count(*) >= 3),
              ic AS (SELECT l_partkey, count(*) AS n FROM items GROUP BY l_partkey),
              tot AS (SELECT count(DISTINCT l_orderkey) AS n_total FROM items)
         SELECT a, b, n_ab, ia.n AS n_a, ib.n AS n_b, n_total
         FROM pairs
         JOIN ic ia ON ia.l_partkey = a
         JOIN ic ib ON ib.l_partkey = b, tot
         ORDER BY n_ab DESC, a, b LIMIT 100""",
    "merge_upsert" ->
      """WITH upd AS (
           SELECT o_custkey AS c_custkey,
                  max(o_totalprice) AS new_bal,
                  (o_custkey % 5 = 0) AS del
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
           GROUP BY o_custkey)
         SELECT c.c_custkey, c.c_name,
                COALESCE(u.new_bal, c.c_acctbal) AS c_acctbal
         FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
         WHERE u.del IS NULL OR NOT u.del
         ORDER BY c.c_custkey""",
    "incremental_rollup" ->
      // full recompute — the maintained rollup must be bit-equal to it
      """SELECT EXTRACT(year FROM o_orderdate) AS y,
                EXTRACT(month FROM o_orderdate) AS m,
                o_orderstatus AS status,
                CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
                count(*) AS n_orders
         FROM orders GROUP BY y, m, status ORDER BY y, m, status""",
    "link_prediction" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
              edges AS (
           SELECT a.l_partkey AS u, b.l_partkey AS v
           FROM items a JOIN items b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
              adj AS (SELECT u AS hub, v AS nbr FROM edges
                      UNION ALL SELECT v AS hub, u AS nbr FROM edges),
              deg AS (SELECT hub AS node, count(*) AS deg FROM adj GROUP BY hub),
              cn AS (
           SELECT e1.nbr AS a, e2.nbr AS b, count(*) AS n_common
           FROM adj e1 JOIN adj e2 ON e1.hub = e2.hub AND e1.nbr < e2.nbr
           GROUP BY 1, 2),
              cand AS (
           SELECT cn.a, cn.b, cn.n_common FROM cn
           WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.u = cn.a AND e.v = cn.b))
         SELECT cand.a, cand.b, cand.n_common, da.deg AS deg_a, db.deg AS deg_b
         FROM cand JOIN deg da ON da.node = cand.a JOIN deg db ON db.node = cand.b
         ORDER BY n_common DESC, a, b LIMIT 100""",
    "seq_patterns" ->
      """WITH seq AS (
           SELECT event_type AS s0,
                  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS s1,
                  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY event_id) AS s2
           FROM events)
         SELECT s0, s1, s2, count(*) AS support
         FROM seq WHERE s1 IS NOT NULL AND s2 IS NOT NULL
         GROUP BY s0, s1, s2 HAVING count(*) >= 2
         ORDER BY support DESC, s0, s1, s2 LIMIT 50""",
    "attribution_last_touch" ->
      // cumulative max over STRICTLY preceding rows: ordCol is monotone,
      // so max(preceding view ids) is the latest prior view
      """WITH a AS (
           SELECT user_id, event_id, event_type,
                  max(CASE WHEN event_type = 'view' THEN event_id END)
                    OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS touch_ord
           FROM events)
         SELECT user_id, event_id AS conv_ord, touch_ord
         FROM a WHERE event_type = 'purchase' ORDER BY user_id, conv_ord""",
    "rfm_scores" ->
      // ntile over (metric, user_id): total orders, so the tiling is
      // deterministic on both engines; monetary ranks on the EXACT
      // decimal, and only the output column is cast to double
      """WITH u AS (SELECT user_id,
                      max(event_id) AS recency,
                      count(*) AS frequency,
                      sum(CAST(value AS DECIMAL(30,6))) AS monetary
                    FROM events GROUP BY user_id),
              s AS (SELECT user_id, recency, frequency, monetary,
                      ntile(5) OVER (ORDER BY recency, user_id) AS r_score,
                      ntile(5) OVER (ORDER BY frequency, user_id) AS f_score,
                      ntile(5) OVER (ORDER BY monetary, user_id) AS m_score
                    FROM u)
         SELECT user_id, recency, CAST(frequency AS BIGINT) AS frequency,
                CAST(monetary AS DOUBLE) AS monetary,
                CAST(r_score AS BIGINT) AS r_score,
                CAST(f_score AS BIGINT) AS f_score,
                CAST(m_score AS BIGINT) AS m_score,
                CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
         FROM s ORDER BY user_id""",
    "rolling_actives" ->
      // each event contributes to the 7 trailing windows it falls in;
      // day = micros // 86400e6 matches Spark's nanos div 86400e9
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
              dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM e GROUP BY day),
              w AS (SELECT unnest(range(day, day + 7)) AS wday, user_id FROM e),
              roll AS (SELECT wday AS day, count(DISTINCT user_id) AS rolling
                       FROM w GROUP BY wday)
         SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
                CAST(roll.rolling AS BIGINT) AS rolling
         FROM dau JOIN roll USING (day) ORDER BY day""",
    "khop_distances" ->
      // min over all reachable (node, dist) tuples = BFS distance; the
      // dist < 3 guard bounds the recursion
      """WITH RECURSIVE items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
              e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v
                     FROM items a JOIN items b
                       ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                     GROUP BY 1, 2 HAVING count(*) >= 2),
              edges AS (SELECT u AS src, v AS dst FROM e0
                        UNION ALL SELECT v, u FROM e0),
              walk(node, dist) AS (
                SELECT p_partkey, 0 FROM part WHERE p_partkey < 25
                UNION
                SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON e.src = w.node
                WHERE w.dist < 3)
         SELECT node, CAST(min(dist) AS BIGINT) AS dist
         FROM walk GROUP BY node ORDER BY node""",
    "distinct_counts" ->
      """SELECT l_returnflag,
                count(DISTINCT l_partkey) AS parts,
                count(DISTINCT l_suppkey) AS supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
  )
}
