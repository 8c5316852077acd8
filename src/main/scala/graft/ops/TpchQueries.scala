package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H-shaped analytics (Q3/Q5/Q10 adapted to the fixture
  * schema and its 1995–2001 date range) — the multi-join + agg + top-k
  * workloads an analytics user of the engine runs daily. These stress
  * join ordering, pushed date/segment predicates, partial aggregation and
  * TakeOrderedAndProject together; only the fixed-cardinality nation/
  * region dims ever carry broadcast hints (and here none are needed —
  * JoinSelection/AQE handles every side).
  */
object TpchQueries extends QueryPack {

  /** Q3 shipping priority: unshipped-revenue top 10. */
  def q3(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** Q5 local-supplier volume: revenue per nation inside one region/year,
    * customer and supplier in the same nation.
    */
  def q5(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))

  /** Q10 returned-item reporting: top 20 customers by returned revenue. */
  def q10(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_returnflag") === "R")
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Q7 volume shipping: revenue between two nations per direction and
    * ship year — the disjunctive nation-pair predicate stresses join
    * planning (it cannot be pushed to either scan alone).
    */
  def q7(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .join(Tables.lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d).select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation")), col("s_nationkey") === col("sn_key"))
      .join(Tables.nation(s, d).select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation")), col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_10") ||
        (col("supp_nation") === "NATION_10" && col("cust_nation") === "NATION_12"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))

  /** Q18 large-volume customers: orders whose total quantity clears a
    * threshold — the group-having semi-join + top-N pattern.
    */
  def q18(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250)
      .select(col("l_orderkey").as("big_okey"))
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("big_okey"), "left_semi")
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .limit(100)
  }

  /** Q6 forecasting-revenue change: the one-table scan+agg whose entire
    * cost is how much of the filter reaches the parquet reader — date
    * range, discount band and quantity cap are all pushable.
    */
  def q6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  /** Q14 promotion effect: conditional aggregation over one month's
    * lineitem x part join (the fixture's p_type is the plain 'PROMO'
    * category, so the LIKE prefix of spec-TPC-H becomes an equality).
    */
  def q14(s: SparkSession, d: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-07-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-08-01").cast("timestamp"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
        sum(rev), 4).as("promo_revenue"))
  }

  /** Q17 small-quantity-order revenue: the correlated per-part average
    * as a self-aggregate join. The 20%-of-average test runs in exact
    * BIGINT math (quantities are integral): qty*5*n < sum(qty) is
    * qty < 0.2*avg with no float boundary for either engine to flake on.
    */
  def q17(s: SparkSession, d: String): DataFrame = {
    val pa = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sq"),
        count(lit(1)).as("nq"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_brand") === "Brand#5" &&
        col("p_type") === "SMALL"), col("l_partkey") === col("p_partkey"))
      .join(pa, "l_partkey")
      .filter(col("l_quantity").cast("long") * 5 * col("nq") < col("sq"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** Q22 global-sales opportunity: above-average-balance customers with
    * no RECENT orders (the fixture has no order-free customers, so the
    * anti-join gets a date cutoff), grouped by nation. Balance math runs
    * in exact integer cents — round(bal*100) is within 1e-9 of an integer
    * for every fixture row, so both engines land on the same cent and the
    * above-average test (bal_cents * n > sum_cents) never touches a float
    * boundary.
    */
  def q22(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val pos = cust.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(pos))
      .filter(col("bal_cents") * col("n_pos") > col("sum_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("bal_cents")) / 100.0, 2).as("totacctbal"))
  }

  /** Q4 order-priority checking: orders in a quarter with at least one
    * late-shipped line (the fixture has no commit/receipt dates, so
    * "late" becomes shipped more than 90 days after the order date) —
    * the EXISTS pattern as a semi-join with an equi key plus a non-equi
    * residual both engines evaluate identically on exact timestamps.
    */
  def q4(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .join(Tables.lineitem(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** Q15 top supplier: the scalar-subquery-on-aggregate pattern —
    * supplier(s) whose quarterly revenue equals the maximum. Revenue
    * accumulates in exact integer 1e-4-dollar units (the q_join_bucket
    * discipline): equality-to-max on a float sum would flake on the
    * engines' different addition orders.
    */
  def q15(s: SparkSession, d: String): DataFrame = {
    val units = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_suppkey"), units.as("u"))
      .groupBy(col("l_suppkey"))
      .agg(expr("(sum(u) + 50) div 100").as("rc"))
    val best = rev.agg(max(col("rc")).as("max_rc"))
    Tables.supplier(s, d)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .crossJoin(broadcast(best))
      .filter(col("rc") === col("max_rc"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rc") / 100.0).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q9 product-type profit: profit per supplier nation per order year
    * over a LIKE-filtered part set. The fixture has no partsupp, so
    * supply cost is modeled as half the part's retail price — the shape
    * (5-table multi-join + like filter + two-key rollup) is unchanged.
    * Profit accumulates in exact 1e-4-dollar BIGINT units (prices are
    * cent-exact, discounts percent-exact, quantities integral), so both
    * engines sum identical integers and the final /10000.0 is the same
    * IEEE division on the same int64 — no float boundary anywhere.
    */
  def q9(s: SparkSession, d: String): DataFrame = {
    val epc = round(col("l_extendedprice") * 100).cast("long")
    val dpc = round(col("l_discount") * 100).cast("long")
    val rpc = round(col("p_retailprice") * 100).cast("long")
    val qty = col("l_quantity").cast("long")
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").like("red%")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"),
        (epc * (lit(100L) - dpc) - lit(50L) * rpc * qty).as("pu"))
      .groupBy(col("nation"), col("o_year"))
      .agg((sum(col("pu")) / 10000.0).as("sum_profit"))
  }

  /** Q20 potential part promotion: the nested semi-join chain — suppliers
    * who shipped a large quantity of any LIKE-filtered part in a year,
    * inside one nation. The fixture has no partsupp/availqty, so "surplus
    * stock" becomes "shipped more than 40 units of one red part" — the
    * chain part -> lineitem-agg -> supplier -> nation is the spec's shape.
    * The threshold is scale-relative (group quantity above 1.5x the
    * average group, like the spec's half-of-shipped comparison) in exact
    * BIGINT math — q*2n > 3S never touches a float boundary, and the
    * query stays meaningful at every scale factor. Both semi-joins stay
    * hash-based; the 1-row (S, n) aggregate broadcasts.
    */
  def q20(s: SparkSession, d: String): DataFrame = {
    val grouped = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.part(s, d).filter(col("p_name").like("red%"))
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("ship_qty"))
    val tot = grouped.agg(sum(col("ship_qty")).as("s_total"),
      count(lit(1)).as("n_groups"))
    val bigShippers = grouped.crossJoin(broadcast(tot))
      .filter(col("ship_qty") * 2 * col("n_groups") > lit(3L) * col("s_total"))
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_19")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  /** Q21 suppliers who kept orders waiting: the double-correlation shape —
    * an EXISTS (another supplier contributed to the same order) AND a
    * NOT EXISTS (no OTHER supplier was also late) over lineitem
    * self-joins. "Late" is the q4 adaptation (shipped >90 days after the
    * order date; the fixture has no commit/receipt dates). Both
    * correlations are hash joins on the order key; the lateness and
    * supplier-inequality conditions ride along as residuals inside the
    * semi/anti join — never a post-cartesian filter.
    */
  def q21(s: SparkSession, d: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
    val l2 = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("l2_okey"), col("l_suppkey").as("l2_skey"))
    val l3 = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("l3_okey"), col("l_suppkey").as("l3_skey"),
        col("l_shipdate").as("l3_ship"))
    Tables.supplier(s, d)
      .join(Tables.lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(late)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_19")
      .join(l2, col("l2_okey") === col("l_orderkey") &&
        col("l2_skey") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("l3_okey") === col("l_orderkey") &&
        col("l3_skey") =!= col("l_suppkey") &&
        col("l3_ship") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** Q8 national market share: one nation's share of a part-type's
    * revenue inside a region, per order year — the CASE-sum/sum two-level
    * rollup over a 7-table join (the widest classic star). Revenue in
    * exact 1e-4-dollar BIGINT units; the share division is the same IEEE
    * op on the same two int64 sums in both engines.
    */
  def q8(s: SparkSession, d: String): DataFrame = {
    val units = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d).select(col("n_nationkey").as("cn_key"),
        col("n_regionkey").as("cr_key")), col("c_nationkey") === col("cn_key"))
      .join(Tables.region(s, d), col("cr_key") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .join(Tables.nation(s, d).select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation")), col("s_nationkey") === col("sn_key"))
      .select(year(col("o_orderdate")).as("o_year"), units.as("u"),
        when(col("supp_nation") === "NATION_12", units).otherwise(lit(0L))
          .as("nu"))
      .groupBy(col("o_year"))
      .agg(round(sum(col("nu")) / sum(col("u")), 6).as("mkt_share"))
  }

  /** Q12 shipping-priority audit: conditional counts of critical vs
    * ordinary order priorities among late-shipped lines (the fixture has
    * no shipmode/receiptdate, so the mode split becomes the returnflag
    * and "late" the q4 90-day rule) — the join + CASE-count rollup.
    */
  def q12(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))

  /** Q13 customer order-count distribution: how many customers placed N
    * orders — the left-outer join with a predicate ON THE JOIN (excluded
    * priority class still yields the customer with count 0) followed by a
    * second-level aggregation over the first's result.
    */
  def q13(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "5-LOW", "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q19 discounted revenue: the three-bracket disjunction over the
    * lineitem x part join — each bracket pairs a brand with its own size
    * and quantity bands, so no single conjunct can be pushed to either
    * scan alone, but the p_partkey equi-join must stay a hash join with
    * the disjunction as a post-join filter.
    */
  def q19(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 30) &&
          col("l_quantity").between(10, 40)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 50) &&
          col("l_quantity").between(20, 50)))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))

  /** Q2 minimum-cost supplier: for each part in a size/type slice, the
    * supplier(s) achieving the minimum observed unit price — the
    * correlated-scalar-min + join-back shape (the fixture has no
    * partsupp, so "supply cost" is the shipped unit price from lineitem).
    * Unit price compares in exact integer milli-cents (ep_cents*1000 div
    * qty — floor division of positives, identical in both engines), so
    * equality-to-min never touches a float boundary. Deterministic LIMIT:
    * the sort key ends with the unique (p_partkey, s_suppkey) pair.
    */
  def q2(s: SparkSession, d: String): DataFrame = {
    val unitMc = expr(
      "(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000) div CAST(l_quantity AS BIGINT)")
    val offers = Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "STANDARD" &&
        col("p_size") <= 25), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"), col("l_suppkey"),
        unitMc.as("unit_mc"))
    val best = offers.groupBy(col("p_partkey").as("bp_key"))
      .agg(min(col("unit_mc")).as("min_mc"))
    offers
      .join(best, col("p_partkey") === col("bp_key") &&
        col("unit_mc") === col("min_mc"))
      .select(col("p_partkey"), col("p_brand"), col("l_suppkey"),
        col("min_mc")).distinct()
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("p_partkey"), col("p_brand"),
        (col("min_mc") / 100000.0).as("min_unit_price"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_suppkey"))
      .limit(100)
  }

  /** Q16 supplier-part relationship counts: distinct suppliers who
    * shipped each (brand, size) slice, excluding a NOT-IN supplier set —
    * the anti-join + count-distinct rollup (partsupp's offer relation is
    * the fixture's shipped relation).
    */
  def q16(s: SparkSession, d: String): DataFrame = {
    val excluded = Tables.supplier(s, d)
      .filter(col("s_name").like("%7%")).select(col("s_suppkey"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 10, 20, 30, 40)),
        col("l_partkey") === col("p_partkey"))
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q11 important stock: per-part shipped value for one nation's
    * suppliers, keeping parts whose value clears a global-scalar
    * threshold — the HAVING-against-a-scalar-subquery shape. The fixture
    * has no partsupp, so "stock value" is shipped extended price; the
    * threshold is 1.5x the mean part value (scale-relative, exact BIGINT
    * cents: v*2n > 3T) rather than the spec's fixed fraction, which no
    * single constant satisfies at every scale factor. The (T, n) global
    * aggregate broadcasts — one row against the part-value table.
    */
  def q11(s: SparkSession, d: String): DataFrame = {
    val v = Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_19")
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("val_cents"))
    val tot = v.agg(sum(col("val_cents")).as("t"), count(lit(1)).as("n"))
    v.crossJoin(broadcast(tot))
      .filter(col("val_cents") * col("n") * 2 > col("t") * 3)
      .select(col("l_partkey"), (col("val_cents") / 100.0).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q_tpch_q11" -> q11,
    "q_tpch_q2" -> q2,
    "q_tpch_q16" -> q16,
    "q_tpch_q8" -> q8,
    "q_tpch_q12" -> q12,
    "q_tpch_q13" -> q13,
    "q_tpch_q19" -> q19,
    "q_tpch_q9" -> q9,
    "q_tpch_q20" -> q20,
    "q_tpch_q21" -> q21,
    "q_tpch_q4" -> q4,
    "q_tpch_q15" -> q15,
    "q_tpch_q3" -> q3,
    "q_tpch_q5" -> q5,
    "q_tpch_q6" -> q6,
    "q_tpch_q7" -> q7,
    "q_tpch_q10" -> q10,
    "q_tpch_q14" -> q14,
    "q_tpch_q17" -> q17,
    "q_tpch_q18" -> q18,
    "q_tpch_q22" -> q22
  )

  val oracle = Map(
    "q_tpch_q11" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) val_cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_19'
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(val_cents) AS BIGINT) t, count(*) n FROM v)
        |SELECT l_partkey, val_cents / 100.0 AS part_value
        |FROM v, tot
        |WHERE val_cents * n * 2 > t * 3
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q_tpch_q2" ->
      """WITH offers AS (
        |  SELECT p_partkey, p_brand, l_suppkey,
        |    (CAST(round(l_extendedprice * 100) AS BIGINT) * 1000)
        |      // CAST(l_quantity AS BIGINT) unit_mc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'STANDARD' AND p_size <= 25),
        |best AS (
        |  SELECT p_partkey bp_key, CAST(min(unit_mc) AS BIGINT) min_mc
        |  FROM offers GROUP BY 1)
        |SELECT DISTINCT s_suppkey, s_name, s_acctbal, p_partkey, p_brand,
        |  min_mc / 100000.0 AS min_unit_price
        |FROM offers
        |JOIN best ON p_partkey = bp_key AND unit_mc = min_mc
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY s_acctbal DESC, p_partkey, s_suppkey
        |LIMIT 100""".stripMargin,
    "q_tpch_q16" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type <> 'PROMO' AND p_size IN (1, 10, 20, 30, 40)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_name LIKE '%7%')
        |GROUP BY 1, 2""".stripMargin,
    "q_tpch_q8" ->
      """WITH rows_ AS (
        |  SELECT CAST(year(o_orderdate) AS INT) o_year,
        |    CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) u,
        |    sn.n_name supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01')
        |SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_12' THEN u
        |                      ELSE 0 END) AS BIGINT)
        |    / CAST(sum(u) AS BIGINT), 6) AS mkt_share
        |FROM rows_ GROUP BY 1""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q19" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 30
        |       AND l_quantity BETWEEN 10 AND 40)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 50
        |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin,
    "q_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |    - 50 * CAST(round(p_retailprice * 100) AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS BIGINT) / 10000.0
        |    AS sum_profit
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE p_name LIKE 'red%'
        |GROUP BY 1, 2""".stripMargin,
    "q_tpch_q20" ->
      """WITH g AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) q
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE 'red%')
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(q) AS BIGINT) s_total, count(*) n_groups
        |  FROM g)
        |SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_19'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM g, tot
        |    WHERE q * 2 * n_groups > 3 * s_total)
        |ORDER BY s_name""".stripMargin,
    "q_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders   ON o_orderkey = l1.l_orderkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND n_name = 'NATION_19'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate  > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_tpch_q7" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM supplier
        |JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND ((sn.n_name = 'NATION_12' AND cn.n_name = 'NATION_10')
        |    OR (sn.n_name = 'NATION_10' AND cn.n_name = 'NATION_12'))
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |              AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1""".stripMargin,
    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100
        |      AS BIGINT) rc
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, rc / 100.0 AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE rc = (SELECT max(rc) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_tpch_q14" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-07-01'
        |  AND l_shipdate <  TIMESTAMP '1996-08-01'""".stripMargin,
    "q_tpch_q17" ->
      """WITH pa AS (
        |  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) sq,
        |    count(*) nq
        |  FROM lineitem GROUP BY 1)
        |SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN pa USING (l_partkey)
        |WHERE p_brand = 'Brand#5' AND p_type = 'SMALL'
        |  AND CAST(l_quantity AS BIGINT) * 5 * nq < sq""".stripMargin,
    "q_tpch_q22" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) bal_cents
        |  FROM customer),
        |pos AS (SELECT CAST(sum(bal_cents) AS BIGINT) sum_cents, count(*) n_pos
        |  FROM cust WHERE bal_cents > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  round(sum(bal_cents) / 100.0, 2) AS totacctbal
        |FROM cust CROSS JOIN pos
        |WHERE bal_cents * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  )
}
