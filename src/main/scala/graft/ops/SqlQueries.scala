package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry path: the engine is equally drivable through spark.sql over
  * registered views — including correlated subqueries, which Catalyst
  * decorrelates into joins (RewriteCorrelatedScalarSubquery), an
  * optimization the reference's hand-written jobs could never get.
  */
object SqlQueries extends QueryPack {

  /** Orders 50%+ above their customer's average — correlated scalar
    * subquery, decorrelated by Catalyst into an aggregate + join.
    */
  def aboveCustomerAvg(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_v")
    s.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        |FROM graft_orders_v o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT avg(o2.o_totalprice) FROM graft_orders_v o2
        |  WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
  }

  /** Recursive CTE (Spark 4's UnionLoop execution): walk every customer
    * key up its decimal-digit hierarchy (parent = key div 10) to the
    * root — the org-chart / BOM-explosion query shape. Depth is bounded
    * by the key width (~log10 n), so the loop runs O(log n) rounds each
    * an equi-computation over the frontier — the same iterate-til-fixed
    * shape as q_pagerank, but driven by the SQL surface instead of a
    * hand-rolled loop. Exact BIGINT depth/path arithmetic.
    */
  def digitHierarchy(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("graft_customer_v")
    s.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS start_key, c_custkey AS cur,
        |    CAST(0 AS BIGINT) AS depth
        |  FROM graft_customer_v
        |  UNION ALL
        |  SELECT start_key, cur div 10, depth + 1 FROM chain WHERE cur > 0
        |)
        |SELECT start_key, max(depth) AS depth_to_root,
        |  sum(cur) AS path_sum
        |FROM chain GROUP BY start_key""".stripMargin)
  }

  /** Lateral join (correlated derived table): each nation's top-2
    * customers by account balance — the SQL-surface shape for per-row
    * parameterized subqueries. Catalyst decorrelates the correlated
    * ORDER BY + LIMIT into a window rank over ONE customer shuffle (no
    * per-nation re-scan, no nested loop — pinned in PlanSpec), so the
    * plan is the q_topk_group shape even though the query text is an
    * iterate-per-outer-row construct.
    */
  def lateralTopPerNation(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("graft_nation_v")
    Tables.customer(s, d).createOrReplaceTempView("graft_customer_lv")
    s.sql(
      """SELECT n_name, t.c_custkey AS custkey,
        |  CAST(round(t.c_acctbal * 100) AS BIGINT) AS acctbal_cents
        |FROM graft_nation_v,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM graft_customer_lv
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q_sql_subquery" -> aboveCustomerAvg,
    "q_sql_recursive" -> digitHierarchy,
    "q_sql_lateral" -> lateralTopPerNation
  )

  val oracle = Map(
    "q_sql_subquery" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT avg(o2.o_totalprice) FROM orders o2
        |  WHERE o2.o_custkey = o.o_custkey)""".stripMargin,
    // DuckDB's WITH RECURSIVE with `//` floor division (same as Spark's
    // `div` on non-negative keys); sum(BIGINT) is HUGEINT — cast back.
    "q_sql_recursive" ->
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS start_key, c_custkey AS cur,
        |    CAST(0 AS BIGINT) AS depth
        |  FROM customer
        |  UNION ALL
        |  SELECT start_key, cur // 10, depth + 1 FROM chain WHERE cur > 0
        |)
        |SELECT start_key, CAST(max(depth) AS BIGINT) AS depth_to_root,
        |  CAST(sum(cur) AS BIGINT) AS path_sum
        |FROM chain GROUP BY start_key""".stripMargin,
    "q_sql_lateral" ->
      """SELECT n_name, t.c_custkey AS custkey,
        |  CAST(round(t.c_acctbal * 100) AS BIGINT) AS acctbal_cents
        |FROM nation,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin
  )
}
