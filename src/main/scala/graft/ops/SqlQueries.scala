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

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q_sql_subquery" -> aboveCustomerAvg
  )

  val oracle = Map(
    "q_sql_subquery" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT avg(o2.o_totalprice) FROM orders o2
        |  WHERE o2.o_custkey = o.o_custkey)""".stripMargin
  )
}
