package graft

import org.apache.spark.sql.functions._

/** As-of join semantics (absorbs the former AsofDbg scratch checks): the
  * window formulation must equal the naive correlated "max click ts ≤
  * purchase ts per user" definition, row for row.
  */
class JoinAsofSpec extends SparkSpec {

  test("q_join_asof equals the correlated-subquery definition") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val naive = purchases
      .join(clicks, col("user_id") === col("cu") && col("cts") <= col("ts"), "left")
      .groupBy(col("event_id"), col("user_id"))
      .agg(max(col("cts")).as("asof_ts"))
    val fast = ops.JoinQueries.joinAsof(spark, sf)
    assert(fast.count() === naive.count())
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }

  test("asof never returns a click after its purchase") {
    val bad = ops.JoinQueries.joinAsof(spark, sf).alias("a")
      .join(Tables.events(spark, sf).alias("e"),
        col("a.event_id") === col("e.event_id"))
      .filter(col("a.asof_ts") > col("e.ts"))
    assert(bad.count() === 0)
  }
}
