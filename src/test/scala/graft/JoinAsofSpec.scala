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

  test("nearest direction picks the closer of backward and forward, ties backward") {
    import graft.api.GraftOps
    val ev = Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val clicks = ev.filter(col("event_type") === "click")
    val buys = ev.filter(col("event_type") === "purchase")
    val near = ops.JoinQueries.queries("q_join_asof_near")(spark, sf)
      .select(col("event_id"), col("asof_ts").as("near_ts"))
    val back = GraftOps.asofJoin(clicks, buys, "user_id", "ts", "event_id")
      .select(col("event_id"), col("asof_ts").as("back_ts"))
    val j = near.join(back, "event_id")
      .join(buys.select(col("event_id"), col("ts")), "event_id")
    // nearest is never farther than backward, and exists whenever
    // backward does (forward can only add matches)
    val worse = j.filter(col("back_ts").isNotNull &&
      (col("near_ts").isNull ||
        abs(expr("unix_micros(near_ts) - unix_micros(ts)")) >
          abs(expr("unix_micros(back_ts) - unix_micros(ts)")))).count()
    assert(worse === 0, s"$worse purchases matched farther than backward")
    // and at least one purchase is matched forward-only at sf0.001
    // (first purchase of a user precedes their first click)
    assert(j.filter(col("back_ts").isNull && col("near_ts").isNotNull)
      .count() > 0, "no forward-only matches — nearest adds nothing?")
  }

  test("tolerance nulls exactly the matches staler than the bound") {
    import graft.api.GraftOps
    val ev = Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val plain = GraftOps.asofJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      key = "user_id", ts = "ts", tradeId = "event_id")
    val tol = ops.JoinQueries.queries("q_join_asof_tol")(spark, sf)
    // same row set; asof_ts either identical or nulled
    assert(tol.count() === plain.count())
    val joined = tol.select(col("event_id"), col("asof_ts").as("t_tol"))
      .join(plain.select(col("event_id"), col("asof_ts").as("t_plain")),
        "event_id")
      .join(Tables.events(spark, sf)
        .select(col("event_id"), col("ts")), "event_id")
    // nulled exactly when the unbounded match was staler than 30 minutes
    val wrong = joined.filter(
      (col("t_tol").isNull && col("t_plain").isNotNull &&
        col("t_plain") >= col("ts") - expr("INTERVAL 30 MINUTES")) ||
      (col("t_tol").isNotNull && col("t_tol") =!= col("t_plain"))).count()
    assert(wrong === 0, s"$wrong rows disagree with the tolerance contract")
    // and some matches actually differ at sf0.001 (the bound has teeth)
    assert(joined.filter(col("t_tol").isNull && col("t_plain").isNotNull)
      .count() > 0, "tolerance bound never fired — fixture too dense?")
  }
}
