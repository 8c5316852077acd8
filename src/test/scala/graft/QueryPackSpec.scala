package graft

import org.apache.spark.sql.functions._

/** Every registered query must run, produce its declared non-empty schema,
  * and (where cheap to pin) match hand-checked values at sf0.001. The
  * DuckDB hash gate is the deep check; this suite is the fast in-JVM
  * regression net.
  */
class QueryPackSpec extends SparkSpec {

  // Queries that legitimately return zero rows at the smallest SF (e.g.
  // no order-less customer, no part priced within 50 of any supplier
  // balance, no cell value ≥ the filter threshold at sf0.001).
  private val mayBeEmpty =
    Set("q_join_anti", "q_point_get", "q_except", "q_filter_value", "q_join_range")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty, "schema must be non-empty")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query key has oracle SQL (except declared approximates)") {
    // approximate sketches are deliberately rows-only checked — a DuckDB
    // oracle cannot replay HLL internals (SparkEntry contract allows this)
    val weakByDesign = Set("q_distinct_approx")
    val missing =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- weakByDesign
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("no oracle SQL without a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry() flagship returns the 6 TPC-H Q1 groups") {
    assert(SparkEntry.entry(spark).count() === 6)
  }

  test("topKNeighbors laws: k-monotone subset, symmetric closure, rank sane") {
    import graft.api.GraftOps
    import spark.implicits._
    // deterministic scored pairs with ties (jac depends on sum mod 4)
    val pairs = (for (a <- 0L until 30L; b <- (a + 1) until 30L
                      if (a + b) % 3 != 0)
      yield (a, b, (a + b) % 7 + 1, ((a * b) % 4 + 1) * 1000L))
      .toDF("sa", "sb", "common", "jac_ppm")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
    val k3 = GraftOps.topKNeighbors(pairs, 3).collect().map(key).toSet
    val k5 = GraftOps.topKNeighbors(pairs, 5).collect().map(key).toSet
    // k-monotone: the k=3 table is exactly the rank<=3 slice of k=5
    assert(k3 === k5.filter(_._4 <= 3L), "k=3 must be the k=5 prefix")
    // symmetric closure: every node sees each qualifying pair from its
    // own side before truncation — rank 1 exists for every node present
    val byNode = GraftOps.topKNeighbors(pairs, 3).collect()
      .groupBy(_.getLong(0))
    byNode.foreach { case (n, rows) =>
      val rks = rows.map(_.getLong(4)).sorted
      assert(rks === (1L to rks.length).toArray.toSeq,
        s"node $n ranks must be a dense 1..k prefix")
    }
    // determinism under ties: two runs agree exactly
    val again = GraftOps.topKNeighbors(pairs, 3).collect().map(key).toSet
    assert(again === k3, "tie-break must make the result deterministic")
  }

  test("q_join_salted equals the unsalted join bit-for-bit") {
    // the salt is an execution-layout device only — any visible effect
    // (dropped bucket, modulo mismatch, dim under-replication) is a bug
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n_items"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    val salted = SparkEntry.queries("q_join_salted")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(salted === plain)
  }

  test("maskTombstones: masks at-or-before the marker, keeps newer versions") {
    import spark.implicits._
    // key 1 tombstoned at ts=10: the ts=10 version is masked (HBase
    // Delete covers the marker's own timestamp), ts=20 survives; key 2
    // has no marker and keeps everything
    val ev = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 10L))
      .toDF("event_id", "k", "ts")
    val tomb = Seq((1L, 10L)).toDF("k", "tomb_ts")
    val kept = api.GraftOps.maskTombstones(ev, col("k"), col("ts"), tomb)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
    // several markers per key: the NEWEST one governs
    val multi = Seq((1L, 5L), (1L, 15L)).toDF("k", "tomb_ts")
    val kept2 = api.GraftOps.maskTombstones(ev, col("k"), col("ts"), multi)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(kept2 === Set(2L, 3L))
  }

  test("q_group_agg pins: row count equals distinct flag/status pairs") {
    val li = Tables.lineitem(spark, sf)
    val expected = li
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus")).distinct().count()
    assert(ops.AggQueries.groupAgg(spark, sf).count() === expected)
  }

  test("q_distinct_approx estimates within the declared rsd of exact") {
    // the one rows-only gate: its accuracy claim still gets checked here —
    // HLL at rsd=0.02 must land within 5*rsd of the exact distinct count
    // (a generous band; typical error is ~1 rsd)
    import org.apache.spark.sql.functions.{col, countDistinct}
    val approx = SparkEntry.queries("q_distinct_approx")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val e = approx(k)
      assert(math.abs(e - n) <= math.max(1L, math.round(n * 0.10)),
        s"group $k: approx $e vs exact $n")
    }
  }

  test("q_count_rows matches DataFrame.count") {
    val n = SparkEntry.queries("q_count_rows")(spark, sf)
      .collect().head.getLong(0)
    assert(n === Tables.lineitem(spark, sf).count())
  }

  test("q_v1_latest keeps exactly one row per (user, event_type)") {
    val v1 = ops.WindowQueries.v1Latest(spark, sf)
    assert(v1.groupBy(col("user_id"), col("event_type")).count()
      .filter(col("count") > 1).count() === 0)
    val keys = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct().count()
    assert(v1.count() === keys)
  }
}
