package graft.ops

import graft.{QueryPack, Tables}
import graft.api.GraftOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / sort / top-k tier (SURVEY.md §2.5) — the hand-rolled MR
  * patterns (TotalOrderPartitioner sort, composite-key secondary sort,
  * bounded-TreeMap top-N, sorted-reducer ranking/running values) as
  * declarative window/sort operators, plus V1: HBase's defining
  * latest-version-per-cell semantics (Scan#setMaxVersions analog).
  *
  * Every window ordering includes a unique key tiebreaker so results are
  * deterministic under any partitioning (and match the oracle exactly).
  */
object WindowQueries extends QueryPack {

  /** V1 — latest version per cell. Model: rowkey = user_id, qualifier =
    * event_type, version = ts; "maxVersions(1)" keeps the newest cell per
    * (row, qualifier). One shuffle on the key, one sorted window pass.
    */
  def v1Latest(s: SparkSession, d: String): DataFrame =
    GraftOps.latestVersion(Tables.events(s, d),
      rowkey = col("user_id"), qualifier = col("event_type"),
      version = col("ts"), tiebreak = col("event_id"))
      .select(col("user_id"), col("event_type"), col("ts"), col("value"),
        col("event_id"))

  /** SCD2 dimension build (shared by q_scd2 and q_join_temporal): state-
    * change detection + interval stitch over one user_id shuffle.
    */
  def scd2Dim(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull ||
        col("prev_state") =!= col("event_type"))
      .select(col("user_id"), col("event_type").as("state"),
        col("us").as("valid_from_us"),
        lead(col("us"), 1).over(w).as("valid_to_us"),
        row_number().over(w).cast("long").as("version"),
        lead(col("us"), 1).over(w).isNull.cast("int").as("is_current"))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    // Total-order sort: Spark range-partitions by sampled quantiles —
    // exactly TotalOrderPartitioner's contract (SURVEY.md §3.2).
    "q_sort_global" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))),

    // Secondary sort: partition by the grouping key, order by the value
    // key WITHIN each partition — composite-key + grouping-comparator MR
    // pattern with no global exchange beyond the repartition.
    "q_sort_secondary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"), col("l_linenumber"),
          col("l_quantity"))
        .repartition(col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"), col("l_shipdate"),
          col("l_linenumber"))),

    // Top-N: plans as TakeOrderedAndProject — per-partition bounded heap
    // + driver merge, the exact TreeMap-in-cleanup() trick, never a full
    // global sort.
    "q_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)),

    // Top-N per group: row_number over a per-group ordered window.
    "q_topk_group" -> ((s, d) =>
      GraftOps.topKPerGroup(Tables.orders(s, d), group = col("o_orderpriority"),
        order = col("o_totalprice"), tiebreak = col("o_orderkey"), k = 3)
        .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"),
          col("o_totalprice"))),

    // Ranking family: rank / dense_rank / percent_rank / ntile.
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          ntile(4).over(w).as("quartile"))
    }),

    // Analytic family: lag / lead / running aggregate over an ordered
    // per-key frame — the sorted-reducer-iteration patterns.
    "q_window_analytic" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"),
          round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
          round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
          round(sum(col("o_totalprice")).over(run), 2).as("running_spend"),
          row_number().over(w).as("order_seq"))
    }),

    // RANGE-frame window: trailing 5-minute per-user aggregate keyed on
    // event TIME, not row count — the other half of the frame spec next
    // to q_window_analytic's ROWS frames. unix_micros keeps the frame
    // key exact-integer in both engines (the ns fixtures truncate to µs
    // identically); floor(value) keeps the windowed sum integer so no
    // float accumulation order can flip a digit.
    "q_window_range" -> ((s, d) => {
      val us = unix_micros(col("ts"))
      val w = Window.partitionBy(col("user_id")).orderBy(us)
        .rangeBetween(-300L * 1000000L, 0L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), us.as("ts_us"),
          count(lit(1)).over(w).as("n_5min"),
          sum(floor(col("value"))).over(w).as("val_5min"))
    }),

    // Strict sequential funnel (view → click-after-view →
    // purchase-after-click): three per-user window passes that all ride
    // the SAME user_id hash partitioning — Catalyst plans one Exchange,
    // then reuses it for every stage and for the per-user rollup, so the
    // whole funnel costs a single shuffle of events at any scale. Stage
    // timestamps are exact-integer µs; counts of non-null stages give
    // the funnel report.
    "q_funnel" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      // NULL-key parity: partitionBy keeps a NULL-user group but the
      // oracle's equi-join drops it — exclude NULL keys on both sides so
      // the two can never diverge if the fixture gains NULL user_ids.
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      ev.withColumn("t1",
          min(when(col("event_type") === "view", col("us"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("us") > col("t1"),
            col("us"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("us") > col("t2"),
            col("us"))).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
          max(col("t3")).as("t3"))
        .agg(count(lit(1)).as("n_users"),
          count(col("t1")).as("n_view"),
          count(col("t2")).as("n_click"),
          count(col("t3")).as("n_funnel_complete"))
    }),

    // Gap-based sessionization — the batch analog of s_session's
    // event-time session windows: a session breaks after 30 min of user
    // inactivity. lag + running sum + the per-session rollup all ride ONE
    // user_id hash partitioning (groupBy(user_id, session_idx) is
    // satisfied by the window's user_id clustering — subset rule — so
    // Catalyst plans a single Exchange for the whole query at any scale).
    // Timestamps are exact-integer µs; NULL user_ids excluded on both
    // sides (the q_funnel parity discipline).
    "q_sessionize" -> ((s, d) => {
      val gapUs = 30L * 60L * 1000000L
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      ev.withColumn("new_s",
          when(lag(col("us"), 1).over(ord).isNull ||
            col("us") - lag(col("us"), 1).over(ord) > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_idx",
          sum(col("new_s")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"),
          (max(col("us")) - min(col("us"))).as("duration_us"))
    }),

    // SCD type-2 dimension build: treat each user's event_type as a
    // changing state and emit one validity interval per state change
    // (valid_from / valid_to, NULL = current, version = change ordinal).
    // Change detection (lag) and interval stitching (lead / row_number
    // over the change rows) share the same user_id partitioning — one
    // shuffle; the change filter between them runs partition-local.
    "q_scd2" -> scd2Dim,

    // Temporal (validity-interval) join — the warehouse pattern "which
    // dimension VERSION was in effect when this fact happened": each
    // purchase matches the SCD2 state interval containing its
    // timestamp, via an equi-join on the natural key with the interval
    // predicate as a hash-join residual (never a cross/range product —
    // per-user version counts are bounded). Intervals are half-open
    // [from, to) and partition the user's timeline, so every purchase
    // matches exactly one version.
    "q_join_temporal" -> ((s, d) => {
      val dim = scd2Dim(s, d)
        .select(col("user_id").as("d_uid"), col("state"),
          col("valid_from_us"), col("valid_to_us"), col("version"))
      Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .join(dim, col("user_id") === col("d_uid") &&
          col("us") >= col("valid_from_us") &&
          (col("valid_to_us").isNull || col("us") < col("valid_to_us")))
        .select(col("event_id"), col("user_id"), col("us"),
          col("state"), col("version"))
    }),

    // Time-series gap fill (LOCF): per-user hourly series over the full
    // [first, last] hour spine, missing hours carry the last observed
    // value forward. Per-hour "latest observation" is a max(struct) —
    // partial-agg friendly, no per-hour sort; the spine explodes from a
    // 2-value-per-user aggregate (never a driver-side range); the fill is
    // one last(ignoreNulls) window on the user partitioning. Hour keys
    // are exact integer µs-div; observed values pass through untouched,
    // so there is zero float drift for the oracle to chase. Pre-epoch
    // events are excluded BY CONTRACT on both engines: hour bucketing is
    // defined on non-negative epoch-µs only, because Spark's `div`
    // truncates toward zero while floor-division engines would bucket a
    // negative microsecond into the previous hour — the guard makes the
    // pair agree by construction instead of by div-semantics luck.
    "q_gapfill" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .filter(col("us") >= 0)
        .withColumn("hr", expr("us div 3600000000"))
      val hourly = ev.groupBy(col("user_id"), col("hr"))
        .agg(max(struct(col("us"), col("event_id"), col("value")))
          .getField("value").as("v_obs"))
      val spine = hourly.groupBy(col("user_id"))
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hr"))
      spine.join(hourly, Seq("user_id", "hr"), "left")
        .select(col("user_id"), col("hr"),
          last(col("v_obs"), ignoreNulls = true).over(
            Window.partitionBy(col("user_id")).orderBy(col("hr"))
              .rowsBetween(Window.unboundedPreceding, 0)).as("value"),
          col("v_obs").isNull.cast("int").as("is_gap"))
    }),

    // Distribution window functions — the rank-statistics family
    // (percent_rank, cume_dist, ntile quartiles) per user. One user_id
    // shuffle serves all three. NULL values are filtered on BOTH engines
    // up front: Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST, so
    // an unfiltered NULL would shift every rank. The (value, event_id)
    // order is total, so ties cannot make any of the three functions
    // nondeterministic; the rational outputs divide identical integers —
    // bit-identical across engines.
    "q_window_dist" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("event_id"), col("value"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          ntile(4).over(w).cast("long").as("quartile"))
    }),

    // Ratio-to-report: each nation's share of its region's revenue — the
    // unbounded-frame window-sum pattern (partition total without a
    // second aggregate+join). Exact cents in, one ppm division out. The
    // ppm product widens through DECIMAL(38,0): cents is scale-
    // proportional, so the BIGINT cents·10⁶ product overflows (ANSI
    // ARITHMETIC_OVERFLOW) once a nation clears ~9.2e12 cents (~TPC-H
    // sf10); the decimal multiply is exact to 38 digits and the quotient
    // is back under 10⁶, so the final BIGINT cast never overflows.
    "q_window_ratio" -> ((s, d) => {
      val rev = Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"), col("n_name"))
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))")
          .as("cents"))
      val w = Window.partitionBy(col("n_regionkey"))
      rev.select(col("n_regionkey"), col("n_name"), col("cents"),
        sum(col("cents")).over(w).as("region_cents"))
        .withColumn("share_ppm",
          expr("CAST((CAST(cents AS DECIMAL(38,0)) * 1000000)" +
            " div region_cents AS BIGINT)"))
    }),

    "q_v1_latest" -> v1Latest,

    // maxVersions(3): the VERSIONS => N retention read.
    "q_v_maxn" -> ((s, d) =>
      GraftOps.latestVersions(Tables.events(s, d),
        rowkey = col("user_id"), qualifier = col("event_type"),
        version = col("ts"), tiebreak = col("event_id"), n = 3)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("value"), col("event_id"))),

    // Delete-marker masking: every user_id % 11 == 0 carries a
    // tombstone 7 days before their newest event — versions at or
    // before it are masked, newer ones survive (the HBase Delete
    // read path, not a plain anti join).
    "q_tombstone" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val tomb = ev.filter(pmod(col("user_id"), lit(11L)) === 0)
        .select(col("user_id").as("k"),
          (col("ts") - expr("INTERVAL 7 DAYS")).as("tomb_ts"))
      GraftOps.maskTombstones(ev, col("user_id"), col("ts"), tomb)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"))
    })
  )

  val oracle = Map(
    "q_sort_global" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "q_sort_secondary" ->
      """SELECT l_orderkey, l_shipdate, l_linenumber, l_quantity
        |FROM lineitem""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_topk_group" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,
    "q_window_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""".stripMargin,
    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
        |  CAST(row_number() OVER w AS INT) AS order_seq
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) us
        |  FROM events WHERE user_id IS NOT NULL),
        |u1 AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN us END) t1
        |  FROM ev GROUP BY 1),
        |u2 AS (
        |  SELECT e.user_id, t1,
        |    min(CASE WHEN event_type = 'click' AND us > t1 THEN us END) t2
        |  FROM ev e JOIN u1 USING (user_id) GROUP BY 1, 2),
        |u3 AS (
        |  SELECT e.user_id, t1, t2,
        |    min(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END) t3
        |  FROM ev e JOIN u2 USING (user_id) GROUP BY 1, 2, 3)
        |SELECT count(*) AS n_users, count(t1) AS n_view,
        |  count(t2) AS n_click, count(t3) AS n_funnel_complete
        |FROM u3""".stripMargin,
    "q_window_range" ->
      """SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |  count(*) OVER w AS n_5min,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) OVER w AS BIGINT) AS val_5min
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |  RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) us
        |  FROM events WHERE user_id IS NOT NULL),
        |fl AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |              OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |sess AS (
        |  SELECT user_id, us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM fl)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS n_events, min(us) AS start_us,
        |  max(us) - min(us) AS duration_us
        |FROM sess GROUP BY 1, 2""".stripMargin,
    "q_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) us
        |  FROM events WHERE user_id IS NOT NULL),
        |ch AS (
        |  SELECT user_id, event_type, event_id, us,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS prev_state
        |  FROM ev),
        |st AS (
        |  SELECT user_id, event_type, event_id, us FROM ch
        |  WHERE prev_state IS NULL OR prev_state <> event_type)
        |SELECT user_id, event_type AS state, us AS valid_from_us,
        |  lead(us) OVER w2 AS valid_to_us,
        |  CAST(row_number() OVER w2 AS BIGINT) AS version,
        |  CAST(lead(us) OVER w2 IS NULL AS INT) AS is_current
        |FROM st WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)""".stripMargin,

    // Same SCD2 CTEs, then the validity-interval join: half-open
    // [from, to) intervals partition each user's timeline, so every
    // purchase matches exactly one version on both engines.
    "q_join_temporal" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) us
        |  FROM events WHERE user_id IS NOT NULL),
        |ch AS (
        |  SELECT user_id, event_type, event_id, us,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS prev_state
        |  FROM ev),
        |st AS (
        |  SELECT user_id, event_type, event_id, us FROM ch
        |  WHERE prev_state IS NULL OR prev_state <> event_type),
        |scd AS (
        |  SELECT user_id, event_type AS state, us AS valid_from_us,
        |    lead(us) OVER w2 AS valid_to_us,
        |    CAST(row_number() OVER w2 AS BIGINT) AS version
        |  FROM st WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)),
        |p AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) us
        |  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL)
        |SELECT p.event_id, p.user_id, p.us, s.state, s.version
        |FROM p JOIN scd s ON p.user_id = s.user_id
        |  AND p.us >= s.valid_from_us
        |  AND (s.valid_to_us IS NULL OR p.us < s.valid_to_us)""".stripMargin,
    "q_gapfill" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr
        |  FROM events
        |  WHERE user_id IS NOT NULL
        |    AND epoch_us(CAST(ts AS TIMESTAMP)) >= 0),
        |hourly AS (
        |  SELECT user_id, hr,
        |    max(struct_pack(us := us, eid := event_id, v := value)).v AS v_obs
        |  FROM ev GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(min(hr), max(hr))) AS hr
        |  FROM hourly GROUP BY user_id),
        |j AS (
        |  SELECT s.user_id, s.hr, h.v_obs FROM spine s
        |  LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hr = h.hr)
        |SELECT user_id, hr,
        |  last_value(v_obs IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS value,
        |  CAST(v_obs IS NULL AS INT) AS is_gap
        |FROM j""".stripMargin,
    "q_window_dist" ->
      """SELECT user_id, event_id, value,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM events
        |WHERE user_id IS NOT NULL AND value IS NOT NULL
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)""".stripMargin,
    "q_window_ratio" ->
      """WITH rev AS (
        |  SELECT n_regionkey, n_name,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_regionkey, n_name, cents,
        |  CAST(sum(cents) OVER (PARTITION BY n_regionkey) AS BIGINT)
        |    AS region_cents,
        |  CAST((cents * 1000000)
        |    // sum(cents) OVER (PARTITION BY n_regionkey) AS BIGINT)
        |    AS share_ppm
        |FROM rev""".stripMargin,
    "q_v1_latest" ->
      """SELECT user_id, event_type, ts, value, event_id FROM (
        |  SELECT user_id, event_type, ts, value, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q_v_maxn" ->
      """SELECT user_id, event_type, ts, value, event_id FROM (
        |  SELECT user_id, event_type, ts, value, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin,
    "q_tombstone" ->
      """WITH tomb AS (
        |  SELECT user_id, max(ts - INTERVAL 7 DAY) AS tts
        |  FROM events WHERE user_id % 11 = 0 GROUP BY 1)
        |SELECT e.event_id, e.user_id, e.ts, e.event_type
        |FROM events e LEFT JOIN tomb t USING (user_id)
        |WHERE t.tts IS NULL OR e.ts > t.tts""".stripMargin
  )
}
