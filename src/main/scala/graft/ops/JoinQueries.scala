package graft.ops

import graft.{QueryPack, Tables}
import graft.api.GraftOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join tier (SURVEY.md §2.3).
  *
  * The reference hand-rolls two MapReduce join patterns: map-side
  * (small-table HashMap loaded in setup()) and reduce-side (tagged records
  * shuffled on the join key). Spark's equivalents are broadcast-hash join
  * and shuffle (sort-merge/hash) join; `broadcast()` hints pin the map-side
  * pattern for genuinely small dims so no shuffle of the fact table's rows
  * ever happens — the property that matters at 100 TB. Semi/anti joins
  * replace the per-record Get existence probe, and the as-of join models
  * HBase version semantics ("latest value ≤ t") with a single shuffle +
  * sorted window pass instead of a per-row lookup.
  */
object JoinQueries extends QueryPack {

  /** Map-side (broadcast) join: fact ⋈ dim, zero fact shuffle before
    * aggregation. No forced hint: part is scale-proportional (200k rows/SF
    * — far past broadcastable at 100 TB), so the broadcast-vs-shuffle call
    * belongs to JoinSelection + AQE, which still picks broadcast whenever
    * the dim side is actually under the threshold.
    */
  def joinBcast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** Reduce-side (shuffle) join: both sides large, co-partitioned on key. */
  def joinShuffle(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))

  /** As-of join (HBase "value as of time t"): for each purchase event, the
    * latest click timestamp of the same user at or before it. One union +
    * one shuffle on user_id + a sorted window pass — no per-row probe, no
    * range join; scales linearly in events.
    */
  def joinAsof(s: SparkSession, d: String): DataFrame = {
    // NULL users excluded on BOTH engines (the q_funnel discipline):
    // Window.partitionBy groups NULL keys together while the oracle's
    // correlated equality never matches NULL — without the filter a
    // NULL-user fixture row would silently diverge the gate.
    val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
    GraftOps.asofJoin(
      quotes = ev.filter(col("event_type") === "click"),
      trades = ev.filter(col("event_type") === "purchase"),
      key = "user_id", ts = "ts", tradeId = "event_id")
  }

  /** q_join_fuzzy: edit-distance self-join ([[GraftOps.fuzzyJoin]], k=2)
    * — entity resolution for the "same record, typo'd name" class. Raw
    * TPC-H part names are built from a tiny color vocabulary and sit
    * pathologically dense in edit space (3.8M true pairs at sf0.1 — a
    * 150s all-real-matches answer, measured), so the fixture entity name
    * is `p_name + md5(partkey)[0:12]` — a name + serial-number corpus
    * where random 12-hex suffixes keep distinct entities > 2 edits
    * apart AND supply nine rare hex 4-grams, so every prefix (k·q+1 = 9
    * rarest grams at q=4) is pure serial: candidate buckets stay ~3
    * names wide (an 8-hex suffix left one ~650-frequency WORD gram in
    * each prefix — measured 6.9M candidates vs 207k with 12).
    * Every 10th part plants a one-char-deleted copy at id +10M (the
    * piiScrub discipline: both engines synthesize the identical corpus),
    * so the join must find ~n/10 true needles among n haystack names.
    * The DuckDB oracle verifies by BRUTE FORCE over all length-banded
    * pairs — one pair missed by the q-gram blocking fails the hash, so
    * the gate is also the blocking-losslessness proof at fixture scale.
    */
  def joinFuzzy(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select(col("p_partkey"),
      concat(col("p_name"), lit(" "),
        substring(md5(col("p_partkey").cast("string")), 1, 12)).as("p_name"))
    // deletion position varies over 1..7 via (key div 10) mod 7 — a bare
    // `key mod 10` would be constant 0 after the `% 10 === 0` filter,
    // and every needle would exercise the same gram neighborhood
    val planted = p.filter(col("p_partkey") % 10 === 0)
      .select((col("p_partkey") + 10000000L).as("p_partkey"),
        expr("concat(substring(p_name, 1, CAST((p_partkey div 10) % 7 AS INT)), " +
          "substring(p_name, CAST((p_partkey div 10) % 7 AS INT) + 2))")
          .as("p_name"))
    GraftOps.fuzzyJoin(p.unionAll(planted), col("p_partkey"), col("p_name"),
      k = 2, q = 4)
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q_join_bcast" -> joinBcast,
    "q_join_shuffle" -> joinShuffle,
    "q_join_fuzzy" -> joinFuzzy,

    // Existence probe (mapper Get hit) = left-semi join.
    "q_join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),

    // Existence probe miss (mapper Get miss) = left-anti join.
    "q_join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    // Multi-way star join. Only fixed-cardinality dims carry a broadcast
    // hint (nation=25, region=5 rows at EVERY scale factor); customer grows
    // 150k rows/SF, so its join mode is left to JoinSelection/AQE.
    "q_join_multi" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))),

    // Non-equi range join (reducer residual predicate), written NAIVELY:
    // the injected BandedRangeJoinRule (graft.plans) rewrites this
    // constant-width BETWEEN into a banded equi-join on floor(value/50)
    // with the predicate as a residual — a shuffled hash/sort-merge join,
    // never the BroadcastNestedLoopJoin this would otherwise plan as
    // (|part|×|supplier| pair evaluations, quadratic at scale). The plan
    // shape is pinned by PlanSpec and BandedRangeJoinRuleSpec.
    "q_join_range" -> ((s, d) =>
      Tables.part(s, d)
        .join(Tables.supplier(s, d),
          col("p_retailprice").between(col("s_acctbal"), col("s_acctbal") + 50.0))
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_parts"),
          round(min(col("p_retailprice")), 2).as("min_price"),
          round(max(col("p_retailprice")), 2).as("max_price"))),

    // Full outer join: both unmatched sides survive with nulls — the
    // tagged-union reduce-side pattern's outer variant.
    "q_join_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") <= 100)
        .select(col("c_custkey"), col("c_name"))
        .join(
          Tables.orders(s, d)
            .filter(col("o_orderkey") <= 400)
            .groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("n_orders")),
          col("c_custkey") === col("o_custkey"), "full_outer")),

    "q_join_asof" -> joinAsof,

    // Nearest-direction as-of: backward or forward click, whichever is
    // closer in exact µs (ties backward) — two linear window passes.
    "q_join_asof_near" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      GraftOps.asofJoinNearest(
        quotes = ev.filter(col("event_type") === "click"),
        trades = ev.filter(col("event_type") === "purchase"),
        key = "user_id", ts = "ts", tradeId = "event_id")
    }),

    // As-of with a staleness bound (pandas merge_asof tolerance): the
    // same linear union+window pass; matches older than 30 minutes null
    // out AFTER the window — sound because the as-of match is the latest
    // qualifying candidate (see GraftOps.asofJoin).
    "q_join_asof_tol" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
      GraftOps.asofJoin(
        quotes = ev.filter(col("event_type") === "click"),
        trades = ev.filter(col("event_type") === "purchase"),
        key = "user_id", ts = "ts", tradeId = "event_id",
        tolerance = Some("30 MINUTES"))
    }),

    // Runtime-filter semi-join: a distributed Bloom bitmap built from the
    // urgent-order key set prunes lineitem BEFORE the exact semi-join
    // ([[GraftOps.bloomSemiJoin]]) — the "dim key set too big to
    // broadcast raw, bitmap fits anywhere" regime. The oracle is the
    // plain IN-subquery: a single false NEGATIVE (a true match the
    // bitmap drops) fails the hash, so the gate proves the filter only
    // ever over-approximates.
    "q_join_bloom" -> ((s, d) =>
      GraftOps.bloomSemiJoin(
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice")),
        col("l_orderkey"),
        Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("o_orderkey"))),

    // Skew-salted shuffle join: the supplier key space is tiny relative
    // to lineitem (10 suppliers per SF unit vs 600k lines), so a plain
    // shuffle join lands each supplier's ENTIRE fact slice on one task —
    // the reducer-hotspot pattern. Salting splits every supplier into
    // SaltBuckets sub-keys: the dim side replicates ×SaltBuckets (dim is
    // tiny, replication is free), the fact side derives a deterministic
    // salt from its own primary key, and the join runs on (key, salt) —
    // each hot key now spreads over SaltBuckets tasks. AQE's skew-join
    // split solves the same problem adaptively; the salt is the
    // structural form that also works mid-pipeline where AQE cannot
    // re-split (e.g. under a cached or checkpointed subtree). The salt
    // never reaches the output: the post-join aggregate re-merges on the
    // real key, and partial aggregation makes that second shuffle
    // key-sized.
    "q_join_salted" -> ((s, d) => {
      val SaltBuckets = 8
      val dim = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"))
        .withColumn("salt",
          explode(array((0 until SaltBuckets).map(lit(_)): _*)))
      val fact = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
            lit(SaltBuckets)).cast("int").as("salt"))
      fact.join(dim,
          fact("l_suppkey") === dim("s_suppkey") && fact("salt") === dim("salt"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
    })
  )

  val oracle = Map(
    // Brute force on purpose: every length-banded pair gets a real
    // levenshtein, so any pair the Spark-side q-gram blocking loses
    // fails the hash (the losslessness proof). The planted copies use
    // the identical substring surgery on both engines.
    "q_join_fuzzy" ->
      """WITH base AS (
        |  SELECT p_partkey AS id,
        |    p_name || ' ' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 12)
        |      AS s
        |  FROM part),
        |pl AS (
        |  SELECT id + 10000000 AS id,
        |    substr(s, 1, CAST((id // 10) % 7 AS INT))
        |      || substr(s, CAST((id // 10) % 7 AS INT) + 2) AS s
        |  FROM base WHERE id % 10 = 0),
        |n AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
        |f AS (SELECT * FROM n WHERE length(s) >= 12)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS edit_dist
        |FROM f a JOIN f b
        |  ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= 2
        |WHERE levenshtein(a.s, b.s) <= 2""".stripMargin,
    "q_join_bcast" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_shuffle" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_multi" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_join_range" ->
      """SELECT s_suppkey, count(*) AS n_parts,
        |  round(min(p_retailprice), 2) AS min_price,
        |  round(max(p_retailprice), 2) AS max_price
        |FROM part JOIN supplier
        |  ON p_retailprice BETWEEN s_acctbal AND s_acctbal + 50.0
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "q_join_outer" ->
      """SELECT c_custkey, c_name, o_custkey, n_orders
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 100) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders
        |  WHERE o_orderkey <= 400 GROUP BY o_custkey) o
        |ON c_custkey = o_custkey""".stripMargin,
    "q_join_asof" ->
      """SELECT p.event_id, p.user_id,
        |  (SELECT max(c.ts) FROM events c
        |   WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |     AND c.ts <= p.ts) AS asof_ts
        |FROM events p
        |WHERE p.event_type = 'purchase' AND p.user_id IS NOT NULL
        |ORDER BY p.event_id""".stripMargin,
    "q_join_asof_tol" ->
      """SELECT p.event_id, p.user_id,
        |  (SELECT max(c.ts) FROM events c
        |   WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |     AND c.ts <= p.ts
        |     AND c.ts >= p.ts - INTERVAL '30 minutes') AS asof_ts
        |FROM events p
        |WHERE p.event_type = 'purchase' AND p.user_id IS NOT NULL
        |ORDER BY p.event_id""".stripMargin,
    // nearest: exact µs distances, ties to the backward match
    "q_join_asof_near" ->
      """WITH p AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        |m AS (
        |  SELECT p.event_id, p.user_id, p.ts,
        |    (SELECT max(CAST(c.ts AS TIMESTAMP)) FROM events c
        |     WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |       AND CAST(c.ts AS TIMESTAMP) <= p.ts) AS back_ts,
        |    (SELECT min(CAST(c.ts AS TIMESTAMP)) FROM events c
        |     WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |       AND CAST(c.ts AS TIMESTAMP) >= p.ts) AS fwd_ts
        |  FROM p)
        |SELECT event_id, user_id,
        |  CASE WHEN back_ts IS NULL THEN fwd_ts
        |       WHEN fwd_ts IS NULL THEN back_ts
        |       WHEN epoch_us(fwd_ts) - epoch_us(ts)
        |            < epoch_us(ts) - epoch_us(back_ts) THEN fwd_ts
        |       ELSE back_ts END AS asof_ts
        |FROM m ORDER BY event_id""".stripMargin,

    "q_join_bloom" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,

    // The salt must be invisible in the result: the oracle is the PLAIN
    // join + aggregate. Any salt leakage (missed bucket, wrong modulo,
    // dim under-replication) breaks the hash.
    "q_join_salted" ->
      """SELECT s_suppkey, s_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2""".stripMargin
  )
}
