package graft.ops

import graft.{QueryPack, Tables}
import graft.api.GraftOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relationship tables (SURVEY.md §2 extension
  * surface, alongside the connected-components path x_dedup_cluster).
  *
  * The fixture graph is the customer↔supplier trade network: an
  * undirected edge wherever a customer's order contains a supplier's
  * lineitem. PageRank over it answers "which entities sit at the center
  * of the trade flow" — same iterate-join-aggregate shape a 100-TB web
  * or citation graph needs, with exact integer mass so the DuckDB
  * oracle (three unrolled iteration CTEs) replays every floor
  * bit-for-bit.
  */
object GraphQueries extends QueryPack {

  private val Iters = 3
  private val InitMass = 1000000000000L // 1e12: safe to ~1e5 nodes (doc'd bound)

  /** Distinct directed customer→supplier trade pairs; node ids are
    * prefixed so the customer and supplier key spaces cannot collide.
    * The distinct runs on the raw INTEGER key pair and the string ids
    * are built after it: the dedup shuffle then carries 16 bytes per
    * row instead of two materialized strings (measured ~6.6s → ~2.5s
    * for the derivation at sf0.1).
    */
  /** The raw (custkey, suppkey) distinct pair set, cacheOnce'd on the
    * INTEGER keys: every graph query shares this one materialization
    * (pagerank/hits/kcore/label_prop/bfs via tradeEdges, q_common_nbrs
    * directly) — the join+distinct measured ~2.5s at sf0.1, the dominant
    * cost of each query paying it separately. Caching before the string
    * projection keeps ONE cache entry for both consumers (the string
    * concat is a cheap map on top) instead of two plans caching the same
    * logical data twice.
    */
  private def rawTradePairs(s: SparkSession, d: String): DataFrame =
    GraftOps.cacheOnce(Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
      .distinct())

  private def tradePairs(s: SparkSession, d: String): DataFrame =
    rawTradePairs(s, d)
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("cust"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("supp"))

  /** Symmetrized (bidirectional) form of [[tradePairs]] for PageRank. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val pairs = tradePairs(s, d)
    pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q_pagerank" -> ((s, d) =>
      GraftOps.pageRank(tradeEdges(s, d), Iters, InitMass)),

    // HITS keeps the trade graph DIRECTED (cust→supp): hubs are the
    // customers whose baskets touch the most central suppliers,
    // authorities the suppliers those hubs concentrate on — the natural
    // reading of a bipartite graph that PageRank had to symmetrize away.
    "q_hits" -> ((s, d) =>
      GraftOps.hits(tradePairs(s, d)
        .select(col("cust").as("src"), col("supp").as("dst")),
        iters = 2, scale = 1000000L)),

    // k-core peeling on the symmetrized graph (src-degree = full degree):
    // 3 rounds, k=5 — strips thin traders; survivors keep their
    // within-core degree.
    "q_kcore" -> ((s, d) =>
      GraftOps.kcorePeel(tradeEdges(s, d), k = 5, rounds = 3)),

    // Triangle counting runs on the supplier CO-PURCHASE projection
    // (suppliers sharing an order) — the bipartite trade graph itself is
    // triangle-free by construction, the projection is the classic
    // "communities of suppliers bought together" graph.
    "q_triangles" -> ((s, d) =>
      GraftOps.triangleCounts(coPurchasePairs(s, d))),

    // Bounded min-label propagation on the symmetrized trade graph:
    // 3 rounds — every node ≤3 hops from its component minimum adopts
    // it. The fixpoint is connected components (x_dedup_cluster's
    // pointer-jumping path); the bounded form is exactly replayable.
    "q_label_prop" -> ((s, d) =>
      GraftOps.labelPropagate(tradeEdges(s, d), rounds = 3)),

    // Bounded multi-round BFS hop distances from supplier node s1 over
    // the symmetrized trade graph ([[GraftOps.bfsDistances]], 3 rounds):
    // round 1 reaches s1's customers, round 2 every supplier sharing one
    // of them, round 3 the bulk of the customer side — a nontrivial
    // distance spectrum whose oracle unrolls each round as a min-merge
    // CTE (the q_pagerank discipline).
    // Seed is a LITERAL one-row source (not filtered from the edge
    // table): the oracle's d0 seeds ('s1', 0) unconditionally, so an
    // edge-derived seed would diverge on a fixture where s1 trades
    // nothing (engine empty vs oracle's lone seed row).
    "q_bfs" -> ((s, d) => {
      import s.implicits._
      GraftOps.bfsDistances(tradeEdges(s, d),
        Seq("s1").toDF("node"), rounds = 3)
    }),

    // Weighted shortest paths (bounded Bellman–Ford, 3 rounds) from s1:
    // edge cost 1 + 100 div n_trades, so high-volume relationships are
    // cheap to traverse — "how commercially close is every entity to
    // supplier 1". Exact integer weights keep every round's min-merge
    // bit-replayable in the unrolled oracle.
    "q_sssp" -> ((s, d) => {
      val wp = GraftOps.cacheOnce(Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("l_suppkey"), col("o_orderkey"))
        .distinct()
        .groupBy(col("o_custkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("nt"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("cust"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("supp"),
          expr("1 + 100 div nt").as("w")))
      val edges = wp.select(col("cust").as("src"), col("supp").as("dst"), col("w"))
        .unionAll(wp.select(col("supp").as("src"), col("cust").as("dst"), col("w")))
      import s.implicits._
      GraftOps.ssspDistances(edges, Seq("s1").toDF("node"), rounds = 3)
    }),

    // Node similarity by common neighbors (link prediction): supplier
    // pairs scored by exact Jaccard over their customer sets —
    // |N(a)∩N(b)| counted via a customer-ANCHORED self-join of the
    // CACHED capped edge set (never a supplier×supplier join: the join
    // key is the customer, so per-anchor probe work is bounded by the
    // cap², the same Σdeg² the array expansion paid). The join form
    // replaced the collect_set + posexplode + suffix-slice expansion:
    // identical pair stream, but the hash-join probe is codegen'd while
    // the slice form copies O(deg²) array elements per anchor through
    // two interpreted Generates — measured 4.1s -> 2.4s warm at sf0.1.
    // Caching e is what makes the two plan references safe (the
    // basketPairs doc records the uncached-self-join cold-path trap).
    // |N(a)∪N(b)| comes from the degree table by inclusion-exclusion,
    // similarity as an exact ppm integer.
    // Hub cap (GraftOps.capAnchors, per-call size = the global default):
    // customers touching more distinct suppliers than the cap are dropped
    // BEFORE the pair expansion — a whale anchor is Σdeg² of
    // projection-artifact pairs. capAnchors also observe()-meters how
    // many anchors the cap excluded. The degree table is computed from
    // the SAME capped edge set so inclusion-exclusion stays exact, and
    // the oracle replays the identical HAVING filter (interpolated from
    // the same constant).
    "q_common_nbrs" -> commonNbrPairs,

    // Bounded-output companion: the full pair table is inherently
    // Θ(pairs) — on a dense projection that is ~n²/2 rows no matter how
    // well the plan shuffles (499,500 at sf0.1's 1000 suppliers; a
    // scale-killer as OUTPUT at 100× nodes). Per-node top-k keeps the
    // same expansion + scoring shuffle but truncates to n·k rows via a
    // rank window — Spark's WindowGroupLimit pushes the limit into a
    // partial top-k BEFORE the node shuffle, so the truncation rides
    // the same exchange instead of adding one. Deterministic tie-break
    // on the neighbor id. ScaleSpec stresses it at 100k nodes where
    // materializing the full pair table would be infeasible.
    "q_common_nbrs_topk" -> ((s, d) =>
      GraftOps.topKNeighbors(commonNbrPairs(s, d), NbrTopK))
  )

  /** Per-node truncation size for q_common_nbrs_topk — single-sourced
    * into the oracle like [[MinCommon]].
    */
  private val NbrTopK = 5

  private def commonNbrPairs(s: SparkSession, d: String): DataFrame = {
    val e0 = rawTradePairs(s, d)
      .select(col("o_custkey").as("c"), col("l_suppkey").as("v"))
    val e = GraftOps.cacheOnce(
      GraftOps.capAnchors(e0, "c", "v", GraftOps.MaxBasketSize))
    val deg = e.groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val common = e.select(col("c"), col("v").as("sa"))
      .join(e.select(col("c"), col("v").as("sb")), Seq("c"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("common"))
      // same observability treatment as the hub cap: the MinCommon
      // floor's effect is metered, never silent
      .observe(s"graft_min:common:$MinCommon",
        count(lit(1)).as("total_pairs"),
        count(when(col("common") >= MinCommon, lit(1))).as("kept_pairs"))
      .filter(col("common") >= MinCommon)
    // Persist the thresholded pair table: it is the expensive leg (the
    // Σdeg² expansion + pair aggregate — ~100 MB of shuffle at sf0.1),
    // it feeds both q_common_nbrs and q_common_nbrs_topk, and without
    // the cache the expansion subtree was observed materializing twice
    // per action on the warm path (the deg broadcast legs re-deriving
    // it). Post-MinCommon the table is pair-bounded like the query's
    // own output, so the cache is no bigger than what the query already
    // materializes.
    GraftOps.cacheOnce(common)
      .join(deg.select(col("v").as("sa"), col("deg").as("da")), "sa")
      .join(deg.select(col("v").as("sb"), col("deg").as("db")), "sb")
      .select(col("sa"), col("sb"), col("common"),
        expr("common * 1000000 div (da + db - common)").as("jac_ppm"))
  }

  /** Supplier pairs co-occurring in ≥ MinSupport distinct orders,
    * id-canonical (`a < b`) — the projection of the bipartite
    * order↔supplier graph onto suppliers, thresholded the way real
    * basket projections are: a single shared order between two of 1000
    * suppliers is noise (at sf0.1 the unthresholded projection is a
    * near-complete K₁₀₀₀ whose ~1.7e8 triangles are an artifact of the
    * projection, not signal — and 20s of bench time). The self-join
    * fans out Σ sizeᵢ² over order baskets before the support count;
    * basket sizes are bounded (≤7 lines in TPC-H shape), so the
    * expansion is linear in lineitem — the same bounded-group contract
    * q_basket documents.
    */
  private val MinSupport = 3

  /** Common-neighbor floor for the q_common_nbrs pair table: pairs
    * sharing fewer than this many customers are projection noise. ONE
    * definition site — the query filter, its observe() metric name, and
    * the oracle's HAVING all interpolate from here (the MaxBasketSize
    * discipline), so engine and oracle can never desync on the
    * threshold.
    */
  private val MinCommon = 5

  private def coPurchasePairs(s: SparkSession, d: String): DataFrame = {
    // basketPairs' map-side expansion shape, not a lineitem self-join:
    // ONE shuffle builds each order's sorted supplier set (collect_set
    // dedups in the agg buffer; baskets are bounded), pairs expand
    // map-side via posexplode + suffix slice — the self-equi-join form
    // references the scan subtree twice and was the measured 6x
    // regression basketPairs' doc records
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("items"))
      .select(col("items"), posexplode(col("items")).as(Seq("i", "a")))
      .select(col("a"),
        explode(expr("slice(items, i + 2, size(items) - i - 1)")).as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support"))
      // threshold observability, the capAnchors discipline: a production
      // run records how many pairs the support floor dropped instead of
      // silently reshaping the projection; the name derives from the one
      // constant so rebuilt plans stay CacheManager-equal
      .observe(s"graft_min:support:$MinSupport",
        count(lit(1)).as("total_pairs"),
        count(when(col("support") >= MinSupport, lit(1))).as("kept_pairs"))
      .filter(col("support") >= MinSupport)
      .select(col("a"), col("b"))
  }

  val oracle = Map(
    // The oracle unrolls the 3 iterations as chained CTEs with the same
    // integer floors ((x*85)//(outdeg*100), constant teleport), so any
    // divergence in edge derivation, degree, or a single floor fails the
    // hash. sum(BIGINT) is HUGEINT in DuckDB — cast back to BIGINT to
    // match Spark's long (the round-2 HUGEINT lesson).
    "q_pagerank" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cust,
        |    's' || CAST(l_suppkey AS VARCHAR) AS supp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT cust AS src, supp AS dst FROM e0
        |  UNION ALL
        |  SELECT supp AS src, cust AS dst FROM e0),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |m0 AS (
        |  SELECT src AS node, CAST(1000000000000 AS BIGINT) AS mass
        |  FROM deg),
        |m1 AS (
        |  SELECT e.dst AS node,
        |    CAST(150000000000 + sum((m.mass * 85) // (d.outdeg * 100)) AS BIGINT) AS mass
        |  FROM edges e JOIN m0 m ON e.src = m.node JOIN deg d ON e.src = d.src
        |  GROUP BY 1),
        |m2 AS (
        |  SELECT e.dst AS node,
        |    CAST(150000000000 + sum((m.mass * 85) // (d.outdeg * 100)) AS BIGINT) AS mass
        |  FROM edges e JOIN m1 m ON e.src = m.node JOIN deg d ON e.src = d.src
        |  GROUP BY 1),
        |m3 AS (
        |  SELECT e.dst AS node,
        |    CAST(150000000000 + sum((m.mass * 85) // (d.outdeg * 100)) AS BIGINT) AS mass
        |  FROM edges e JOIN m2 m ON e.src = m.node JOIN deg d ON e.src = d.src
        |  GROUP BY 1)
        |SELECT node, mass FROM m3""".stripMargin,

    // Two unrolled HITS iterations, each half-step rescaled to 1e6 by
    // integer floor division by the step's max — the same exact-integer
    // replay discipline as q_pagerank. sum(BIGINT) is HUGEINT in DuckDB,
    // cast back before the floor arithmetic.
    "q_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |    's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |h0 AS (SELECT DISTINCT src, CAST(1000000 AS BIGINT) AS hub FROM e),
        |a1r AS (SELECT dst, CAST(sum(hub) AS BIGINT) AS raw
        |  FROM e JOIN h0 USING (src) GROUP BY dst),
        |a1 AS (SELECT dst, CAST((raw * 1000000)
        |    // (SELECT max(raw) FROM a1r) AS BIGINT) AS auth FROM a1r),
        |h1r AS (SELECT src, CAST(sum(auth) AS BIGINT) AS raw
        |  FROM e JOIN a1 USING (dst) GROUP BY src),
        |h1 AS (SELECT src, CAST((raw * 1000000)
        |    // (SELECT max(raw) FROM h1r) AS BIGINT) AS hub FROM h1r),
        |a2r AS (SELECT dst, CAST(sum(hub) AS BIGINT) AS raw
        |  FROM e JOIN h1 USING (src) GROUP BY dst),
        |a2 AS (SELECT dst, CAST((raw * 1000000)
        |    // (SELECT max(raw) FROM a2r) AS BIGINT) AS auth FROM a2r),
        |h2r AS (SELECT src, CAST(sum(auth) AS BIGINT) AS raw
        |  FROM e JOIN a2 USING (dst) GROUP BY src),
        |h2 AS (SELECT src, CAST((raw * 1000000)
        |    // (SELECT max(raw) FROM h2r) AS BIGINT) AS hub FROM h2r)
        |SELECT src AS node, 'hub' AS kind, hub AS score FROM h2
        |UNION ALL
        |SELECT dst AS node, 'auth' AS kind, auth AS score FROM a2""".stripMargin,

    // Three unrolled peel rounds: degree >= 5 survivor set, edges
    // restricted to survivor×survivor, re-derive.
    "q_kcore" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cust,
        |    's' || CAST(l_suppkey AS VARCHAR) AS supp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT cust AS src, supp AS dst FROM e0
        |  UNION ALL
        |  SELECT supp AS src, cust AS dst FROM e0),
        |k1 AS (SELECT src FROM (
        |  SELECT src, count(*) AS deg FROM edges GROUP BY 1) WHERE deg >= 5),
        |e1 AS (SELECT e.src, e.dst FROM edges e
        |  JOIN k1 a ON e.src = a.src JOIN k1 b ON e.dst = b.src),
        |k2 AS (SELECT src FROM (
        |  SELECT src, count(*) AS deg FROM e1 GROUP BY 1) WHERE deg >= 5),
        |e2 AS (SELECT e.src, e.dst FROM e1 e
        |  JOIN k2 a ON e.src = a.src JOIN k2 b ON e.dst = b.src),
        |k3 AS (SELECT src FROM (
        |  SELECT src, count(*) AS deg FROM e2 GROUP BY 1) WHERE deg >= 5),
        |e3 AS (SELECT e.src, e.dst FROM e2 e
        |  JOIN k3 a ON e.src = a.src JOIN k3 b ON e.dst = b.src)
        |SELECT src AS node, count(*) AS core_deg FROM e3 GROUP BY 1""".stripMargin,

    // The oracle enumerates each triangle once as an id-ordered triple
    // (x < y < z): wedge from the smallest corner, closing edge between
    // the two tips. The engine enumerates from the lowest-DEGREE corner
    // instead (the O(m^1.5) orientation) — a different representative
    // tuple per triangle, but the same triangle SET, so the per-node
    // explode/count agrees exactly.
    "q_triangles" ->
      s"""WITH pairs0 AS (
        |  SELECT DISTINCT a.l_orderkey AS ok, a.l_suppkey AS s1, b.l_suppkey AS s2
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
        |pairs AS (
        |  SELECT s1, s2 FROM pairs0 GROUP BY 1, 2 HAVING count(*) >= $MinSupport),
        |tri AS (
        |  SELECT p1.s1 AS x, p1.s2 AS y, p2.s2 AS z
        |  FROM pairs p1
        |  JOIN pairs p2 ON p2.s1 = p1.s1 AND p1.s2 < p2.s2
        |  JOIN pairs p3 ON p3.s1 = p1.s2 AND p3.s2 = p2.s2)
        |SELECT node, count(*) AS tri_cnt FROM (
        |  SELECT x AS node FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri)
        |GROUP BY 1""".stripMargin,

    // Three unrolled min-label rounds: neighbor-min per node, folded
    // with the node's own label via least/coalesce — same shape as the
    // engine's round. String min is binary collation in both engines.
    "q_label_prop" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cust,
        |    's' || CAST(l_suppkey AS VARCHAR) AS supp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT cust AS src, supp AS dst FROM e0
        |  UNION ALL
        |  SELECT supp AS src, cust AS dst FROM e0),
        |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
        |n1 AS (SELECT e.dst AS node, min(l.lab) AS nlab
        |  FROM edges e JOIN l0 l ON e.src = l.node GROUP BY 1),
        |l1 AS (SELECT l.node, least(l.lab, coalesce(n.nlab, l.lab)) AS lab
        |  FROM l0 l LEFT JOIN n1 n ON l.node = n.node),
        |n2 AS (SELECT e.dst AS node, min(l.lab) AS nlab
        |  FROM edges e JOIN l1 l ON e.src = l.node GROUP BY 1),
        |l2 AS (SELECT l.node, least(l.lab, coalesce(n.nlab, l.lab)) AS lab
        |  FROM l1 l LEFT JOIN n2 n ON l.node = n.node),
        |n3 AS (SELECT e.dst AS node, min(l.lab) AS nlab
        |  FROM edges e JOIN l2 l ON e.src = l.node GROUP BY 1),
        |l3 AS (SELECT l.node, least(l.lab, coalesce(n.nlab, l.lab)) AS lab
        |  FROM l2 l LEFT JOIN n3 n ON l.node = n.node)
        |SELECT node, lab FROM l3""".stripMargin,

    // Exact-integer Jaccard replay: common via the id-ordered pair
    // count, union by inclusion-exclusion, ppm by integer floor div.
    // The HAVING filter replays the engine's hub cap exactly.
    "q_common_nbrs" ->
      s"""WITH e0 AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |keep AS (SELECT c FROM e0 GROUP BY 1 HAVING count(*) <= ${GraftOps.MaxBasketSize}),
        |e AS (SELECT e0.* FROM e0 JOIN keep USING (c)),
        |deg AS (SELECT v, count(*) AS d FROM e GROUP BY 1),
        |pairs AS (
        |  SELECT a.v AS sa, b.v AS sb, count(*) AS common
        |  FROM e a JOIN e b ON a.c = b.c AND a.v < b.v
        |  GROUP BY 1, 2 HAVING count(*) >= $MinCommon)
        |SELECT sa, sb, common,
        |  CAST(common * 1000000 // (da.d + db.d - common) AS BIGINT)
        |    AS jac_ppm
        |FROM pairs
        |JOIN deg da ON sa = da.v
        |JOIN deg db ON sb = db.v""".stripMargin,

    // Same pair derivation, then the per-node rank truncation: both
    // MinCommon and NbrTopK interpolate from the engine's constants,
    // and the ORDER BY replays the deterministic nbr-id tie-break.
    "q_common_nbrs_topk" ->
      s"""WITH e0 AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |keep AS (SELECT c FROM e0 GROUP BY 1 HAVING count(*) <= ${GraftOps.MaxBasketSize}),
        |e AS (SELECT e0.* FROM e0 JOIN keep USING (c)),
        |deg AS (SELECT v, count(*) AS d FROM e GROUP BY 1),
        |pairs AS (
        |  SELECT a.v AS sa, b.v AS sb, count(*) AS common
        |  FROM e a JOIN e b ON a.c = b.c AND a.v < b.v
        |  GROUP BY 1, 2 HAVING count(*) >= $MinCommon),
        |scored AS (
        |  SELECT sa, sb, common,
        |    CAST(common * 1000000 // (da.d + db.d - common) AS BIGINT)
        |      AS jac_ppm
        |  FROM pairs
        |  JOIN deg da ON sa = da.v
        |  JOIN deg db ON sb = db.v),
        |sym AS (
        |  SELECT sa AS node, sb AS nbr, common, jac_ppm FROM scored
        |  UNION ALL
        |  SELECT sb AS node, sa AS nbr, common, jac_ppm FROM scored),
        |ranked AS (
        |  SELECT node, nbr, common, jac_ppm,
        |    row_number() OVER (PARTITION BY node
        |      ORDER BY jac_ppm DESC, nbr) AS rk
        |  FROM sym)
        |SELECT node, nbr, common, jac_ppm, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= $NbrTopK""".stripMargin,

    // Three unrolled BFS rounds: each d_r is the min-merge of d_{r-1}
    // with every neighbor's d_{r-1}+1 — identical to the engine's
    // frontier form round-by-round (distances only decrease, so a
    // settled node re-propagating adds nothing).
    "q_bfs" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cust,
        |    's' || CAST(l_suppkey AS VARCHAR) AS supp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (
        |  SELECT cust AS src, supp AS dst FROM e0
        |  UNION ALL
        |  SELECT supp AS src, cust AS dst FROM e0),
        |d0 AS (SELECT 's1' AS node, CAST(0 AS BIGINT) AS dist),
        |d1 AS (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d0
        |  UNION ALL
        |  SELECT e.dst, d.dist + 1 FROM edges e JOIN d0 d ON e.src = d.node)
        |  GROUP BY 1),
        |d2 AS (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d1
        |  UNION ALL
        |  SELECT e.dst, d.dist + 1 FROM edges e JOIN d1 d ON e.src = d.node)
        |  GROUP BY 1),
        |d3 AS (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d2
        |  UNION ALL
        |  SELECT e.dst, d.dist + 1 FROM edges e JOIN d2 d ON e.src = d.node)
        |  GROUP BY 1)
        |SELECT node, CAST(dist AS BIGINT) AS dist FROM d3""".stripMargin,

    // Three unrolled Bellman–Ford rounds over the volume-weighted trade
    // graph — min-merge of d_{r-1} with neighbor + w, integer weights.
    "q_sssp" ->
      """WITH wp AS (
        |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS cust,
        |    's' || CAST(l_suppkey AS VARCHAR) AS supp,
        |    1 + 100 // count(*) AS w
        |  FROM (SELECT DISTINCT o_custkey, l_suppkey, o_orderkey
        |        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT cust AS src, supp AS dst, w FROM wp
        |  UNION ALL
        |  SELECT supp AS src, cust AS dst, w FROM wp),
        |d0 AS (SELECT 's1' AS node, CAST(0 AS BIGINT) AS dist),
        |d1 AS (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d0
        |  UNION ALL
        |  SELECT e.dst, d.dist + e.w FROM edges e JOIN d0 d ON e.src = d.node)
        |  GROUP BY 1),
        |d2 AS (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d1
        |  UNION ALL
        |  SELECT e.dst, d.dist + e.w FROM edges e JOIN d1 d ON e.src = d.node)
        |  GROUP BY 1),
        |d3 AS (SELECT node, min(dist) AS dist FROM (
        |  SELECT node, dist FROM d2
        |  UNION ALL
        |  SELECT e.dst, d.dist + e.w FROM edges e JOIN d2 d ON e.src = d.node)
        |  GROUP BY 1)
        |SELECT node, CAST(dist AS BIGINT) AS dist FROM d3""".stripMargin
  )
}
