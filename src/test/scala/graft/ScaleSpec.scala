package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** Opt-in scale stress (set GRAFT_SCALE_TEST=1): runs key operators over a
  * synthetic table ~30× the sf0.1 fixture to observe shuffle behavior and
  * correctness at a size where a wrong plan shape (all-pairs, unsalted hot
  * key, full sort) visibly degrades. Skipped by default so the dev loop
  * stays fast.
  *
  *   GRAFT_SCALE_TEST=1 sbt "testOnly graft.ScaleSpec"
  */
class ScaleSpec extends SparkSpec {

  private def enabled = sys.env.get("GRAFT_SCALE_TEST").contains("1")

  /** 20M synthetic (key, qualifier, version, payload) rows, deterministic,
    * with a deliberately hot key 0 (~5% of all rows).
    */
  private lazy val big = {
    import spark.implicits._
    spark.range(0, 20000000L, 1, 32)
      .select(
        when(pmod(col("id"), lit(20L)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(100000L))).as("key"),
        pmod(col("id"), lit(4L)).cast("string").as("qual"),
        col("id").as("version"),
        (col("id") % 1000).cast("double").as("payload"))
  }

  test("latest-version at 20M rows returns one row per (key, qual)") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    val v1 = GraftOps.latestVersion(big, col("key"), col("qual"),
      col("version"), col("version"))
    val keys = big.select(col("key"), col("qual")).distinct().count()
    assert(v1.count() === keys)
  }

  test("salted aggregation handles the hot key at 20M rows") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    val salted = GraftOps.saltedAgg(big, col("key"), col("payload"), salts = 32)
    val hot = salted.filter(col("k") === 0).select(col("n")).collect()
    assert(hot.head.getLong(0) === big.filter(col("key") === 0).count())
  }

  test("degenerate simhash bucket (5k identical docs) streams, never OOMs") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // Worst case for pigeonhole blocking: every doc identical, so all 5k
    // land in the SAME bucket of every block -> the full 12.5M-pair
    // product is the honest answer (one giant duplicate class). The
    // two-step explode keeps peak ROW size O(bucket) (a 5k array, not a
    // 12.5M-struct array) — with the old flattened-pair-array expansion
    // this enumeration OOMed the executor; now it streams and the count
    // is exact. (A LIMIT cannot bound this: the trailing distinct() is an
    // aggregation, so every pair must be enumerated regardless.)
    val n = 5000L
    val clones = spark.range(0, n, 1, 32)
      .select(col("id").as("doc_id"),
        lit("the same exact document body repeated many times over").as("text"))
    val pairs = GraftOps.dedupSimhash(clones, col("doc_id"), col("text"), 3)
    assert(pairs.count() === n * (n - 1) / 2)
  }

  test("clusterPairs closes a 100k-node chain in logarithmic rounds") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // diameter 100k: one-hop propagation would need 100k rounds (and die
    // on the 60-round cap); pointer jumping must finish in ~log2 rounds.
    val n = 100000L
    val chain = spark.range(0, n, 1, 32)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    val cl = GraftOps.clusterPairs(chain)
    assert(cl.filter(col("cluster_id") === 0).count() === n + 1)
    assert(cl.count() === n + 1)
  }

  test("quality/repetition/sampling scan 20M rows linearly") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    val docs = big.select(col("version").as("doc_id"),
      concat_ws(" ", lit("alpha beta gamma delta the a of and"),
        col("qual"), col("payload").cast("string")).as("text"),
      when(col("key") % 2 === 0, lit("en")).otherwise(lit("de")).as("lang"))
    assert(GraftOps.qualityScore(docs, col("doc_id"), col("text")).count() === 20000000L)
    val sampled = GraftOps.sampleStratified(docs.select(col("doc_id"), col("lang")),
      col("doc_id"), when(col("lang") === "en", lit(50)).otherwise(lit(20)))
    val n = sampled.count()
    assert(n > 5000000L && n < 9000000L, s"sampled $n")
  }

  test("exact dedup at 20M rows (hash-groupBy, no content shuffle)") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    val deduped = GraftOps.dedupExact(
      big.select(col("key"), concat_ws("|", col("qual"), col("payload")).as("text"),
        col("version").as("doc_id")),
      col("text"), col("doc_id"))
    assert(deduped.count() ===
      big.select(concat_ws("|", col("qual"), col("payload"))).distinct().count())
  }

  test("substring dedup at 2M docs: dup fraction exact on planted spans") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 2M 12-token docs; every 100th doc ends in the SAME 8-token footer,
    // so exactly those docs carry duplicated 8-token windows. Counting is
    // exact at this size only if the (doc, hash) aggregation holds the
    // shape (no window-string table ever materializes corpus-wide).
    val n = 2000000L
    val docs = spark.range(0, n, 1, 32)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          concat(lit("u"), col("id")), concat(lit("v"), col("id")),
          concat(lit("w"), col("id")), concat(lit("x"), col("id")),
          when(col("id") % 100 === 0,
            lit("the shared footer spans eight whole tokens exactly"))
            .otherwise(concat_ws(" ", concat(lit("p"), col("id")),
              concat(lit("q"), col("id")), concat(lit("r"), col("id")),
              concat(lit("s"), col("id")), concat(lit("t"), col("id")),
              concat(lit("y"), col("id")), concat(lit("z"), col("id")),
              concat(lit("k"), col("id"))))).as("text"))
    val out = GraftOps.dedupSubstrings(docs, col("doc_id"), col("text"),
      window = 8)
    assert(out.count() === n)
    // planted docs: 5 windows each, exactly 1 duplicated (the footer)
    assert(out.filter(col("n_dup_windows") > 0).count() === n / 100)
  }

  test("knn graph at 200k vectors stays cell-bounded") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 200k hash-spread 8-dim vectors (components uniform in [-1, 1] from
    // xxhash64 — NOT a smooth curve: near-parallel vectors would all
    // argmax into one cell and its self-join would become the quadratic
    // hot partition this test exists to rule out). nlist = sqrt(n) ≈ 448
    // keeps each cell's self-join ~450x450; a brute-force shape would be
    // 4x10^10 pairs and would not finish.
    val n = 200000L
    val vecs = spark.range(0, n, 1, 32)
      .select(col("id").as("vec_id"),
        array((0 until 8).map(j =>
          ((pmod(xxhash64(col("id"), lit(j)), lit(2001L)) - 1000L) / 1000.0)
            .cast("float")): _*).as("embedding"))
    val g = GraftOps.knnGraph(vecs, k = 3, nlist = GraftOps.nlistFor(n))
    assert(g.groupBy(col("src_id")).count()
      .agg(max(col("count"))).head().getLong(0) <= 3L)
  }

  test("diversity sampling at 200k vectors returns <= perCell rows per cell") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // same hash-spread corpus as the knn stress; the coreset pass must
    // stay O(n·dim) — one broadcast-argmax assignment + one cell-
    // partitioned window, never a pairwise stage.
    val n = 200000L
    val vecs = spark.range(0, n, 1, 32)
      .select(col("id").as("vec_id"),
        array((0 until 8).map(j =>
          ((pmod(xxhash64(col("id"), lit(j)), lit(2001L)) - 1000L) / 1000.0)
            .cast("float")): _*).as("embedding"))
    val nlist = GraftOps.nlistFor(n)
    val s = GraftOps.diverseSample(vecs, nlist = nlist, perCell = 2)
    val perCell = s.groupBy(col("cell")).count()
    assert(perCell.agg(max(col("count"))).head().getLong(0) <= 2L)
    assert(perCell.count() <= nlist.toLong, "more cells than centroids")
  }

  test("epoch shuffle at 20M docs: balanced range sort, full permutation") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // The scale property of the multiplicative-hash order: the sort key is
    // uniform, so the range partitioner's sampled splits stay balanced —
    // no partition may carry a skewed share of a 20M-row epoch.
    val n = 20000000L
    val docs = spark.range(0, n, 1, 32).select(col("id").as("doc_id"))
    val out = GraftOps.epochShuffle(docs, col("doc_id"), epochs = 1)
    import org.apache.spark.sql.functions.spark_partition_id
    val parts = out.select(spark_partition_id().as("p"))
      .groupBy(col("p")).count().collect()
    assert(parts.map(_.getLong(1)).sum === n, "every doc exactly once")
    val mx = parts.map(_.getLong(1)).max
    assert(mx < (n / parts.length) * 3,
      s"range partitions skewed: max=$mx over ${parts.length} partitions")
  }

  test("groupQuantiles on one 20M-row group: no value buffer, exact result") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // the shape Spark's Percentile aggregate cannot survive: ALL 20M rows
    // in a single group. The distribution walk reduces them to 1000
    // distinct (grp, x) rows before any window; a per-group value buffer
    // would hold 20M doubles in one aggregation buffer. payload is
    // id % 1000 over a multiple of 1000 rows — each value appears exactly
    // 20000 times, so the quartiles are knowable in closed form: q1 sits
    // at 0-based pos (n-1)/4 = 4999999.75, bracketed by positions 4999999
    // (value 249) and 5000000 (value 250) -> 249.75; likewise 499.5 and
    // 749.25 for the median and q3.
    val q = GraftOps.groupQuantiles(big.select(lit(1).as("g"),
        col("payload")), col("g"), col("payload"),
        Seq(("q1", 1, 4), ("med", 2, 4), ("q3", 3, 4)))
      .collect().head
    assert(q.getDouble(1) === 249.75)
    assert(q.getDouble(2) === 499.5)
    assert(q.getDouble(3) === 749.25)
  }

  test("fuzzyJoin at 220k serial names: blocking finds every planted twin") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 200k 16-hex serials + 20k one-char-deleted twins — the ER shape at
    // the scale where an all-pairs plan (24G comparisons) is impossible.
    // q=5 keeps the rare-first prefix inside the 16^5 gram space
    // (~2.4 names/bucket), so candidates stay ~linear in n.
    import spark.implicits._
    val n = 200000L
    val serials = spark.range(0, n, 1, 32)
      .select(col("id"), substring(md5(col("id").cast("string")), 1, 16).as("s"))
    val planted = serials.filter(col("id") % 10 === 0)
      .select((col("id") + 10000000L).as("id"),
        expr("concat(substring(s, 1, CAST(id % 13 AS INT) + 1), " +
          "substring(s, CAST(id % 13 AS INT) + 3))").as("s"))
    val out = GraftOps.fuzzyJoin(serials.unionAll(planted),
        col("id"), col("s"), k = 2, q = 5)
      .collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until n by 10L).map(i => (i, i + 10000000L)).toSet
    assert((expected -- pairs).isEmpty,
      s"blocking lost ${(expected -- pairs).size} planted twins")
    // random 16-hex serials sit far apart in edit space: beyond the
    // planted twins only hash-collision accidents may appear, and barely
    assert(out.length - expected.size <= 20,
      s"unexpectedly dense corpus: ${out.length} pairs")
  }

  test("splitLeakage at 1M docs: 100k planted classes, class-keyed straddle 0") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 500k docs in 100k five-copy duplicate classes + 500k singletons;
    // the audit must count exactly the planted classes, find real
    // doc-keyed leakage, and prove the class-keyed split co-assigns
    // every member — at a scale where the signature pass and the
    // sig-key shuffle dominate, not fixture noise.
    import spark.implicits._
    val dups = spark.range(0, 500000L, 1, 32)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 8).map { i =>
          substring(md5(concat(lit("c"), expr("id div 5"))),
            i * 4 + 1, 4)
        }: _*).as("text"))
    val singles = spark.range(1000000L, 1500000L, 1, 32)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 8).map { i =>
          substring(md5(concat(lit("u"), col("id").cast("string"))),
            i * 4 + 1, 4)
        }: _*).as("text"))
    val r = GraftOps.splitLeakage(dups.unionAll(singles),
      col("doc_id"), col("text")).head
    assert(r.getLong(0) === 100000L,
      s"expected the 100k planted classes, got ${r.getLong(0)}")
    assert(r.getLong(2) === 0L,
      "class-keyed assignment must co-assign every member at scale")
    // with 5 members per class and a 50/25/25 split, ~94% of classes
    // straddle under doc-keying — require the leakage signal is LOUD
    assert(r.getLong(1) > 80000L,
      s"doc-keyed straddle implausibly low: ${r.getLong(1)}")
  }

  test("klDrift at 2M docs: exact totals, biased source surfaces on top") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 2M 10-token docs over 20 sources; source 0 draws from a narrow
    // 4-term vocabulary, the rest from 1000 terms — its KL must
    // dominate, totals must be exact, and KL must be non-negative
    // everywhere (it is a divergence).
    import spark.implicits._
    val docs = spark.range(0, 2000000L, 1, 32)
      .select(concat(lit("s"), pmod(col("id"), lit(20L))).as("source"),
        concat_ws(" ", (0 until 10).map { i =>
          when(pmod(col("id"), lit(20L)) === 0,
            concat(lit("n"), pmod(xxhash64(col("id") + lit(i * 7)), lit(4L))))
            .otherwise(
              concat(lit("t"), pmod(xxhash64(col("id") + lit(i * 7)),
                lit(1000L))))
        }: _*).as("text"))
    val rows = GraftOps.klDrift(docs, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3)))).toMap
    assert(rows.size === 20)
    assert(rows.values.map(_._1).sum === 20000000L,
      "token totals must be exact at scale")
    assert(rows.values.forall(_._2 >= -1e-9),
      "KL is a divergence - never negative")
    val top = rows.maxBy(_._2._2)
    assert(top._1 === "s0",
      s"the narrow-vocabulary source must dominate the drift: $rows")
  }

  test("containmentJoin at 110k docs: prefix probes skip the shared-tail bucket") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 100k distinct 10-token docs + 10k planted supersets (doc text + a
    // 14-token tail SHARED by every superset). The shared tail is the
    // "the"-bucket hazard: its shingles have df = 10k, and a blocking
    // scheme that probed them would generate 10k² candidates. The
    // rarest-first prefix never touches them (a superset's 3-shingle
    // prefix is its unique head shingles, df ≈ 2), so candidates stay
    // linear and the answer is EXACTLY the planted directional pairs.
    import spark.implicits._
    val n = 100000L
    val base = spark.range(0, n, 1, 32)
      .select(col("id"), concat_ws(" ", (0 until 10).map { i =>
        substring(concat(md5(col("id").cast("string")),
          md5(concat(col("id").cast("string"), lit("b")))),
          i * 6 + 1, 6)
      }: _*).as("text"))
    val tail = (0 until 14).map(i => s"zz$i").mkString(" ", " ", "")
    val planted = base.filter(col("id") % 10 === 0)
      .select((col("id") + 10000000L).as("id"),
        concat(col("text"), lit(tail)).as("text"))
    val out = GraftOps.containmentJoin(base.unionAll(planted),
        col("id"), col("text"), threshold = 0.9)
      .collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until n by 10L).map(i => (i, i + 10000000L)).toSet
    assert((expected -- pairs).isEmpty,
      s"containment blocking lost ${(expected -- pairs).size} planted pairs")
    assert(pairs === expected,
      s"beyond the ${expected.size} planted pairs got ${pairs.size} — " +
        "either false pairs or the shared-tail bucket leaked into candidates")
    // every planted row must carry the Jaccard-missed flag: that relation
    // is the operator's reason to exist
    assert(out.forall(_.getInt(4) == 1),
      "planted superset pairs must sit below the 0.8 Jaccard line")
  }

  test("pageRank over a 1M-edge hub graph: bounded mass, hub out-ranks") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 500k spokes all bi-linked to 8 hubs (~1M directed edges, max
    // in-degree 500k): each iteration must stay one equi-join + one hash
    // agg with partial aggregation absorbing the hub's in-edge skew —
    // the shape that survives a 100-TB web graph. initMass is scaled to
    // the documented Long.Max/(100·n) overflow bound.
    import spark.implicits._
    val n = 500000L
    val m0 = 100000000L // 1e8: n·m0·85 ~ 4e15 << Long.Max
    val spokes = spark.range(0, n, 1, 32)
      .select(concat(lit("v"), col("id").cast("string")).as("spoke"),
        concat(lit("h"), pmod(col("id"), lit(8L)).cast("string")).as("hub"))
    val edges = spokes.select(col("spoke").as("src"), col("hub").as("dst"))
      .unionAll(spokes.select(col("hub").as("src"), col("spoke").as("dst")))
    val mass = GraftOps.pageRank(edges, iters = 3, initMass = m0)
    val rows = mass.collect()
    assert(rows.length === n + 8, "every node ranked exactly once")
    val (hubs, leaves) = rows.partition(_.getString(0).startsWith("h"))
    val minHub = hubs.map(_.getLong(1)).min
    val maxLeaf = leaves.map(_.getLong(1)).max
    assert(minHub > maxLeaf, "hubs must out-rank all spokes")
    // floors only shrink mass; teleport is the floor lower bound
    assert(rows.map(_.getLong(1)).sum <= (n + 8) * m0)
    assert(rows.forall(_.getLong(1) >= m0 * 15L / 100L))
  }

  test("hits over the 1M-edge hub graph: flat plan, hubs dominate") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // same 500k-spoke / 8-hub bipartite shape, DIRECTED spoke->hub: the
    // per-half-step localCheckpoint must keep the plan flat at any iters
    // (the exponential-plan regression this operator shipped with), and
    // the hub side's 62.5k in-degree skew lands on partial aggregation.
    import spark.implicits._
    val n = 500000L
    val edges = spark.range(0, n, 1, 32)
      .select(concat(lit("v"), col("id").cast("string")).as("src"),
        concat(lit("h"), pmod(col("id"), lit(8L)).cast("string")).as("dst"))
    val out = GraftOps.hits(edges, iters = 3, scale = 1000000L).collect()
    val (auths, hubs) = out.partition(_.getString(1) == "auth")
    assert(hubs.length === n && auths.length === 8)
    // uniform spokes -> every authority rescales to ~scale, every hub
    // equal; max pinned exactly at scale by the integer rescale
    assert(auths.map(_.getLong(2)).max === 1000000L)
    assert(hubs.map(_.getLong(2)).max === 1000000L)
  }

  test("kcore at 1M edges peels spokes, keeps the clique core") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 500k degree-1 spokes hanging off a 16-node clique (deg 15 + spokes):
    // k=8 must peel every spoke in round 1 and keep exactly the clique
    // with its internal degree 15 — the survivor-set re-filter must not
    // resurrect or drop anyone at skewed degree (~31k spokes per node).
    import spark.implicits._
    val n = 500000L
    val clique = (0 until 16).flatMap(i => (0 until 16).collect {
      case j if i != j => (s"c$i", s"c$j") }).toDF("src", "dst")
    val spokes = spark.range(0, n, 1, 32)
      .select(concat(lit("v"), col("id").cast("string")).as("spoke"),
        concat(lit("c"), pmod(col("id"), lit(16L)).cast("string")).as("core"))
    val edges = clique
      .unionAll(spokes.select(col("spoke").as("src"), col("core").as("dst")))
      .unionAll(spokes.select(col("core").as("src"), col("spoke").as("dst")))
    val out = GraftOps.kcorePeel(edges, k = 8, rounds = 2).collect()
    assert(out.length === 16, s"expected the clique, got ${out.length}")
    assert(out.forall(_.getLong(1) === 15L), "within-core degree = 15")
  }

  test("winnow at 2M docs: one window pass, density ~ 2/(w+1)") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 2M ~40-gram docs with distinct token streams: fingerprints per doc
    // must land near the winnowing expectation (2/(w+1) of grams for
    // random hashes, here w=4 -> ~0.4) and never exceed 1.0 — a blowup
    // would mean the ragged-tail frames multiplied selections.
    val docs = spark.range(0, 2000000L, 1, 32)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 42).map(i =>
          concat(lit(s"w$i"), pmod(col("id") * (i + 1), lit(9973L)))): _*)
          .as("text"))
    val fp = GraftOps.winnowFingerprints(docs, col("doc_id"), col("text"))
    val stats = fp.agg(count(lit(1)).as("n"), avg(col("fp_density")).as("d"),
      max(col("fp_density")).as("mx")).head()
    assert(stats.getLong(0) === 2000000L)
    assert(stats.getDouble(2) <= 1.0)
    val d = stats.getDouble(1)
    assert(d > 0.25 && d < 0.6, s"mean density $d outside winnowing range")
  }

  test("triangleCounts: a 500k-degree hub contributes ZERO wedges") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // hub 0 linked to every spoke, plus 100k planted spoke pairs — the
    // naive wedge join would fan the hub into 1.25e11 pairs; the degree
    // orientation gives the hub out-degree 0, so the whole run costs
    // ~100k wedges. Completing inside the suite budget IS the proof.
    import spark.implicits._
    val n = 500000L
    val hubEdges = spark.range(1, n + 1, 1, 32)
      .select(lit(0L).as("a"), col("id").as("b"))
    val pairEdges = spark.range(0, 100000L, 1, 32)
      .select((col("id") * 2 + 1).as("a"), (col("id") * 2 + 2).as("b"))
    val tri = GraftOps.triangleCounts(hubEdges.unionAll(pairEdges))
    val rows = tri.collect()
    assert(rows.length === 200001, "hub + both members of each pair")
    val byNode = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byNode(0L) === 100000L, "hub closes every planted pair")
    assert(byNode.view.filterKeys(_ != 0L).values.forall(_ == 1L),
      "each pair member sits in exactly one triangle")
  }

  test("labelPropagate floods 8 star components at 1M edges in one round each") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 500k spokes bi-linked to 8 hubs ('h' < 'v' lexicographically, so
    // the hub label is each component's minimum): after round 1 every
    // spoke must carry its hub's label — per-round cost is one
    // node-sized frontier shuffle against the pre-partitioned edge cache
    import spark.implicits._
    val n = 500000L
    val spokes = spark.range(0, n, 1, 32)
      .select(concat(lit("v"), col("id").cast("string")).as("spoke"),
        concat(lit("h"), pmod(col("id"), lit(8L)).cast("string")).as("hub"))
    val edges = spokes.select(col("spoke").as("src"), col("hub").as("dst"))
      .unionAll(spokes.select(col("hub").as("src"), col("spoke").as("dst")))
    val lab = GraftOps.labelPropagate(edges, rounds = 2)
    val perLabel = lab.groupBy(col("lab")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLabel.keySet === (0 until 8).map(i => s"h$i").toSet)
    assert(perLabel.values.sum === n + 8)
    assert(perLabel.values.forall(_ === n / 8 + 1))
  }

  test("bloom semi/anti at 2M facts x 200k dim keys: exact, probe-local") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // dim = every third key in [0, 600k); fact keys uniform over the same
    // range -> ~1/3 match. The bitmap probe is a per-row local forall
    // against one broadcast array (2^22 bits / 200k keys ~ 0.1% fpp);
    // correctness = exact equality with the plain semi/anti join at a
    // size where a false negative or an unrescued false positive would
    // hit thousands of rows.
    import spark.implicits._
    val fact = spark.range(0, 2000000L, 1, 32)
      .select(pmod(xxhash64(col("id")), lit(600000L)).as("fk"))
    val dim = spark.range(0, 600000L, 3, 32).select(col("id").as("dk"))
    val semi = GraftOps.bloomSemiJoin(fact, col("fk"), dim, col("dk"),
      numBits = 1 << 22, numHashes = 5)
    val anti = GraftOps.bloomAntiJoin(fact, col("fk"), dim, col("dk"),
      numBits = 1 << 22, numHashes = 5)
    val nSemi = semi.count()
    val nAnti = anti.count()
    assert(nSemi === fact.join(dim, col("fk") === col("dk"), "left_semi").count())
    assert(nAnti === fact.count() - nSemi, "semi + anti must partition fact")
  }

  test("bfs/sssp over the 1M-edge hub graph settle in 2 rounds, exact") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // hub-and-spoke: from hub h0, distance 1 = its spokes (every 8th),
    // distance 2 = everything else (spoke -> another hub via round 2?
    // no — spokes link only to their own hub, so h0's spokes are at 1,
    // other hubs unreachable, their spokes too). Exact partition counts
    // prove frontier propagation didn't drop or duplicate nodes.
    import spark.implicits._
    val n = 500000L
    val spokes = spark.range(0, n, 1, 32)
      .select(concat(lit("v"), col("id").cast("string")).as("spoke"),
        concat(lit("h"), pmod(col("id"), lit(8L)).cast("string")).as("hub"))
    val edges = spokes.select(col("spoke").as("src"), col("hub").as("dst"))
      .unionAll(spokes.select(col("hub").as("src"), col("spoke").as("dst")))
    val dist = GraftOps.bfsDistances(edges,
      edges.select(col("src").as("node")).filter(col("node") === "h0"),
      rounds = 3)
    val byDist = dist.groupBy(col("dist")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDist === Map(0L -> 1L, 1L -> n / 8), s"got $byDist")
  }

  test("pq at 200k vectors: code-sized index, ADC never touches a vector") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 200k 64-dim vectors -> 1.6M (vec, sub, code) int rows; the ADC
    // scan joins codes against a 512-entry broadcast LUT — shuffle is
    // integer partial sums only, independent of dim
    val vecs = spark.range(0, 200000L, 1, 32)
      .select(col("id").as("vec_id"), expr(
        "transform(sequence(0, 63), j -> cast(pmod(xxhash64(id, j), 1000) / 10.0 as float))")
        .as("embedding"))
    val codes = GraftOps.pqEncode(vecs, m = 8, subDim = 8, ksub = 16)
    val stats = codes.agg(count(lit(1)).as("n"),
      min(col("code")).as("lo"), max(col("code")).as("hi")).head()
    assert(stats.getLong(0) === 1600000L)
    assert(stats.getLong(1) >= 0L && stats.getLong(2) < 16L)
    val hits = GraftOps.pqSearch(vecs, vecs.filter(col("vec_id") < 4), k = 5,
      m = 8, subDim = 8, ksub = 16).collect()
    assert(hits.length === 20)
    assert(hits.forall(_.getLong(2) >= 0L), "ADC distances are non-negative")
  }

  test("bootstrapCi at 2M rows x 16 replicas brackets the true mean tightly") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // value = id % 1000 -> true mean 499.5, bootstrap SE ~ sd/sqrt(n) =
    // 288.7/1414 ~ 0.2; the order-statistic band must bracket the truth
    // within ~1 — the 32M exploded rows flow through map-side partial
    // aggregation into a 16-row state per group
    val rows = spark.range(0, 2000000L, 1, 32)
      .select(lit("g").as("grp"), col("id"), (col("id") % 1000).as("x"))
    val ci = GraftOps.bootstrapCi(rows, col("grp"), col("id"), col("x"),
      reps = 16).collect().head
    val (est, lo, hi) = (ci.getDouble(1), ci.getDouble(2), ci.getDouble(3))
    assert(est === 499.5)
    assert(lo <= 499.5 && 499.5 <= hi, s"band [$lo, $hi] misses the mean")
    assert(hi - lo < 2.0, s"band [$lo, $hi] implausibly wide")
  }

  test("dsir at 2M docs: bounded bin table, selection separates slices") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // target docs draw from one vocabulary, raw from a disjoint one ->
    // every target doc must score positive. The model stays 1024 rows no
    // matter the corpus size; scoring is a broadcast join per scan.
    val docs = spark.range(0, 2000000L, 1, 32)
      .select(col("id").as("doc_id"), (col("id") % 4 === 0).as("tgt"),
        when(col("id") % 4 === 0,
          concat_ws(" ", lit("clean prose sentence"),
            pmod(col("id"), lit(997L)).cast("string")))
          .otherwise(concat_ws(" ", lit("spam junk noise"),
            pmod(col("id"), lit(991L)).cast("string"))).as("text"))
    val scored = GraftOps.dsirWeights(docs, col("doc_id"), col("text"),
      col("tgt"))
    val wrong = scored.join(docs.select(col("doc_id"), col("tgt")), "doc_id")
      .filter(col("tgt") =!= (col("selected") === 1)).count()
    assert(wrong === 0L,
      s"$wrong docs mis-selected despite disjoint vocabularies")
  }

  test("bpeTrain at 2M tokens / 100k vocab: bounded rounds, monotone counts") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 2M corpus tokens over a 100k-word hex vocabulary (md5 chars are
    // 0-9a-f — no delimiter collision). Per-round cost must stay
    // vocabulary-bounded: 4 rounds over 2M rows completing at test speed
    // is itself the check that no per-round stage rescans pair work at
    // corpus rather than vocab size.
    val docs = spark.range(0, 2000000L, 1, 32)
      .select(substring(md5(pmod(col("id"), lit(100000L)).cast("string")),
        1, 6).as("text"))
    val merges = GraftOps.bpeTrain(docs, col("text"), rounds = 4)
      .collect().sortBy(_.getLong(0))
    assert(merges.length === 4)
    val counts = merges.map(_.getLong(3))
    assert(counts.forall(_ > 0L))
    // greedy BPE law: merging can only shrink or preserve any pair's
    // count, so the per-round maximum is non-increasing
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"greedy max must be non-increasing: ${counts.mkString(",")}")
  }

  test("asofJoinNearest at 10M rows with a hot key: linear, exact on plants") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 9M quotes / 1M trades over 10k keys, key 0 hot (~10% of rows) —
    // the union+window shape must stay one shuffle per side with no
    // range join; correctness spot-checked on a planted exact-match key
    val n = 10000000L
    val base = spark.range(0, n, 1, 32)
      .select(
        when(pmod(col("id"), lit(10L)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(10000L))).as("k"),
        expr("timestamp_micros(id * 1000)").as("ts"),
        col("id").as("event_id"),
        (col("id") % 10 =!= 9).as("is_quote"))
    val quotes = base.filter(col("is_quote"))
    val trades = base.filter(!col("is_quote"))
    val out = GraftOps.asofJoinNearest(quotes, trades, "k", "ts", "event_id")
    assert(out.count() === trades.count(),
      "every trade must emit exactly one nearest match")
    // nearest is never NULL here: every key has quotes on both sides of
    // almost every trade; sample-verify the no-loss property
    val nulls = out.filter(col("asof_ts").isNull).count()
    assert(nulls === 0L, s"$nulls trades lost their match")
  }

  test("naiveBayes at 2M docs / bounded vocab: one count shuffle trains it") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // two disjoint-vocabulary classes -> training on 2M rows must
    // recover a perfect classifier; the model table stays vocab-bounded
    val docs = spark.range(0, 2000000L, 1, 32)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, lit("alpha")).otherwise(lit("beta"))
          .as("lbl"),
        when(col("id") % 2 === 0,
          concat_ws(" ", lit("clean prose text"),
            pmod(col("id"), lit(997L)).cast("string")))
          .otherwise(concat_ws(" ", lit("spam junk noise"),
            pmod(col("id"), lit(991L)).cast("string"))).as("text"))
    val wrong = GraftOps.naiveBayes(docs, col("doc_id"), col("text"),
        col("lbl"))
      .filter(col("correct") === 0).count()
    assert(wrong === 0L,
      s"$wrong docs misclassified despite disjoint vocabularies")
  }

  test("skyline at 5M rows x 100 brands: frontier is small and non-dominated") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    import org.apache.spark.sql.expressions.Window
    // independent uniform dims -> expected frontier ~ ln(n) per brand;
    // the operator's output must be brute-verifiable against itself
    // (pairwise non-domination) and against a corpus sample
    val rows = spark.range(0, 5000000L, 1, 32)
      .select(col("id").as("p_partkey"),
        pmod(col("id"), lit(100L)).cast("string").as("p_brand"),
        pmod(xxhash64(col("id")), lit(1000000L)).as("price_cents"),
        pmod(xxhash64(col("id"), lit(7L)), lit(10000L)).as("size"))
    val perPrice = rows.groupBy(col("p_brand"), col("price_cents"))
      .agg(max(col("size")).as("best_size"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("price_cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = rows.join(
        perPrice.withColumn("cheaper_best", max(col("best_size")).over(w))
          .select(col("p_brand"), col("price_cents"), col("cheaper_best")),
        Seq("p_brand", "price_cents"))
      .filter(col("cheaper_best").isNull ||
        col("cheaper_best") <= col("size"))
      .select(col("p_brand"), col("p_partkey"), col("price_cents"),
        col("size"))
    val f = frontier.collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(f.length < 100000, s"frontier implausibly large: ${f.length}")
    // pairwise: no frontier row strictly dominates another
    val byBrand = f.groupBy(_._1)
    byBrand.values.foreach { g =>
      g.foreach { case (b, pc, sz) =>
        assert(!g.exists { case (_, pc2, sz2) => pc2 < pc && sz2 > sz },
          s"dominated row survived in brand $b")
      }
    }
    // sample check: no corpus row strictly dominates any frontier row
    val sample = rows.filter(pmod(col("p_partkey"), lit(499L)) === 0)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val sByBrand = sample.groupBy(_._1)
    byBrand.foreach { case (b, g) =>
      val s = sByBrand.getOrElse(b, Array.empty[(String, Long, Long)])
      g.foreach { case (_, pc, sz) =>
        assert(!s.exists { case (_, pc2, sz2) => pc2 < pc && sz2 > sz },
          s"sampled corpus row dominates a frontier row in brand $b")
      }
    }
  }

  test("basketPairs: a 500k-item whale basket is capped out, pairs exact") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // Basket 0 holds 500k distinct items — uncapped, its collect_set
    // buffer is one ~10MB row and its expansion is 1.25e11 pairs (this
    // test would not finish). The MaxBasketSize degree pre-filter drops
    // it BEFORE any array is built, so the run costs only the 100k
    // normal 2-item baskets: 100 surviving pairs with exact post-filter
    // support/lift statistics.
    val whale = spark.range(0, 500000L, 1, 32)
      .select(lit(0L).as("basket"),
        concat(lit("i"), col("id").cast("string")).as("item"))
    val normal = spark.range(1, 100001L, 1, 32)
      .select(col("id").as("basket"),
        concat(lit("x"), pmod(col("id"), lit(100L)).cast("string")).as("item"))
      .unionAll(spark.range(1, 100001L, 1, 32)
        .select(col("id").as("basket"),
          concat(lit("y"), pmod(col("id"), lit(100L)).cast("string"))
            .as("item")))
    val out = GraftOps.basketPairs(whale.unionAll(normal)).collect()
    assert(out.length === 100, s"expected 100 pairs, got ${out.length}")
    out.foreach { r =>
      assert(!r.getString(0).startsWith("i") && !r.getString(1).startsWith("i"),
        "whale item leaked into the pair projection")
      assert(r.getLong(2) === 1000L, s"support off: $r")
      assert(r.getLong(3) === 1000L && r.getLong(4) === 1000L,
        s"post-filter item counts off: $r")
      assert(r.getDouble(5) === 100.0, s"lift off: $r")
    }
  }

  test("dedupBySignature at 2M docs: one keeper per signature class, no pair stage") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 200k signature classes x 10 members. The point of the signature
    // form is that this costs one map-side pass + doc-keyed shuffles —
    // no candidate pair expansion exists to blow up, unlike the banded
    // path where 10-member classes mean 45 pairs each (9M pairs total).
    // Every token carries the class id: with NO cross-class shingles the
    // only way classes merge is a genuine 16x42-bit hash collision. (A
    // scaffold fixture sharing half its shingles across classes DOES
    // merge a few per 200k — the documented shared-shingle-dominance
    // precision caveat of signature equality, P=(1/2)^perms per class.)
    val cls = pmod(col("id"), lit(200000L)).cast("string")
    val docs = spark.range(0, 2000000L, 1, 32)
      .select(col("id").as("doc_id"),
        concat(lit("a"), cls, lit(" b"), cls, lit(" c"), cls,
          lit(" d"), cls).as("text"))
    val out = GraftOps.dedupBySignature(docs, col("doc_id"), col("text"))
      .persist()
    assert(out.count() === 2000000L)
    assert(out.filter(col("keep") === 1).count() === 200000L)
    // min-keeper election: the keeper of doc d is d % 200000 exactly
    assert(out.filter(col("keeper_id") =!= pmod(col("doc_id"), lit(200000L)))
      .count() === 0L)
    out.unpersist()
  }

  test("winnowFingerprints at 100M grams stays map-side (no shuffle to grow)") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 200k docs x 500 tokens: the exploded form shuffled AND sorted all
    // ~100M gram rows; the winnow_sels expression makes this a pure
    // projection, so volume only scales the map pass. Invariants: one
    // row per doc, exact n_grams (len - gramN + 1), density in (0, 1].
    val doc = (0 until 500).map(i => s"w${i % 37}w").mkString(" ")
    val out = GraftOps.winnowFingerprints(
        spark.range(0, 200000L, 1, 32)
          .select(col("id").as("doc_id"), lit(doc).as("text")),
        col("doc_id"), col("text"))
      .persist()
    assert(out.count() === 200000L)
    assert(out.filter(col("n_grams") =!= 498L).count() === 0L)
    assert(out.filter(col("fp_density") <= 0.0 || col("fp_density") > 1.0)
      .count() === 0L)
    out.unpersist()
  }

  test("recursive CTE past the 1M-row default: session config lifts the cap") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // The round-9 sf1 rehearsal caught q_sql_recursive dying with
    // RECURSION_ROW_LIMIT_EXCEEDED: Spark's 1M TOTAL-ROW default scales
    // with input size, so any linear-in-n recursion fails the moment the
    // data grows. Sessions.build lifts the row cap and keeps the LEVEL
    // limit (depth here is <= 20 digit divisions of a Long). 150k
    // anchors x ~11 levels = ~1.8M rows — over the default cap.
    spark.range(150000)
      .select((col("id") + 8999999999L).as("k"))
      .createOrReplaceTempView("rc_keys")
    val n = spark.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT k AS cur, 0 AS depth FROM rc_keys
        |  UNION ALL
        |  SELECT cur div 10, depth + 1 FROM chain WHERE cur > 0
        |) SELECT count(*) FROM chain""".stripMargin).head.getLong(0)
    assert(n > 1000000L,
      "the recursion must complete past the 1M-row default cap")
  }

  test("topKNeighbors bounds a 100k-node dense projection to n·k output") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // 100 clusters × 1000 nodes, every within-cluster pair scored: the
    // full pair table is ~50M rows — collecting or serving it is the
    // scale-killer the top-k companion exists for; the truncated output
    // is exactly n·k. Scores depend only on index distance, so each
    // node's best neighbors are its nearest indices (tie-broken by id).
    import spark.implicits._
    val m = 1000L
    val nodes = spark.range(0, 100000L, 1, 32)
      .select(col("id"), (col("id") / m).cast("long").as("cl"),
        pmod(col("id"), lit(m)).as("ix"))
    val pairs = nodes.as("a")
      .join(nodes.as("b"), col("a.cl") === col("b.cl")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("sa"), col("b.id").as("sb"),
        lit(7L).as("common"),
        (lit(1000000L) - (col("b.ix") - col("a.ix"))).as("jac_ppm"))
    val top = GraftOps.topKNeighbors(pairs, 3)
    assert(top.count() === 300000L,
      "every node must emit exactly k rows, never the full pair fan-out")
    // node 0 (cluster edge): nearest indices ascending, ties impossible
    val n0 = top.filter(col("node") === 0L).orderBy(col("rk"))
      .select(col("nbr")).collect().map(_.getLong(0)).toSeq
    assert(n0 === Seq(1L, 2L, 3L))
    // an interior node: distance-1 neighbors tie at the top score and
    // break by the lower id, then the next distance's lower id
    val n500 = top.filter(col("node") === 500L).orderBy(col("rk"))
      .select(col("nbr")).collect().map(_.getLong(0)).toSeq
    assert(n500 === Seq(499L, 501L, 498L),
      "rank must follow jac desc with the nbr-asc tie-break")
  }

  test("weighted median at 20M rows x 3 groups: ranged walk, exact crossings") {
    assume(enabled, "set GRAFT_SCALE_TEST=1 to run")
    // The shape the two-phase ranged walk exists for: a huge distribution
    // under a HANDFUL of groups, where a Window.partitionBy(grp) walk
    // serializes each group into one task. Weights are constructed so the
    // exact crossing is hand-computable: within each group g (ids ≡ g mod
    // 3), value v = id div 3 carries weight 1, except v = 1000 carries
    // weight equal to everything else combined plus one — the lower
    // weighted median of every group is exactly 1000.0.
    import spark.implicits._
    val n = 20000000L
    val perGroup = n / 3
    val dist = spark.range(0, n, 1, 32).select(
      pmod(col("id"), lit(3L)).cast("string").as("g"),
      (col("id") / 3).cast("long").cast("double").as("v"),
      when((col("id") / 3).cast("long") === 1000L, lit(perGroup + 1))
        .otherwise(lit(1L)).as("w"))
    val got = GraftOps.weightedMedian(dist, col("g"), col("v"), col("w"),
        parallelWalk = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("0" -> 1000.0, "1" -> 1000.0, "2" -> 1000.0))
    // the parallelWalk quantile path agrees with the windowed walk on a
    // group this size (median position = perGroup div 2 within unit
    // weights when the whale value is excluded)
    val uni = dist.filter(col("v") =!= 1000.0)
    val win = GraftOps.groupMedian(uni, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val par = GraftOps.groupMedian(uni, col("g"), col("v"),
      parallelWalk = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(par === win, "parallel and windowed medians diverged at 20M")
  }
}
