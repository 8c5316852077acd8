package graft

import graft.api.GraftOps
import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.functions._

/** Semantic checks on the LLM-pipeline tier that the hash gate cannot
  * express: LSH candidate generation must agree with the brute-force
  * definition, dedup must be idempotent, ANN results must be true
  * neighbors.
  */
class LlmOpsSpec extends SparkSpec {

  test("x_dedup_near equals brute-force all-pairs Jaccard >= 0.8") {
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), TextFns.shingles3(col("w")).as("shingles"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.shingles"), col("b.shingles")))
          .cast("double")
          / size(array_union(col("a.shingles"), col("b.shingles"))))
          .as("j_raw"))
      .filter(col("j_raw") >= 0.8) // threshold pre-rounding, like dedupNear
      .select(col("doc_a"), col("doc_b"), round(col("j_raw"), 6).as("jaccard"))
    val lsh = ops.LlmQueries.dedupNear(spark, sf)
    // LSH recall on this corpus must be total (16 perms / 8 bands / j>=0.8
    // => miss probability < 1e-3 per pair), and precision is exact by
    // construction (candidates are Jaccard-verified).
    assert(lsh.except(brute).isEmpty, "LSH produced a non-duplicate pair")
    assert(brute.except(lsh).isEmpty, "LSH missed a duplicate pair")
  }

  test("x_dedup_ngram prefix filter is lossless (equals all-pairs join)") {
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), TextFns.shingles3(col("w")).as("shingles"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.shingles"), col("b.shingles")))
          .cast("double")
          / size(array_union(col("a.shingles"), col("b.shingles"))))
          .as("j_raw"))
      .filter(col("j_raw") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("j_raw"), 6).as("jaccard"))
    val exact = ops.LlmQueries.dedupNgram(spark, sf)
    // unlike MinHash, the prefix-filtered join is EXACT: equality both
    // ways, no probabilistic recall argument needed
    assert(exact.except(brute).isEmpty, "prefix join produced a false pair")
    assert(brute.except(exact).isEmpty, "prefix filter lost a pair")
  }

  test("containmentJoin prefix filter is lossless and catches Jaccard misses") {
    import graft.api.GraftOps
    import spark.implicits._
    // hand corpus: doc 2 = doc 1 + tail (full containment, low Jaccard),
    // docs 3/4 byte-identical (mutual containment), doc 5 unrelated
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau"),
      (3L, "red green blue cyan magenta"),
      (4L, "red green blue cyan magenta"),
      (5L, "one two three four five")).toDF("doc_id", "text")
    val out = GraftOps.containmentJoin(docs, col("doc_id"), col("text"), 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    // doc 1 (3 shingles) inside doc 2 (17): containment 1.0,
    // jaccard = 3/17 = 176470 ppm -> the Jaccard-missed flag fires
    assert(out((1L, 2L)) === ((1000000L, 176470L, 1)))
    // byte-identical docs: mutual containment, jaccard 1.0, flag off
    assert(out((3L, 4L)) === ((1000000L, 1000000L, 0)))
    assert(out((4L, 3L)) === ((1000000L, 1000000L, 0)))
    // nothing else: no false pairs, and the big doc is NOT "contained"
    // in the small one (direction matters)
    assert(out.size === 3, s"unexpected pairs: ${out.keySet}")
    // losslessness on the fixture corpus: equals brute-force containment
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), TextFns.shingles3(col("w")).as("shingles"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_contained"),
        col("b.doc_id").as("doc_container"),
        size(array_intersect(col("a.shingles"), col("b.shingles")))
          .cast("bigint").as("i"),
        size(col("a.shingles")).cast("bigint").as("na"))
      .filter(col("i") * 1000000L >= col("na") * 900000L)
      .select(col("doc_contained"), col("doc_container"))
    val got = GraftOps.containmentJoin(Tables.documents(spark, sf),
        col("doc_id"), col("text"), 0.9)
      .select(col("doc_contained"), col("doc_container"))
    assert(got.except(brute).isEmpty, "containment join emitted a false pair")
    assert(brute.except(got).isEmpty, "containment prefix filter lost a pair")
  }

  test("containmentJoin equals brute force on seeded random corpora") {
    import graft.api.GraftOps
    import spark.implicits._
    // randomized losslessness at several densities: small vocabularies
    // force heavy shingle sharing (the adversarial case for blocking),
    // large ones scatter; prefixes must lose nothing either way
    for (seed <- Seq(7, 23); vocab <- Seq(6, 40)) {
      val rnd = new scala.util.Random(seed * 1000 + vocab)
      val docs = (0 until 50).map { i =>
        val n = 3 + rnd.nextInt(12)
        (i.toLong, (0 until n).map(_ => "w" + rnd.nextInt(vocab)).mkString(" "))
      }.toDF("doc_id", "text")
      val sh = docs
        .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), TextFns.shingles3(col("w")).as("s"))
      val brute = sh.as("a").join(sh.as("b"),
          col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("doc_contained"),
          col("b.doc_id").as("doc_container"),
          size(array_intersect(col("a.s"), col("b.s")))
            .cast("bigint").as("i"),
          size(col("a.s")).cast("bigint").as("na"))
        .filter(col("i") * 1000000L >= col("na") * 900000L)
        .select(col("doc_contained"), col("doc_container"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = GraftOps.containmentJoin(docs, col("doc_id"), col("text"), 0.9)
        .select(col("doc_contained"), col("doc_container"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === brute,
        s"seed=$seed vocab=$vocab: blocking diverged from brute force " +
          s"(missing ${brute -- got}, extra ${got -- brute})")
    }
  }

  test("x_dedup_simhash pigeonhole blocking is lossless") {
    import graft.api.GraftOps
    val docs = Tables.documents(spark, sf)
    // maxHamming=59 => 60 one-bit blocks: any pair agreeing on ANY bit is
    // a candidate, i.e. brute force for every pair that is not an exact
    // 60-bit complement — in particular for every pair at hamming<=3.
    val brute = GraftOps.dedupSimhash(docs, col("doc_id"), col("text"),
      maxHamming = 59).filter(col("hamming") <= 3)
    val blocked = GraftOps.dedupSimhash(docs, col("doc_id"), col("text"),
      maxHamming = 3)
    assert(blocked.except(brute).isEmpty, "blocked found a phantom pair")
    assert(brute.except(blocked).isEmpty, "4-block pigeonhole lost a pair")
    // invariants of the reported pairs: canonical orientation, hamming in
    // range, and the corpus's near-identical docs are actually found
    val rows = blocked.collect()
    assert(rows.nonEmpty, "simhash found nothing on a dup-rich corpus")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)), "pair not a<b")
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 3),
      "hamming outside the radius")
  }

  test("x_dedup_cluster equals a union-find transitive closure") {
    import graft.api.GraftOps
    val pairs = GraftOps.dedupNear(Tables.documents(spark, sf),
      col("doc_id"), col("text"))
    // reference closure: plain union-find over the collected pairs (test
    // scale only — the operator itself never collects)
    val es = pairs.select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
    val got = GraftOps.clusterPairs(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.map(g => g._1 -> g._2).toMap === expected)
    val bySize = expected.groupBy(_._2).view.mapValues(_.size).toMap
    got.foreach { case (doc, cl, sz, canon) =>
      assert(sz === bySize(cl), s"wrong size for cluster $cl")
      assert(canon === (if (doc == cl) 1 else 0))
    }
  }

  test("clusterPairs equals union-find on seeded random graphs") {
    import graft.api.GraftOps
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      // ~60 nodes, ~80 random edges: several components of mixed size,
      // cycles, and dangling chains in one graph
      val es = Seq.fill(80)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val got = GraftOps.clusterPairs(es.toDF("doc_a", "doc_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial: ${es.size} edges")
    }
  }

  test("clusterPairs resolves a long chain (pointer jumping, not one-hop)") {
    import graft.api.GraftOps
    import spark.implicits._
    // a 40-link chain has diameter 40: one-hop min propagation would need
    // 40 rounds, pointer jumping must close it within the 60-round cap
    // (and in ~log2(40) effective rounds)
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cl = GraftOps.clusterPairs(chain).collect()
    assert(cl.length === 41)
    assert(cl.forall(_.getLong(1) == 0L), "chain must collapse to one cluster")
    assert(cl.forall(_.getLong(2) == 41L))
    assert(cl.count(_.getInt(3) == 1) === 1)
  }

  test("x_decontam overlap counts match a brute array_intersect recompute") {
    import graft.api.GraftOps
    val docs = Tables.documents(spark, sf)
    val got = GraftOps.decontaminate(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      col("doc_id"), col("text"))
    val sh = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), TextFns.shingles3(col("w")).as("shingles"))
    val benchSet = sh.filter(col("doc_id") % 10 === 0)
      .select(explode(col("shingles")).as("s")).distinct()
      .collect().map(_.getString(0)).toSet
    val expected = sh.filter(col("doc_id") % 10 =!= 0)
      .collect().map { r =>
        val shingles = r.getSeq[String](1)
        r.getLong(0) -> (shingles.size.toLong,
          shingles.count(benchSet.contains).toLong)
      }.toMap
    val rows = got.collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (n, shared) = expected(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === shared)
      assert(r.getInt(4) === (if (shared * 2 >= n) 1 else 0))
    }
  }

  test("chunkSentences: greedy packing, chunk-atomic overshoot, lossless tokens") {
    import spark.implicits._
    // budget 3: "a b"(2) and "c d e"(3) share chunk 0 (the 3-token
    // sentence STARTS at offset 2 < 3, so it rides along — overshoot to
    // 5), "f g" starts at offset 5 -> chunk 1
    val docs = Seq((1L, "a b. c d e. f g")).toDF("doc_id", "text")
    val got = GraftOps.chunkSentences(docs, col("doc_id"), col("text"),
        budget = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((0L, 2L, 5L), (1L, 1L, 2L)))
    // lossless on the fixture: chunk token totals equal the sentence-
    // split recompute — no sentence lost or double-assigned
    val fixture = Tables.documents(spark, sf)
    val chunked = GraftOps.chunkSentences(fixture, col("doc_id"),
        col("text"), budget = 64)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    val direct = fixture
      .select(explode(split(col("text"), "\\. ")).as("sent"))
      .select(size(graft.functions.TextFns.tokens(col("sent"))).as("nt"))
      .filter(col("nt") > 0).agg(sum(col("nt"))).head.getLong(0)
    assert(chunked === direct)
  }

  test("x_chunk: windows tile every token with the declared overlap") {
    import graft.api.GraftOps
    val docs = Tables.documents(spark, sf)
    val chunks = GraftOps.chunkDocs(docs, col("doc_id"), col("text"),
      chunkSize = 64, stride = 48).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    val toks = docs.select(col("doc_id"),
        size(TextFns.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.foreach { case (doc, cs) =>
      val n = toks(doc)
      assert(cs.length === (n - 1) / 48 + 1, s"chunk count for doc $doc")
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(2) === i * 48L) // start = idx * stride
        assert(c.getLong(3) === math.min(64L, n - i * 48L)) // ragged tail
      }
      // consecutive full chunks overlap by exactly chunkSize - stride = 16
      cs.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(b.getLong(2) - a.getLong(2) === 48L)
      }
    }
    assert(toks.keySet === chunks.keySet)
  }

  test("x_pack: packs tile each shard's chunk stream exactly") {
    import graft.api.GraftOps
    val chunks = GraftOps.chunkDocs(Tables.documents(spark, sf),
      col("doc_id"), col("text"), chunkSize = 64, stride = 48)
    val packs = GraftOps.packChunks(chunks, budget = 256, shards = 8).collect()
    // brute recompute: running offsets per shard in plain Scala, with the
    // same md5-derived shard key the operator uses
    def shardOf(docId: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % 8
    }
    val byShard = chunks.collect()
      .map(r => (shardOf(r.getLong(0)), r.getLong(0), r.getLong(1), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3))).toMap
    val expected = byShard.toSeq.flatMap { case (shard, cs) =>
      var off = 0L
      cs.map { case (_, _, _, n) =>
        val pack = off / 256; off += n; (shard, pack) -> n
      }
    }.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    assert(packs.length === expected.size)
    packs.foreach { r =>
      val (nc, nt) = expected((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) === nc && r.getLong(3) === nt)
      // HALF_UP to match Spark's round() (math.rint would be half-even)
      assert(r.getDouble(4) === BigDecimal(nt.toDouble / 256)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("x_tfidf: salience ranking matches a brute per-doc recompute") {
    import graft.api.GraftOps
    val docs = Tables.documents(spark, sf)
    val got = GraftOps.termSalience(docs, col("doc_id"), col("text"), k = 3)
      .collect()
    val toks = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val tf = toks.toSeq.flatMap { case (d, ws) =>
      ws.groupBy(identity).map { case (t, g) => (d, t, g.size.toLong) }
    }
    val dfreq = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = tf.groupBy(_._1).view.mapValues { rows =>
      rows.map { case (_, t, c) => (t, c, dfreq(t), c * 1000000L / dfreq(t)) }
        .sortBy { case (t, _, _, s) => (-s, t) }.take(3)
    }.toMap
    got.groupBy(_.getLong(0)).foreach { case (d, rows) =>
      val exp = expected(d)
      rows.sortBy(_.getLong(5)).zip(exp).foreach { case (r, (t, c, df_, s)) =>
        assert(r.getString(1) === t && r.getLong(2) === c)
        assert(r.getLong(3) === df_ && r.getLong(4) === s)
      }
    }
    assert(got.groupBy(_.getLong(0)).keySet === expected.keySet)
  }

  test("exact dedup is idempotent") {
    val once = ops.LlmQueries.dedupExact(spark, sf)
    assert(once.count() ===
      once.select(col("fp")).distinct().count())
  }

  test("ANN results are genuine same-bucket neighbors with true cosine") {
    val n = Tables.embeddings(spark, sf).count()
    val planes = VectorFns.planes(graft.api.GraftOps.planesFor(n), 64)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorFns.toDoubles(col("embedding")).as("v"))
      .withColumn("bucket", VectorFns.bucket(col("v"), planes))
    val ann = ops.LlmQueries.simLsh(spark, sf)
    val checked = ann.alias("r")
      .join(emb.select(col("vec_id").as("probe_id"), col("bucket").as("pb")), "probe_id")
      .join(emb.select(col("vec_id"), col("bucket").as("cb")), "vec_id")
    assert(checked.filter(col("pb") =!= col("cb")).count() === 0,
      "ANN returned a cross-bucket pair")
    assert(ann.groupBy(col("probe_id")).count()
      .filter(col("count") > 3).count() === 0, "more than k per probe")
  }

  test("brute-force top-k: scores are within [-1, 1] and ranked") {
    val res = ops.LlmQueries.simBrute(spark, sf)
    assert(res.filter(abs(col("cos_sim")) > 1.000001).count() === 0)
    // rank order must follow score order within each probe
    val bad = res.alias("a").join(res.alias("b"),
      col("a.probe_id") === col("b.probe_id") &&
        (col("a.rank") < col("b.rank")) &&
        (col("a.cos_sim") < col("b.cos_sim")))
    assert(bad.count() === 0, "rank inversion found")
  }

  test("planesFor scales bucket count with the corpus") {
    import graft.api.GraftOps.planesFor
    // bucket capacity always covers the corpus: 2^p * target >= n
    for (n <- Seq(1L, 100L, 500L, 2000L, 100000L, 2000000L, 10000000000L))
      assert((1L << planesFor(n)) * 64 >= math.min(n, (1L << 30) * 64L))
    assert(planesFor(500) === 3)     // sf0.01 fixture -> 8 buckets
    assert(planesFor(2000) === 5)    // sf0.1 fixture -> 32 buckets
    assert(planesFor(2000000) === 15) // 100x corpus -> 32768 buckets
    // monotone in n: more corpus never means fewer buckets
    val ps = Seq(100L, 1000L, 10000L, 100000L, 1000000L).map(planesFor(_))
    assert(ps === ps.sorted)
    assert(planesFor(1) === 2) // floor: at least 4 buckets
  }

  test("dedupEmbed multi-table OR widens recall, never precision") {
    import graft.api.GraftOps
    val emb = Tables.embeddings(spark, sf)
    val planes = GraftOps.planesFor(emb.count())
    def run(tables: Int) = GraftOps.dedupEmbed(emb, col("vec_id"),
      col("embedding"), planes, dim = 64, threshold = 0.3, tables = tables)
    val one = run(1)
    val three = run(3)
    // every pair any table finds is a TRUE >=threshold pair (precision is
    // exact by construction) ...
    val v = emb.select(col("vec_id"), VectorFns.toDoubles(col("embedding")).as("v"))
    val brute = v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        expr("cosine_sim(a.v, b.v)").as("cs_raw"))
      .filter(col("cs_raw") >= 0.3)
      .select(col("vec_a"), col("vec_b"), round(col("cs_raw"), 6).as("cos_sim"))
    assert(three.except(brute).isEmpty, "a table produced a phantom pair")
    // ... and OR-ing tables only ever ADDS pairs
    assert(one.except(three).isEmpty, "multi-table lost a single-table pair")
    assert(three.count() >= one.count())
  }

  test("IVF top-k: true cosines, ranked, at most k per probe") {
    val res = ops.LlmQueries.simIvf(spark, sf)
    assert(res.groupBy(col("probe_id")).count()
      .filter(col("count") > 3).count() === 0, "more than k per probe")
    // reported score must be the TRUE cosine of the pair (IVF approximates
    // the candidate set, never the metric)
    val v = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorFns.toDoubles(col("embedding")).as("v"))
    val recheck = res
      .join(v.select(col("vec_id").as("probe_id"), col("v").as("pv")), "probe_id")
      .join(v, "vec_id")
      .filter(round(expr("cosine_sim(pv, v)"), 6) =!= col("cos_sim"))
    assert(recheck.count() === 0, "reported cosine is not the true cosine")
    val bad = res.alias("a").join(res.alias("b"),
      col("a.probe_id") === col("b.probe_id") &&
        (col("a.rank") < col("b.rank")) && (col("a.cos_sim") < col("b.cos_sim")))
    assert(bad.count() === 0, "rank inversion found")
  }

  test("kmeansRefine: spherical objective is non-decreasing") {
    import graft.api.GraftOps
    val corpus = Tables.embeddings(spark, sf)
    val emb = corpus
      .select(col("vec_id"), VectorFns.toDoubles(col("embedding")).as("v"))
    val nlist = GraftOps.nlistFor(emb.count())
    val init = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    def objective(cent: org.apache.spark.sql.DataFrame): Double =
      emb.join(broadcast(cent))
        .select(col("vec_id"), expr("cosine_sim(v, cv)").as("cs"))
        .groupBy(col("vec_id")).agg(max(col("cs")).as("best"))
        .agg(sum(col("best"))).head.getDouble(0)
    val o0 = objective(init)
    val c1 = GraftOps.kmeansRefine(corpus, init)
    val o1 = objective(c1)
    val o2 = objective(GraftOps.kmeansRefine(corpus, c1))
    assert(o1 >= o0 - 1e-9, s"round 1 decreased the objective: $o0 -> $o1")
    assert(o2 >= o1 - 1e-9, s"round 2 decreased the objective: $o1 -> $o2")
    assert(c1.count() === init.count(), "refine must keep every cell")
  }

  test("quality score is the exact fraction of gates passed") {
    val q = ops.LlmQueries.quality(spark, sf)
    assert(q.count() > 0)
    // score quantized to quarters; keep <=> all four gates
    assert(q.filter(col("quality_score") * 4 =!=
      round(col("quality_score") * 4, 0)).count() === 0)
    assert(q.filter((col("keep") === 1) =!= (col("quality_score") === 1.0))
      .count() === 0)
    // ratios are ratios
    assert(q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() === 0)
    assert(q.filter(col("sym_ratio") < 0).count() === 0)
    assert(q.filter(col("mean_word_len") <= 0).count() === 0)
  }

  test("repetition stats: exact gram accounting, bounded fractions") {
    val r = ops.LlmQueries.repetition(spark, sf)
    assert(r.count() > 0)
    assert(r.filter(col("top_2gram_frac") <= 0 || col("top_2gram_frac") > 1)
      .count() === 0)
    assert(r.filter(col("dup_2gram_frac") < 0 || col("dup_2gram_frac") > 1)
      .count() === 0)
    assert(r.filter(col("dup_3gram_frac") < 0 || col("dup_3gram_frac") > 1)
      .count() === 0)
    // the most frequent 2-gram is itself duplicated whenever any is
    // (1.99 not 2: the fraction is rounded at 6 decimals before the
    // multiply, so an exact count of 2 can land a hair under 2.0)
    assert(r.filter(col("dup_2gram_frac") > 0 &&
      col("top_2gram_frac") * col("n_2grams") < 1.99).count() === 0)
    // grams preserve duplicates: exactly size(tokens)-1 two-gram slots
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"),
        (size(TextFns.tokens(col("text"))) - 1).cast("long").as("want"))
    assert(r.join(want, "doc_id").filter(col("n_2grams") =!= col("want"))
      .count() === 0)
  }

  test("stratified sample is deterministic, weighted, rate-accurate") {
    val a = ops.LlmQueries.sampleStrat(spark, sf)
    val b = ops.LlmQueries.sampleStrat(spark, sf)
    assert(a.except(b).isEmpty && b.except(a).isEmpty, "sample not reproducible")
    assert(a.filter(col("lang") === "en" && col("weight") =!= 2.0).count() === 0)
    assert(a.filter(col("lang") =!= "en" && col("weight") =!= 5.0).count() === 0)
    val nEn = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    val frac = a.filter(col("lang") === "en").count().toDouble / nEn
    assert(frac > 0.3 && frac < 0.7, s"en sampled fraction $frac far from 50%")
  }

  test("scrubPii redacts exactly the PII spans of a known input") {
    import graft.api.GraftOps
    import spark.implicits._
    val in = Seq(
      (1L, "reach me at jane.doe+spam@mail-host.org or 555-867-5309 soon"),
      (2L, "server 192.168.1.254 logged 3 hits; no pii here otherwise"),
      (3L, "plain text with nothing to scrub at all")
    ).toDF("id", "txt")
    val out = GraftOps.scrubPii(in, col("id"), col("txt"))
      .orderBy(col("doc_id")).collect()
    assert(out.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ===
      Seq((1, 1, 0), (0, 0, 1), (0, 0, 0)))
    // the cleaned text of row 1 is exactly the redacted form
    val wantMd5 = spark.range(1).select(
      md5(lit("reach me at <EMAIL> or <PHONE> soon"))).head.getString(0)
    assert(out(0).getString(4) === wantMd5)
    // nothing-to-scrub text passes through byte-identical
    val passMd5 = spark.range(1).select(
      md5(lit("plain text with nothing to scrub at all"))).head.getString(0)
    assert(out(2).getString(4) === passMd5)
  }

  test("x_pipeline_full: weighted totals are consistent with the sample") {
    val r = ops.LlmQueries.pipelineFull(spark, sf)
    assert(r.count() > 0 && r.count() <= 5)
    // HT weights are >= 2, so estimates dominate the sampled counts
    assert(r.filter(col("est_total_tokens") < col("sampled_tokens") * 2)
      .count() === 0)
    assert(r.filter(col("n_docs") <= 0).count() === 0)
  }

  test("syncDiff surfaces buckets that exist on only one side") {
    import graft.api.GraftOps
    import spark.implicits._
    val src = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "v")
    val tgt = src.filter(col("k") % 2 === 0) // odd buckets vanish entirely
    val diff = GraftOps.syncDiff(src, tgt, col("k"),
      org.apache.spark.sql.functions.concat_ws("|", col("k"), col("v")),
      buckets = 2).collect()
    // bucket 1 has zero target rows: an inner join would drop it silently
    val b1 = diff.find(_.getLong(0) == 1L)
    assert(b1.isDefined, "one-sided bucket missing from the diff")
    assert(b1.get.getLong(2) === 0L && b1.get.getLong(4) === 0L,
      "empty side must coalesce to 0")
  }

  test("x_dedup_embed plan build launches no job once planes are memoized") {
    // planesOf memoizes the corpus count per (session, dir): building the
    // LSH plan must not fire a count job per invocation — at 100 TB that
    // is a full metadata sweep per query.
    SparkEntry.queries("x_dedup_embed")(spark, sf) // warm the memo
    @volatile var jobs = 0
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1
        descs.add(js.stageInfos.map(_.name).mkString(";"))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries("x_dedup_embed")(spark, sf) // build only, no action
      // the listener bus is FIFO per listener: once the marker action's
      // own job event has arrived, any job the plan build launched would
      // have arrived before it — no sleep-and-hope drain. RDD count is
      // exactly one job (an SQL count can be several under AQE).
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (jobs < 1 && System.nanoTime() < deadline) Thread.sleep(20)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs === 1, // exactly the marker job, nothing from the build
      s"plan build launched ${jobs - 1} Spark jobs: " +
        descs.toArray.mkString(" | "))
  }

  test("knnGraph recall is monotone in nprobe") {
    import graft.api.GraftOps
    val emb = Tables.embeddings(spark, sf)
    val nlist = GraftOps.nlistFor(emb.count())
    def bestPerSrc(nprobe: Int) =
      GraftOps.knnGraph(emb, k = 5, nlist = nlist, nprobe = nprobe)
        .groupBy(col("src_id")).agg(max(col("cos_sim")).as("best"))
    val b1 = bestPerSrc(1).withColumnRenamed("best", "b1")
    val b2 = bestPerSrc(2).withColumnRenamed("best", "b2")
    // nprobe=2's candidate set is a superset of nprobe=1's, so the best
    // neighbor per source can only improve (or appear for a previously
    // neighborless source) — never degrade.
    val degraded = b1.join(b2, "src_id")
      .filter(col("b2") < col("b1")).count()
    assert(degraded === 0L, s"$degraded sources lost recall at nprobe=2")
    assert(b2.count() >= b1.count(),
      "nprobe=2 must cover at least every source nprobe=1 covers")
  }

  test("topk(3) per group is a subset of topk(5) per group") {
    def topk(n: Int) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(spark, sf)
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= n)
        .select(col("o_orderpriority"), col("o_orderkey"))
    }
    assert(topk(3).except(topk(5)).isEmpty)
  }

  test("hardNegatives: pairs cross labels, ranks dense, k respected") {
    import graft.api.GraftOps
    val emb = Tables.embeddings(spark, sf)
    val out = GraftOps.hardNegatives(emb, k = 3,
      nlist = GraftOps.nlistFor(emb.count())).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getInt(1) != r.getInt(3)),
      "a hard negative must carry a different label than its anchor")
    val byAnchor = out.groupBy(_.getLong(0))
    byAnchor.foreach { case (a, rs) =>
      val ranks = rs.map(_.getLong(5)).sorted
      assert(ranks.sameElements(1L to ranks.length),
        s"anchor $a ranks not dense: ${ranks.mkString(",")}")
      assert(ranks.length <= 3, s"anchor $a got ${ranks.length} > k")
    }
  }

  test("dsirWeights ranks target-slice docs above the raw corpus") {
    import graft.api.GraftOps
    val docs = Tables.documents(spark, sf)
    val scored = GraftOps.dsirWeights(docs, col("doc_id"), col("text"),
        col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val Array(en, rest) = scored
      .groupBy((col("lang") === "en").as("t"))
      .agg(avg(col("dsir_score")).as("m"))
      .orderBy(col("t").desc).collect().map(_.getDouble(1))
    // the estimator's one job: English docs must average a higher
    // target-likeness than the rest of the corpus
    assert(en > rest, s"en avg $en <= non-en avg $rest")
    assert(scored.filter(col("dsir_score").isNull).count() === 0L)
  }

  test("winnowing guarantee: docs sharing a long run share a fingerprint") {
    import graft.api.GraftOps
    import spark.implicits._
    // common run of 6 tokens = window + gramN - 1 -> at least one shared
    // (hash, ...) selection between the two docs, per the SIGMOD'03 bound
    val common = "alpha beta gamma delta epsilon zeta"
    val docs = Seq((1L, s"one two three $common x y z"),
      (2L, s"$common nine ten eleven twelve")).toDF("doc_id", "text")
    val fp = GraftOps.winnowFingerprints(docs, col("doc_id"), col("text"))
    // re-derive the selected hash sets from the packing to compare
    val tall = docs.select(col("doc_id"),
        posexplode(TextFns.gramsN(TextFns.tokens(col("text")), 3))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"),
        (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")
          * 1048576L + (lit(1048575L) - col("pos"))).as("key"))
    val hashes = tall.select(col("doc_id"),
        expr("min(key) OVER (PARTITION BY doc_id ORDER BY pos " +
          "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) div 1048576")
          .as("h")).distinct()
      .collect().groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getLong(1)).toSet }
    assert((hashes(1L) & hashes(2L)).nonEmpty,
      "6-token common run must share at least one fingerprint hash")
    assert(fp.filter(col("fp_density") > 1.0).count() === 0L)
  }

  test("datasetCard reconciles with doc-level recomputation") {
    import graft.api.GraftOps
    val docs = Tables.documents(spark, sf)
    val card = ops.LlmQueries.datasetCard(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(card.values.map(_.getLong(1)).sum === docs.count(),
      "per-source doc counts must total the corpus")
    // spot-check one source end-to-end
    val src = card.keys.head
    val slice = docs.filter(col("source") === src)
    val r = card(src)
    assert(r.getLong(1) === slice.count())
    assert(r.getLong(3) ===
      slice.agg(sum(length(col("text")))).head().getLong(0))
    val distinct = slice.select(sha2(col("text"), 256)).distinct().count()
    assert(r.getLong(5) ===
      (r.getLong(1) - distinct) * 1000000L / r.getLong(1))
    // shares are ppm: top language share in (0, 1e6]
    card.values.foreach { row =>
      assert(row.getLong(8) > 0L && row.getLong(8) <= 1000000L)
      assert(row.getLong(5) >= 0L && row.getLong(5) < 1000000L)
    }
  }

  test("tokenEntropy: textbook values and [0, ln n_distinct] bounds") {
    import graft.api.GraftOps
    import spark.implicits._
    val docs = Seq((1L, "a a a a"), (2L, "a b c d"),
      (3L, "a a b b")).toDF("doc_id", "text")
    val out = GraftOps.tokenEntropy(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(out(1L) === ((0.0, None)), "constant doc: H=0, evenness NULL")
    assert(math.abs(out(2L)._1 - math.log(4)) < 1e-6)
    assert(out(2L)._2.get === 1.0, "uniform distinct doc: evenness 1")
    assert(math.abs(out(3L)._1 - math.log(2)) < 1e-6)
    // fixture-wide bounds
    val bad = GraftOps.tokenEntropy(Tables.documents(spark, sf),
        col("doc_id"), col("text"))
      .filter(col("token_entropy") < -1e-9 ||
        (col("n_distinct") > 1 &&
          (col("evenness") < -1e-9 || col("evenness") > 1 + 1e-9)))
      .count()
    assert(bad === 0L, s"$bad docs violate entropy/evenness bounds")
  }

  test("CMS never underestimates: est >= exact for EVERY term") {
    import graft.api.GraftOps
    // gate checks the top-20; the sketch property holds corpus-wide —
    // rebuild the sketch and probe every distinct term
    val toks = Tables.documents(spark, sf)
      .select(explode(TextFns.tokens(col("text"))).as("term"))
    def cells(term: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(3)), j =>
        pmod(conv(substring(md5(concat(j.cast("string"), lit("#"), term)),
          1, 12), 16, 10).cast("long"), lit(1024L)))
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("exact"))
    val sketch = toks
      .select(posexplode(cells(col("term"))).as(Seq("j", "cell")))
      .groupBy(col("j"), col("cell")).agg(count(lit(1)).as("c"))
    val under = exact
      .select(col("term"), col("exact"),
        posexplode(cells(col("term"))).as(Seq("j", "cell")))
      .join(sketch, Seq("j", "cell"))
      .groupBy(col("term"), col("exact")).agg(min(col("c")).as("est"))
      .filter(col("est") < col("exact")).count()
    assert(under === 0L, s"$under terms underestimated — CMS broken")
    // and the registered query agrees with its own invariant column
    val out = ops.LlmQueries.cms(spark, sf).collect()
    assert(out.length === 20)
    assert(out.forall(_.getLong(3) >= 0L), "over_ppm must be >= 0")
  }

  test("x_dup_stats accounts for every clustered doc exactly once") {
    val stats = ops.LlmQueries.dupStats(spark, sf).collect()
    val clustered = ops.LlmQueries.dedupCluster(spark, sf).count()
    assert(stats.map(_.getLong(2)).sum === clustered,
      "histogram doc totals must sum to the clustered-doc count")
    assert(stats.forall(r => r.getLong(0) * r.getLong(1) === r.getLong(2)),
      "n_docs must equal cluster_size * n_clusters in every bucket")
    assert(stats.forall(_.getLong(0) >= 2),
      "a near-dup cluster has at least 2 members by construction")
  }

  test("x_lsh_recall: caught pairs are true pairs, recall the exact ratio") {
    val r = ops.LlmQueries.lshRecall(spark, sf).collect().head
    val (truePairs, caught) = (r.getLong(0), r.getLong(1))
    assert(caught <= truePairs, "LSH-verified pairs are a subset of truth")
    assert(truePairs > 0, "fixture must contain near-dup pairs")
    assert(r.getLong(2) === caught * 1000000L / truePairs)
    // every dedupNear pair passes the exact verify, so caught must equal
    // the LSH operator's own pair count
    assert(caught === ops.LlmQueries.dedupNear(spark, sf).count())
  }

  test("centroidClassify recovers clean labels and flags a planted mislabel") {
    import spark.implicits._
    import graft.api.GraftOps
    val vecs = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0f, 1f), 1),
      (3L, Array(0.1f, 0.9f), 1),
      (4L, Array(1f, 0f), 1) // mislabeled: geometrically label 0
    ).toDF("vec_id", "embedding", "label")
    val out = GraftOps.centroidClassify(vecs, col("vec_id"),
        col("embedding"), col("label"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3))))
      .toMap
    assert(out(0L) === ((0, 1)) && out(1L) === ((0, 1)))
    assert(out(2L) === ((1, 1)) && out(3L) === ((1, 1)))
    assert(out(4L) === ((0, 0)), "planted mislabel must be flagged")
  }

  test("x_oov_rate: token accounting and a hand-checked vocabulary cut") {
    import graft.api.GraftOps
    val out = ops.LlmQueries.oovRateQ(spark, sf).collect()
    val corpusTokens = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.tokens(col("text"))))
      .count()
    assert(out.map(_.getLong(1)).sum === corpusTokens)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1))
    }
    // a tiny corpus where the cut is hand-computable: vocabK=1 keeps
    // only the most frequent term ("a"); everything else is OOV
    import spark.implicits._
    val tiny = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val t = GraftOps.oovRate(tiny, col("doc_id"), col("text"), vocabK = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(t(1L) === ((3L, 1L)))
    assert(t(2L) === ((2L, 1L)))
  }

  test("sparseTopK computes exact tf-cosine through the inverted index") {
    import spark.implicits._
    import graft.api.GraftOps
    val docs = Seq((0L, "a b b"), (1L, "a a b"), (2L, "a b"), (3L, "c c"))
      .toDF("doc_id", "text")
    val out = GraftOps.sparseTopK(docs, col("doc_id"), col("text"),
        probeMax = 1L, k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // probe 0 = {a:1, b:2}, |p|² = 5. doc1 {a:2,b:1}: dot 4, cos 4/5;
    // doc2 {a:1,b:1}: dot 3, cos 3/√10; doc3 shares no term -> absent
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    assert(out(0)._2 === 4L && out(0)._3 === 0.8)
    assert(out(1)._2 === 3L &&
      out(1)._3 === math.floor(3.0 / math.sqrt(10.0) * 1e6 + 0.5) / 1e6)
  }

  test("truncatedRerank prunes by prefix then re-ranks by full cosine") {
    import spark.implicits._
    import graft.api.GraftOps
    // probe (1,0,0,0). A ranks FIRST on the 2-dim prefix (perfect
    // direction) but its heavy tail collapses the full cosine; B is
    // slightly worse coarse but near-perfect full; D is pruned at stage 1.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0f, 5f, 0f)),   // A: coarse 1.0, full ~0.18
      (2L, Array(0.8f, 0.1f, 0f, 0f)), // B: coarse ~0.99, full ~0.99
      (3L, Array(0f, 1f, 0f, 0f))      // D: coarse 0.0 -> pruned
    ).toDF("vec_id", "embedding")
    val out = GraftOps.truncatedRerank(vecs,
        vecs.filter(col("vec_id") === 0), coarseDims = 2, coarseK = 2, k = 1)
      .collect()
    assert(out.length === 1)
    // stage 2 must overturn the coarse order: B wins despite A's
    // perfect prefix score
    assert(out.head.getLong(1) === 2L,
      s"expected the full-cosine winner, got vec ${out.head.getLong(1)}")
  }

  test("x_mrl_topk: ranked 1..5 per probe, full cosine monotone in rank") {
    val out = ops.LlmQueries.mrlTopK(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(out.keySet === (0L until 8L).toSet)
    out.values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(4))
      assert(byRank.map(_.getLong(4)).toSeq === (1L to 5L))
      val sims = byRank.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        "cos_sim must be non-increasing in rank")
    }
  }

  test("x_ann_recall: one row per probe, recall an exact fraction of k=3") {
    val out = ops.LlmQueries.annRecall(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet === (0L until 8L).toSet)
    out.foreach { r =>
      val hits = r.getLong(1)
      assert(hits >= 0L && hits <= 3L, s"hits out of range: $hits")
      assert(r.getLong(2) === hits * 1000000L / 3L,
        "recall_ppm must be the exact integer fraction")
    }
    // the IVF owner cell always contains the vector's own best-cell
    // neighbors at nprobe=3 >= 1, so recall can't be uniformly zero
    assert(out.map(_.getLong(1)).sum > 0L, "zero total recall — index broken")
  }

  /** Plain-Scala replay of the CDC boundary rule: a boundary falls after
    * 0-based token i (i >= window-1) when the first 8 md5 hex digits of
    * the window-gram ending at i are ≡ 0 mod `modulus`; a boundary after
    * the LAST token opens no chunk.
    */
  private def cdcChunkCount(text: String, window: Int = 4,
                            modulus: Int = 8): Int = {
    val w = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (w.isEmpty) return 0
    val md = java.security.MessageDigest.getInstance("MD5")
    1 + ((window - 1) to (w.length - 2)).count { i =>
      val gram = w.slice(i - window + 1, i + 1).mkString(" ")
      val hex = md.digest(gram.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % modulus == 0
    }
  }

  test("cdcChunks: chunk counts replay in plain integer Scala; an exact " +
    "duplicate doc is 100% dup chunks") {
    import spark.implicits._
    // distinct tokens — a cycling stream would legitimately create
    // intra-doc duplicate chunks and muddy the zero-dup expectation
    val t1 = (1 to 120).map(i => s"t$i").mkString(" ")
    val t2 = (1 to 90).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, t1), (2L, t2), (3L, t1)).toDF("doc_id", "text")
    val out = GraftOps.cdcChunks(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out(0)._2 === cdcChunkCount(t1).toLong)
    assert(out(1)._2 === cdcChunkCount(t2).toLong)
    // doc 3 = doc 1 verbatim: every chunk already seen at (1, st)
    assert(out(2) === (3L, cdcChunkCount(t1).toLong,
      cdcChunkCount(t1).toLong, 1000000L))
    // doc 1 owns its own chunks (first occurrence) — zero dups
    assert(out(0)._3 === 0L && out(0)._4 === 0L)
  }

  test("cdcChunks: boundaries re-synchronize after a head edit " +
    "(the property fixed windows lack)") {
    import spark.implicits._
    val base = (1 to 200).map(i => s"w${i * 11 % 29}").mkString(" ")
    val edited = "inserted " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val out = GraftOps.cdcChunks(docs, col("doc_id"), col("text"))
      .filter(col("doc_id") === 2L).collect().head
    // content-anchored boundaries: downstream of the edit the chunk
    // stream realigns, so most of the edited doc's chunks are dups of
    // the original's — a 1-token prepend must not zero the dedup signal
    assert(out.getLong(3) > 500000L,
      s"dup_ppm ${out.getLong(3)} — CDC failed to re-synchronize")
  }

  test("dedupSoft: class members weigh 1/csize, mass conserved per class") {
    import spark.implicits._
    val dup = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, dup, "srcA"), (2L, dup, "srcB"), (3L, "unique text here", "srcA")
    ).toDF("doc_id", "text", "source")
    val out = GraftOps.dedupSoft(docs, col("doc_id"), col("text"),
        col("source"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // srcA: the unique doc carries 10^6, its half of the dup class 5·10^5
    assert(out === Seq(("srcA", 2L, 1L, 1500000L), ("srcB", 1L, 1L, 500000L)))
  }

  test("dedupPriority: the trusted source's copy wins over the earlier " +
    "doc_id, and the rescue is counted") {
    import spark.implicits._
    val dup = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, dup, "src5"), (2L, dup, "src2"), (3L, "unique text here", "src5")
    ).toDF("doc_id", "text", "source")
    val out = GraftOps.dedupPriority(docs, col("doc_id"), col("text"),
        col("source"), substring(col("source"), 4, 10).cast("int"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // src2's doc 2 beats src5's doc 1 (priority 2 < 5) though doc 1
    // arrived first → kept AND rescued; src5 keeps only its unique doc
    assert(out === Seq(
      ("src2", 1L, 1L, 0L, 1L),
      ("src5", 2L, 1L, 1L, 0L)))
  }

  test("sourceOverlap: cross cells need both sources, diagonal cells " +
    "need two docs of THAT source") {
    import spark.implicits._
    val dup1 = "alpha beta gamma delta epsilon zeta"
    val dup2 = "one two three four five six seven"
    val docs = Seq(
      // class 1: one A copy + two B copies -> (A,B) cross AND (B,B)
      // diagonal, but NOT (A,A) — a single A doc duplicates nothing
      // within A
      (1L, dup1, "srcA"), (2L, dup1, "srcB"), (3L, dup1, "srcB"),
      // class 2: two A copies -> (A,A) only
      (4L, dup2, "srcA"), (5L, dup2, "srcA"),
      // singleton: contributes nothing
      (6L, "totally unique text body here", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = GraftOps.sourceOverlap(docs, col("doc_id"), col("text"),
        col("source"))
      .orderBy("src_a", "src_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out === Seq(
      ("srcA", "srcA", 1L),
      ("srcA", "srcB", 1L),
      ("srcB", "srcB", 1L)))
  }

  test("mineBitext: the ratio margin deflates hub targets (argmax flips " +
    "vs raw cosine) and the IVF leg equals exhaustive when every cell " +
    "is probed") {
    import spark.implicits._
    // A = three orthogonal axes; B = a HUB close to every axis and a
    // specialist t close to a1 only. Raw cosine ranks hub above t for
    // a1 (0.60 vs ~0.55), but the hub's high k-NN denominator deflates
    // its margin — the mined pair for a1 must be t, for a2/a3 the hub.
    val mk = (id: Long, v: Array[Float]) => (id, v)
    val src = Seq(
      mk(0L, Array(1f, 0f, 0f, 0f)),
      mk(2L, Array(0f, 1f, 0f, 0f)),
      mk(4L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val tgt = Seq(
      mk(1L, Array(0.60f, 0.56f, 0.56f, 0f)),          // hub
      mk(3L, Array(0.551f, 0.05f, 0.05f, 0.83f)))       // specialist
      .toDF("vec_id", "embedding")
    val mined = GraftOps.mineBitext(src, tgt, k = 2, nprobe = 3,
        exhaustive = true)
      .orderBy("src_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(mined === Array((0L, 3L), (2L, 1L), (4L, 1L)),
      "a1 must mine the specialist (margin flip); a2/a3 the hub")
    // raw cosine would have paired a1 with the hub — pin the flip
    val rawTop = GraftOps.similarityTopK(tgt, src, k = 1)
      .filter(col("probe_id") === 0L).collect().head.getLong(1)
    assert(rawTop === 1L, "raw cosine argmax for a1 is the hub")
    // with nprobe >= nlist every cell is probed: the IVF leg must
    // reproduce the exhaustive leg exactly on this bounded set
    val ivf = GraftOps.mineBitext(src, tgt, k = 2, nprobe = 3)
      .orderBy("src_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf === mined)
  }

  test("captionConflict: both conflict directions counted per image " +
    "class, caption identity is trim+lower") {
    import spark.implicits._
    val docs = Seq(
      // image A (key 10): three docs, two DISTINCT captions — doc 3's
      // caption equals doc 1's after trim+lower, pinning normalization
      (1L, 10L, "cat on mat"),
      (2L, 10L, "a cat"),
      (3L, 10L, "  CAT on Mat "),
      // image B (key 20): shares doc 1's caption (cross-image) plus one
      // caption of its own
      (4L, 20L, "cat on mat"),
      (5L, 20L, "dog"),
      // image C (key 30): a clean singleton — no conflict either way
      (6L, 30L, "unique caption")
    ).toDF("doc_id", "img", "cap")
    val out = GraftOps.captionConflict(docs, col("doc_id"), col("img"),
        col("cap"))
      .orderBy("cluster_rep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    assert(out === Seq(
      // A: 2 captions (conflict), docs 1+3 carry the caption that also
      // lives under B → 2 cross-image docs
      (1L, 3L, 2L, 1, 2L),
      // B: 2 captions (conflict), doc 4 is the cross-image one
      (4L, 2L, 2L, 1, 1L),
      (6L, 1L, 1L, 0, 0L)))
    // NULL captions stay VISIBLE with per-doc keys: the row keeps its
    // image class (no silent drop) and two caption-less docs are never
    // counted as sharing a caption
    val withNulls = Seq(
      (1L, 10L, Some("real caption")),
      (2L, 10L, None),
      (3L, 20L, None)
    ).toDF("doc_id", "img", "cap")
    val nOut = GraftOps.captionConflict(withNulls, col("doc_id"),
        col("img"), col("cap"))
      .orderBy("cluster_rep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    assert(nOut === Seq(
      (1L, 2L, 2L, 1, 0L), // doc 2 retained; its nocap key is unique
      (3L, 1L, 1L, 0, 0L)))
    // blank-after-trim captions take the SAME per-doc route as NULLs:
    // '' and whitespace-only all trim to the empty string, which would
    // otherwise share ONE md5("") bucket and fabricate exactly the
    // same-caption/different-image conflicts the routing exists to
    // prevent — docs 2/3/4 must NOT count as cross-image
    val withBlanks = Seq(
      (1L, 10L, "real caption"),
      (2L, 10L, ""),
      (3L, 20L, "   "),
      (4L, 30L, "")
    ).toDF("doc_id", "img", "cap")
    val bOut = GraftOps.captionConflict(withBlanks, col("doc_id"),
        col("img"), col("cap"))
      .orderBy("cluster_rep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    assert(bOut === Seq(
      (1L, 2L, 2L, 1, 0L), // blank doc 2 retained under its own key
      (3L, 1L, 1L, 0, 0L),
      (4L, 1L, 1L, 0, 0L)))
  }
}
