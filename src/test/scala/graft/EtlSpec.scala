package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Physical-layout assertions for the bulk-load (total-order) write — the
  * properties that make HFile-style loading possible: every output file is
  * internally key-sorted and files hold pairwise-disjoint key ranges.
  */
class EtlSpec extends SparkSpec {

  test("bulk load writes internally-sorted, range-disjoint files") {
    val out = ops.EtlQueries.bulkLoadTo(spark, sf,
      Files.createTempDirectory("graft_bulktest").toString)
    val perFile = spark.read.parquet(out)
      .select(col("p_partkey"), input_file_name().as("f"))
    // ranges disjoint: [min,max] intervals must not overlap across files
    val ranges = perFile.groupBy(col("f"))
      .agg(min(col("p_partkey")).as("lo"), max(col("p_partkey")).as("hi"))
      .orderBy(col("lo")).collect()
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) < b.getLong(1),
          s"file ranges overlap: ${a} vs ${b}")
      case _ =>
    }
    assert(ranges.length > 1, "expected multiple range files")
    // within-file sorted, in PHYSICAL row order: read each file on its own
    // (small file -> one input partition, so collect() preserves the
    // parquet row order) and assert the key sequence is non-decreasing.
    ranges.map(_.getString(0)).foreach { f =>
      val keys = spark.read.parquet(f)
        .select(col("p_partkey")).collect().map(_.getLong(0))
      assert(keys.sameElements(keys.sorted),
        s"file $f is not internally key-sorted")
    }
    // totality: nothing lost
    assert(spark.read.parquet(out).count() ===
      Tables.part(spark, sf).count())
  }

  test("bulk load honors the per-file record bound at 10x volume") {
    import graft.api.GraftOps
    // 10x the sf0.001 part table: 20k keyed rows, 4 range partitions,
    // 1500-record file governor -> each partition (~5k rows) re-splits
    // into sequential sorted chunks. Envelope: at least ceil(20000/1500)
    // = 14 files, at most numFiles + 20000/1500 < 18 (each partition
    // wastes at most one partial file).
    val rows = spark.range(0, 20000L, 1, 8)
      .select(col("id").as("k"), md5(col("id").cast("string")).as("payload"))
    val out = Files.createTempDirectory("graft_bulkbound").toString
    GraftOps.bulkLoad(rows, col("k"), numFiles = 4, path = out,
      maxRecordsPerFile = 1500L)
    val perFile = spark.read.parquet(out)
      .select(col("k"), input_file_name().as("f"))
      .groupBy(col("f"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("lo"),
        max(col("k")).as("hi"))
      .orderBy(col("lo")).collect()
    assert(perFile.length >= 14 && perFile.length <= 17,
      s"file count ${perFile.length} outside the [14, 17] envelope")
    perFile.foreach { r =>
      assert(r.getLong(1) <= 1500L, s"file exceeds the record bound: $r")
    }
    // the governor must not break the bulk-load layout contract:
    // pairwise-disjoint ranges across ALL files (keys unique -> strict)
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2),
        s"split file ranges overlap: $a vs $b")
      case _ =>
    }
    assert(perFile.map(_.getLong(1)).sum === 20000L)
  }

  test("compaction at 10x respects both the file bound and clustering") {
    // same governor through the compaction path: 64 fragments in, files
    // out are range-clustered AND none exceeds the record bound
    val out = ops.EtlQueries.compactTo(spark, "/root/testdata/sf0.01",
      Files.createTempDirectory("graft_compactbound").toString,
      numFiles = 4, maxRecordsPerFile = 10000L)
    val perFile = spark.read.parquet(out)
      .select(col("l_orderkey"), input_file_name().as("f"))
      .groupBy(col("f"))
      .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("lo"),
        max(col("l_orderkey")).as("hi"))
      .orderBy(col("lo")).collect()
    perFile.foreach { r =>
      assert(r.getLong(1) <= 10000L, s"file exceeds the record bound: $r")
    }
    assert(perFile.length > 4, "the bound must have split the 4 partitions")
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2),
        s"compacted file ranges interleave: $a vs $b")
      case _ =>
    }
    assert(perFile.map(_.getLong(1)).sum ===
      Tables.lineitem(spark, "/root/testdata/sf0.01").count())
  }

  test("compaction collapses 64 fragments into <= 4 range-disjoint files") {
    val out = ops.EtlQueries.compactTo(spark, sf,
      Files.createTempDirectory("graft_compacttest").toString, numFiles = 4)
    val perFile = spark.read.parquet(out)
      .select(col("l_orderkey"), input_file_name().as("f"))
    val ranges = perFile.groupBy(col("f"))
      .agg(min(col("l_orderkey")).as("lo"), max(col("l_orderkey")).as("hi"))
      .orderBy(col("lo")).collect()
    assert(ranges.length <= 4, s"expected <= 4 compacted files, ${ranges.length}")
    // re-clustered: file [lo, hi] key ranges may touch at a shared
    // boundary key (range partitioning splits BETWEEN keys) but never
    // properly interleave
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1),
        s"compacted file ranges interleave: $a vs $b")
      case _ =>
    }
    // totality: compaction loses and invents nothing
    assert(spark.read.parquet(out).count() ===
      Tables.lineitem(spark, sf).count())
  }

  test("z-order layout localizes BOTH key dimensions per file") {
    val keyed = ops.EtlQueries.zorderKeys(spark, sf)
      .select(col("l_orderkey").as("a"), col("l_partkey").as("b"),
        col("zval"))
    def spans(sortCol: String): (Double, Double) = {
      val out = Files.createTempDirectory(s"graft_zorder_$sortCol").toString
      keyed.repartitionByRange(8, col(sortCol))
        .sortWithinPartitions(sortCol).write.mode("overwrite").parquet(out)
      val per = spark.read.parquet(out)
        .select(col("a"), col("b"), input_file_name().as("f"))
        .groupBy(col("f"))
        .agg((max(col("a")) - min(col("a"))).as("sa"),
          (max(col("b")) - min(col("b"))).as("sb"))
        .agg(avg(col("sa")).as("ma"), avg(col("sb")).as("mb")).head()
      val g = keyed.agg(max(col("a")) - min(col("a")),
        max(col("b")) - min(col("b"))).head()
      (per.getDouble(0) / g.getLong(0), per.getDouble(1) / g.getLong(1))
    }
    val (za, zb) = spans("zval")
    val (oa, ob) = spans("a")
    // a z-ordered file covers a near-square region: both dims localized.
    // a plain sort on `a` localizes `a` but leaves `b` at ~global span.
    assert(za < 0.8 && zb < 0.8,
      s"z-order spans not localized: a=$za b=$zb")
    assert(ob > 0.9, s"control broken: plain-sort b span $ob should be ~1")
    assert(zb < ob * 0.8,
      s"z-order must beat plain sort on the second dimension ($zb vs $ob)")
    assert(oa <= za, "plain sort should localize its own column best")
  }

  test("tsv round-trip is lossless") {
    val back = ops.EtlQueries.tsvRoundTrip(spark, sf)
    val orig = Tables.nation(spark, sf)
    assert(back.count() === orig.count())
    assert(back.except(orig).isEmpty)
  }

  test("multimodal struct survives a parquet round-trip byte-for-byte") {
    val out = Files.createTempDirectory("graft_mediatest").toString
    val media = ops.LlmQueries.mediaTable(spark, sf)
      .select(col("doc_id"), col("media.content").as("content"))
    media.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() === media.count())
    // content bytes identical after round-trip
    assert(back.select(sha2(col("content"), 256).as("h"))
      .except(media.select(sha2(col("content"), 256).as("h"))).isEmpty)
  }

  test("q_histogram: 8 disjoint ordered buckets of near-equal depth") {
    val h = ops.EtlQueries.histogram(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(h.map(_._1).toSeq === (1 to 8))
    // buckets tile the value range in order without overlap
    h.zip(h.tail).foreach { case ((_, _, _, hi), (_, _, lo, _)) =>
      assert(hi < lo, s"bucket ranges overlap: hi=$hi lo=$lo")
    }
    h.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    // equi-depth: every bucket within 25% of n/8 (ties can skew slightly)
    val n = h.map(_._2).sum
    h.foreach { case (b, cnt, _, _) =>
      assert(math.abs(cnt - n / 8.0) <= n / 8.0 * 0.25,
        s"bucket $b depth $cnt far from ${n / 8}")
    }
  }

  test("skewAudit: bucket placement replays md5 in plain Scala, totals " +
    "are conserved, a hot key concentrates its share") {
    import spark.implicits._
    // 90 rows of one hot key + 10 distinct cold keys
    val df = (Seq.fill(90)("hot") ++ (1 to 10).map(i => s"cold$i"))
      .toDF("k")
    val out = graft.api.GraftOps.skewAudit(df, col("k"), "k", parts = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // row conservation and share_ppm arithmetic
    assert(out.map(_._2).sum === 100L)
    assert(out.forall(b => b._4 === b._2 * 1000000L / 100L))
    assert(out.forall(b => b._1 >= 0 && b._1 < 8 && b._3 <= b._2))
    // the hot key's bucket, replayed: first 8 md5 hex digits mod 8
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("hot".getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    val hotBucket = java.lang.Long.parseLong(hex, 16) % 8
    val hot = out.find(_._1 == hotBucket).get
    assert(hot._2 >= 90L, s"hot bucket holds ${hot._2} — placement wrong")
    assert(hot._4 >= 900000L)
  }

  test("write-audit-publish law: a failed audit leaves the previous " +
    "publish readable; re-publish is idempotent; the flip is atomic") {
    import spark.implicits._
    import graft.api.GraftOps
    val root = Files.createTempDirectory("graft_wap_law").toString
    def snap() = GraftOps.readPublished(spark, root)
      .as[(Long, String)].collect().sorted.toSeq
    // no publish yet: loud, not an empty frame
    val e = intercept[IllegalArgumentException] {
      GraftOps.readPublished(spark, root)
    }
    assert(e.getMessage.contains("no successful publish"))
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val pass = (rows: Long, _: Long) =>
      if (rows == 3L) None else Some(s"want 3, got $rows")
    val r1 = GraftOps.publishAudited(v1, root, "1", pass)
    assert(r1.published && r1.rows === 3L && r1.reason === "")
    assert(snap() === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the broken upstream: audit rejects, manifest untouched, previous
    // publish still byte-identical — the law the pattern exists for
    val r2 = GraftOps.publishAudited(
      v1.filter(col("k") =!= 2L), root, "2", pass)
    assert(!r2.published && r2.rows === 2L &&
      r2.reason.contains("want 3, got 2"))
    assert(snap() === Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "a failed audit must leave the previous publish readable")
    // fingerprint audits too: same count, one mutated value -> reject
    val fpGate = (rows: Long, fp: Long) =>
      if (rows == 3L && fp == r1.fingerprint) None else Some("fp drift")
    val r3 = GraftOps.publishAudited(
      v1.withColumn("v", when(col("k") === 2L, lit("X"))
        .otherwise(col("v"))), root, "3", fpGate)
    assert(!r3.published && r3.rows === 3L)
    // REPLAY of a publishId (the at-least-once orchestrator case):
    // overwrites its own staging, flips to the same content — a no-op
    val r1b = GraftOps.publishAudited(v1, root, "1", pass)
    assert(r1b.published && r1b.fingerprint === r1.fingerprint)
    assert(snap() === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // a genuinely new good version flips the reader atomically
    val v4 = Seq((7L, "z"), (8L, "y"), (9L, "x")).toDF("k", "v")
    val r4 = GraftOps.publishAudited(v4, root, "4", pass)
    assert(r4.published)
    assert(snap() === Seq((7L, "z"), (8L, "y"), (9L, "x")))
    // no temp manifest debris survives any of the five publishes
    val debris = Option(new java.io.File(root).listFiles).toSeq.flatten
      .map(_.getName).filter(_.endsWith(".tmp"))
    assert(debris.isEmpty, s"leftover manifest temps: $debris")
    // rejected versions sit unreferenced (janitor-visible), never read
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "_current")).trim === "v_4")
  }
}
