package graft.ops

import java.nio.file.Files

import graft.{QueryPack, Tables}
import graft.api.GraftOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ETL write-path tier (SURVEY.md §2.1 sinks, §3.2) — the reference is a
  * batch ETL domain: ImportTsv text ingest, TableOutputFormat sinks,
  * HFileOutputFormat2 bulk loads (total-order write), MultiTableOutputFormat
  * routing, Export/CopyTable round-trips. Each operator here performs the
  * REAL write to a fresh temp dir, reads it back, and returns the read-back
  * rows — so the oracle gate proves the round-trip is lossless, and
  * EtlSpec asserts the physical layout properties (per-file key order,
  * disjoint ranges) that define a bulk load.
  *
  * 100-TB notes: repartitionByRange samples key quantiles exactly as
  * TotalOrderPartitioner does; partitionBy(route) is the multi-table
  * routing sink; none of these collect anything to the driver.
  */
object EtlQueries extends QueryPack {

  /** Scratch dirs are reclaimed at JVM exit by one shutdown hook — a
    * resident gate/bench loop otherwise leaks a table copy per ETL query
    * per run (deleteOnExit cannot remove non-empty dirs).
    */
  private val scratch = scala.collection.mutable.ListBuffer.empty[java.io.File]
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    scratch.synchronized {
      scratch.foreach { root =>
        // delete children before parents
        val all = {
          def walk(f: java.io.File): Seq[java.io.File] =
            Option(f.listFiles).toSeq.flatten.flatMap(walk) :+ f
          walk(root)
        }
        all.foreach(f => try f.delete() catch { case _: Throwable => () })
      }
    }))

  private def tmp(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    scratch.synchronized { scratch += dir.toFile }
    dir.toString
  }

  /** ImportTsv: schema-applied delimited-text ingest, round-tripped. */
  def tsvRoundTrip(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft_tsv")
    Tables.nation(s, d).write.mode("overwrite")
      .option("sep", "\t").csv(out)
    s.read
      .schema(StructType.fromDDL(
        "n_nationkey INT, n_name STRING, n_regionkey INT"))
      .option("sep", "\t").csv(out)
  }

  /** Quoted-CSV round-trip: the tsv path hardened for embedded
    * delimiters, quotes and escapes — the interchange edge case that
    * silently corrupts naive splitters. The written column PLANTS a
    * comma + double-quote in every value (both engines synthesize the
    * identical string, the piiScrub discipline), so the gate proves the
    * writer quoted and the reader unquoted every value exactly.
    */
  def csvRoundTrip(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft_csv")
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        concat(col("n_name"), lit(",\""), col("n_name")).as("tricky"),
        col("n_regionkey"))
      .write.mode("overwrite").option("quote", "\"").option("escape", "\"")
      .csv(out)
    s.read
      .schema(StructType.fromDDL(
        "n_nationkey INT, tricky STRING, n_regionkey INT"))
      .option("quote", "\"").option("escape", "\"")
      .csv(out)
  }

  /** JSON source round-trip: schema-applied line-JSON ingest — the
    * interchange format half the upstream feeds arrive in. Reading with
    * an explicit schema (never inference) is the 100-TB contract: an
    * inferred schema costs a full pre-scan and can drift per batch.
    */
  def jsonRoundTrip(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft_json")
    Tables.nation(s, d).write.mode("overwrite").json(out)
    s.read
      .schema(StructType.fromDDL(
        "n_nationkey INT, n_name STRING, n_regionkey INT"))
      .json(out)
  }

  /** ORC source round-trip: the second columnar format Spark ships
    * natively — same pushdown/pruning machinery as parquet, so a lake
    * that mixes both reads through one code path.
    */
  def orcRoundTrip(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft_orc")
    Tables.supplier(s, d).write.mode("overwrite").orc(out)
    s.read.orc(out)
  }

  /** Bulk load: total-order write — range-partition by sampled key
    * quantiles (TotalOrderPartitioner's contract), sort within each
    * partition, write. Files hold disjoint, internally-sorted key ranges —
    * directly loadable as HFiles are.
    */
  def bulkLoad(s: SparkSession, d: String): DataFrame = {
    val out = bulkLoadTo(s, d, tmp("graft_bulkload"))
    s.read.parquet(out)
  }

  /** The write half of [[bulkLoad]], reusable by EtlSpec to audit layout. */
  def bulkLoadTo(s: SparkSession, d: String, out: String): String = {
    GraftOps.bulkLoad(Tables.part(s, d), col("p_partkey"),
      numFiles = 8, path = out)
    out
  }

  /** CopyTable: filtered/time-ranged table-to-table copy. */
  def copyTable(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft_copytable")
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_totalprice") > 150000.0)
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out)
  }

  /** MultiTableOutputFormat: route each record to a per-tag table
    * (partitionBy directory = one "table" per route); read back one route.
    */
  def multiSink(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft_multisink")
    val routed = Tables.events(s, d).withColumn("route", col("event_type"))
    routed.write.mode("overwrite").partitionBy("route").parquet(out)
    // explicit schema on the read-back: inference is both the 100-TB
    // anti-pattern (a listing-wide pre-scan) and a crash when the
    // routed write produced zero files (empty source)
    s.read.schema(routed.schema).parquet(out)
      .filter(col("route") === "click")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
  }

  /** Export/Import: lossless table → files → table round-trip over the
    * customer table (int/string/double columns; the binary+struct media
    * round-trip is asserted separately in EtlSpec where the payload
    * actually carries those types).
    */
  def exportImport(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft_export")
    Tables.customer(s, d).write.mode("overwrite").parquet(out)
    s.read.parquet(out)
  }

  /** Small-file compaction + re-cluster (OPTIMIZE): the operational op a
    * 100-TB lake runs nightly — streaming/CDC sinks leave thousands of
    * KB-sized files whose per-file open/footer cost dominates scans.
    * Fragment the input to 64 shards, then compact to `numFiles`
    * range-clustered, internally-sorted files (the [[bulkLoad]] layout:
    * compaction that also restores key locality, so post-compaction
    * scans get both fewer files AND min/max pruning). Content
    * preservation is the gate: the oracle is the uncompacted table.
    */
  def compactTo(s: SparkSession, d: String, out: String, numFiles: Int,
                maxRecordsPerFile: Long = 0L): String = {
    val frag = tmp("graft_frag")
    // fixture prep, not the operator: the 64-fragment scatter only
    // exists to simulate a small-file-ridden table for the compaction to
    // fix. Writing the scratch copy uncompressed skips a full encode+
    // decode of the table that the COMPACTION (the measured operator,
    // whose output keeps the session codec) never pays in production.
    Tables.lineitem(s, d).repartition(64).write.mode("overwrite")
      .option("compression", "none").parquet(frag)
    // maxRecordsPerFile (0 = unbounded): compaction must not trade many
    // small files for one oversized one — the governor re-splits a fat
    // range partition into sequential, still-sorted chunks (EtlSpec pins
    // the envelope; same contract as GraftOps.bulkLoad)
    s.read.parquet(frag)
      .repartitionByRange(numFiles, col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(out)
    out
  }

  def compact(s: SparkSession, d: String): DataFrame =
    s.read.parquet(compactTo(s, d, tmp("graft_compact"), numFiles = 4))

  /** q_etl_wap: write-audit-publish ([[GraftOps.publishAudited]]) — the
    * idempotent-publish law every 100-TB pipeline ships: stage → audit
    * the STAGED bytes (row count + order-insensitive fingerprint) →
    * atomic manifest swap, so readers never see a partial or
    * audit-failed table. The gate publishes the nation table, then
    * attempts a BROKEN publish (an upstream that silently dropped the
    * odd keys) whose audit rejects on the row count — and the gated
    * output is what a reader resolves afterwards, which must still be
    * the first publish byte-for-byte (oracle: the nation table
    * itself). The full law (manifest untouched on reject, re-publish
    * idempotency, atomic flip) lives in EtlSpec.
    */
  def wapPublish(s: SparkSession, d: String): DataFrame = {
    val root = tmp("graft_wap")
    val nation = Tables.nation(s, d)
    val expected = nation.count()
    // the broken-publish arm below only demonstrates a rejection when
    // there are rows to lose — loud on the empty fixture, not a
    // vacuous "rejection" that never happened
    require(expected > 0, "q_etl_wap: fixture requires a nonempty nation")
    def mustHave(n: Long): (Long, Long) => Option[String] =
      (rows, _) => if (rows == n) None
                   else Some(s"staged $rows rows, expected $n")
    val r1 = GraftOps.publishAudited(nation, root, "1", mustHave(expected))
    require(r1.published, s"q_etl_wap: the good publish failed: ${r1.reason}")
    // the broken upstream: half the table vanishes — audit must reject
    val r2 = GraftOps.publishAudited(
      nation.filter(col("n_nationkey") % 2 === 0), root, "2",
      mustHave(expected))
    require(!r2.published,
      "q_etl_wap: the broken publish passed its audit")
    GraftOps.readPublished(s, root)
  }

  /** Secondary-index build + serve — the classic MR pattern over a
    * row-keyed store: a batch job inverts (rowkey → value) into a
    * (value, rowkey) index table, range-clustered on the indexed value
    * so a point query touches one file; serving is index probe →
    * rowkey set → semi-join back to the base table. At 100 TB the
    * probe reads ~selectivity of the INDEX (two narrow columns,
    * min/max-pruned), never scans the base fact, and the rowkey join is
    * the base table's own key — the gate proves the indexed path equals
    * the direct predicate.
    */
  def idxLookup(s: SparkSession, d: String): DataFrame = {
    val idxDir = tmp("graft_idx")
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("ival"), col("o_orderkey").as("rk"))
      .repartitionByRange(4, col("ival"))
      .sortWithinPartitions(col("ival"))
      .write.mode("overwrite").parquet(idxDir)
    val hits = s.read.parquet(idxDir)
      .filter(col("ival") === "1-URGENT")
      .select(col("rk").as("o_orderkey"))
    Tables.orders(s, d).join(hits, "o_orderkey")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  /** q_join_bucket: co-located join over bucketed tables — the
    * zero-shuffle join strategy a 100-TB deployment pre-pays at write
    * time (HBase's region-aligned layout re-expressed as Spark
    * bucketing). Both sides are written bucketed+sorted on the join key
    * with one file per bucket, so the merge join consumes the bucket
    * layout directly: NO Exchange anywhere in the plan (pinned in
    * PlanSpec), and the downstream per-key aggregate reuses the same
    * partitioning. Tables are created once per session per fixture dir
    * (the write is the pre-pay; the steady-state cost is the join alone);
    * the merge hint only picks the strategy that can exploit the layout —
    * it forces nothing that isn't already physically true.
    */
  def joinBucketed(s: SparkSession, d: String): DataFrame = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val lt = s"bkt_lineitem_$tag"
    val ot = s"bkt_orders_$tag"
    if (!s.catalog.tableExists(lt)) {
      Tables.lineitem(s, d).repartition(8, col("l_orderkey"))
        .write.format("parquet").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").mode("overwrite").saveAsTable(lt)
    }
    if (!s.catalog.tableExists(ot)) {
      Tables.orders(s, d).repartition(8, col("o_orderkey"))
        .write.format("parquet").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").mode("overwrite").saveAsTable(ot)
    }
    // revenue in exact integer math: price and discount are 2-decimal
    // exact, so price_cents * (100 - disc_pct) is an exact BIGINT in
    // 1e-4-dollar units; a float sum here flips ~0.1% of the per-order
    // groups across the cent boundary between engines (groups are small,
    // so one last-ulp difference survives into round(2)).
    val units = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))
    s.table(lt).hint("merge")
      .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(sum(units).as("u"), count(lit(1)).as("n_items"))
      .select(col("l_orderkey"), col("o_orderpriority"),
        (expr("(u + 50) div 100") / 100.0).as("revenue"), col("n_items"))
  }

  /** q_etl_zorder: the Morton layout key over (l_orderkey, l_partkey) —
    * the multi-column data-skipping sort key (gate replays every
    * interleaved bit; the physical min/max-locality assertion lives in
    * EtlSpec where file layout belongs). Both keys are min/max
    * normalized to [0, 2^16) in exact integer math first — without it
    * the wider key's high bits dominate the interleave and the curve
    * degenerates to a plain sort (see GraftOps.zorder2). The 1-row
    * stats aggregate broadcasts; at scale that is one metadata-cheap
    * pre-pass, the standard OPTIMIZE ZORDER shape.
    */
  def zorderKeys(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val st = li.agg(min(col("l_orderkey")).as("mina"),
      max(col("l_orderkey")).as("maxa"),
      min(col("l_partkey")).as("minb"), max(col("l_partkey")).as("maxb"))
    li.crossJoin(broadcast(st))
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        expr("(l_orderkey - mina) * 65535 div greatest(1, maxa - mina)")
          .as("na"),
        expr("(l_partkey - minb) * 65535 div greatest(1, maxb - minb)")
          .as("nb"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        GraftOps.zorder2(col("na"), col("nb"), 16).as("zval"))
      .withColumn("zbucket", expr("zval div 1048576"))
  }

  /** q_analyze_stats: ANALYZE TABLE — per-column catalog statistics
    * (ndv, null count, min/max) the optimizer's CBO consumes. ONE scan:
    * a single multi-distinct aggregate row (Spark plans multi-column
    * countDistinct via one Expand + partial/final agg — one shuffle
    * total), unpivoted to the per-column stats table with stack().
    * Min/max stringified on integer/varchar columns only (float
    * formatting is engine-specific).
    */
  def analyzeStats(s: SparkSession, d: String): DataFrame = {
    // One aggregate leg PER COLUMN, unioned, instead of a single
    // 3-distinct aggregate: Spark plans multi-column countDistinct via
    // one Expand (×4 rows) and the whole expanded dedup then runs
    // serially (one scan task on a single-row-group fixture file; at
    // any scale the final distinct-merge lands in one small-bytes
    // post-shuffle task AQE will not split on CPU). Independent legs
    // are separate stages of one job — they run CONCURRENTLY, each
    // column-pruned to its own column, and each leg's dedup carries one
    // column instead of the ×4 expansion (measured warm 1.2-1.5s →
    // ~0.5s at sf0.1). Values, schema and row set are identical.
    def leg(c: String) =
      Tables.orders(s, d)
        .agg(
          count_distinct(col(c)).as("ndv"),
          (count(lit(1)) - count(col(c))).as("n_null"),
          min(col(c)).cast("string").as("vmin"),
          max(col(c)).cast("string").as("vmax"))
        .select(lit(c).as("col_name"), col("ndv"), col("n_null"),
          col("vmin"), col("vmax"))
    leg("o_orderkey")
      .unionAll(leg("o_custkey"))
      .unionAll(leg("o_orderpriority"))
  }

  /** q_histogram: equi-depth 8-bucket histogram — the CBO selectivity
    * statistic next to [[analyzeStats]]' ndv/min/max. Boundaries are the
    * exact interpolated octiles of l_extendedprice (in cents) from the
    * distribution walk ([[GraftOps.groupQuantileTable]] — no per-group
    * value buffer, the shape that survives a billion-row column); the
    * 1-row boundary table broadcasts back and bucket assignment is a
    * pure comparison scan. Octile positions are (n−1)·i/8 — eighths are
    * binary-exact, so quantile_cont replays every boundary double and
    * every boundary-tie bucket decision.
    *
    * Boundaries come from [[GraftOps.rangedQuantileTable]] — the
    * two-phase distributed prefix sum, so no single-partition walk even
    * for an unbounded value domain (measured 6× faster than the
    * per-group walk on this global-quantile shape at sf0.1; the walk
    * remains the right tool for MANY-group quantiles, where its window
    * parallelizes across groups).
    */
  def histogram(s: SparkSession, d: String): DataFrame = {
    val c = Tables.lineitem(s, d).select(
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val bounds = GraftOps.rangedQuantileTable(c, col("cents"),
      (1 to 7).map(i => (s"b$i", i, 8)))
    val bucket = (1 to 7).foldLeft(lit(1).cast("int")) { (acc, i) =>
      acc + (col("cents") > col(s"b$i")).cast("int")
    }
    c.crossJoin(broadcast(bounds))
      .select(col("cents"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"))
  }

  /** q_quantile_ranged: the same exact octiles as [[histogram]]'s
    * boundaries, computed by the UNBOUNDED-DOMAIN path — the two-phase
    * repartitionByRange prefix sum ([[GraftOps.rangedQuantileTable]]).
    * Two independent implementations, one quantile_cont oracle: the
    * distribution walk and the ranged prefix sum must produce
    * bit-identical boundary doubles.
    */
  def quantileRanged(s: SparkSession, d: String): DataFrame =
    GraftOps.rangedQuantileTable(
      Tables.lineitem(s, d).select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents")),
      col("cents"), (1 to 7).map(i => (s"b$i", i, 8)))

  /** x_skew_audit: shuffle-skew pre-flight ([[GraftOps.skewAudit]]) over
    * the two planned event shuffle keys side by side — user_id (high
    * cardinality, balanced) vs event_type (5 keys: most buckets empty,
    * the hot ones unsplittable by repartitioning — the salting signal).
    */
  def skewAudit(s: SparkSession, d: String): DataFrame =
    GraftOps.skewAudit(Tables.events(s, d), col("user_id"), "user_id")
      .unionAll(
        GraftOps.skewAudit(Tables.events(s, d), col("event_type"),
          "event_type"))

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "x_skew_audit" -> skewAudit,
    "q_analyze_stats" -> analyzeStats,
    "q_histogram" -> histogram,
    "q_quantile_ranged" -> quantileRanged,
    "q_etl_zorder" -> zorderKeys,
    "q_join_bucket" -> joinBucketed,
    "q_etl_tsv" -> tsvRoundTrip,
    "q_etl_csv" -> csvRoundTrip,
    "q_etl_bulkload" -> bulkLoad,
    "q_etl_compact" -> compact,
    "q_etl_json" -> jsonRoundTrip,
    "q_etl_orc" -> orcRoundTrip,
    "q_idx_lookup" -> idxLookup,
    "q_etl_copytable" -> copyTable,
    "q_etl_multi_sink" -> multiSink,
    "q_etl_export" -> exportImport,
    "q_etl_wap" -> wapPublish
  )

  val oracle = Map(
    // The WAP gate's reader must resolve the FIRST (good) publish after
    // the broken second publish failed its audit — i.e. the nation
    // table byte-for-byte; any leakage of the half-table staging into
    // the read path breaks the hash.
    "q_etl_wap" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    // Skew-audit replay: same md5-derived bucket (first 8 hex digits mod
    // 32) over the key's string form, same count/distinct/share_ppm.
    "x_skew_audit" ->
      """WITH k AS (SELECT CAST(user_id AS VARCHAR) k FROM events
        |    WHERE user_id IS NOT NULL),
        |t AS (SELECT count(*) total FROM k),
        |a AS (SELECT 'user_id' key_name,
        |    CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT) % 32 bucket,
        |    count(*) n_rows, count(DISTINCT k) n_keys
        |  FROM k GROUP BY 2),
        |k2 AS (SELECT event_type k FROM events WHERE event_type IS NOT NULL),
        |t2 AS (SELECT count(*) total FROM k2),
        |a2 AS (SELECT 'event_type' key_name,
        |    CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT) % 32 bucket,
        |    count(*) n_rows, count(DISTINCT k) n_keys
        |  FROM k2 GROUP BY 2)
        |SELECT key_name, bucket, n_rows, n_keys,
        |  CAST(n_rows * 1000000 // total AS BIGINT) share_ppm
        |FROM a CROSS JOIN t
        |UNION ALL
        |SELECT key_name, bucket, n_rows, n_keys,
        |  CAST(n_rows * 1000000 // total AS BIGINT) share_ppm
        |FROM a2 CROSS JOIN t2""".stripMargin,
    "q_quantile_ranged" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) cents
        |  FROM lineitem)
        |SELECT
        |  quantile_cont(CAST(cents AS DOUBLE), 0.125) b1,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.250) b2,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.375) b3,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.500) b4,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.625) b5,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.750) b6,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.875) b7
        |FROM c""".stripMargin,
    "q_histogram" ->
      """WITH c AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) cents
        |  FROM lineitem),
        |q AS (SELECT
        |  quantile_cont(CAST(cents AS DOUBLE), 0.125) b1,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.250) b2,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.375) b3,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.500) b4,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.625) b5,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.750) b6,
        |  quantile_cont(CAST(cents AS DOUBLE), 0.875) b7
        |  FROM c)
        |SELECT 1 + CAST(cents > b1 AS INT) + CAST(cents > b2 AS INT)
        |     + CAST(cents > b3 AS INT) + CAST(cents > b4 AS INT)
        |     + CAST(cents > b5 AS INT) + CAST(cents > b6 AS INT)
        |     + CAST(cents > b7 AS INT) AS bucket,
        |  count(*) AS n_rows, min(cents) AS lo_cents, max(cents) AS hi_cents
        |FROM c, q GROUP BY 1""".stripMargin,
    "q_analyze_stats" ->
      """SELECT 'o_orderkey' AS col_name,
        |  count(DISTINCT o_orderkey) AS ndv,
        |  count(*) - count(o_orderkey) AS n_null,
        |  CAST(min(o_orderkey) AS VARCHAR) AS vmin,
        |  CAST(max(o_orderkey) AS VARCHAR) AS vmax FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(DISTINCT o_custkey),
        |  count(*) - count(o_custkey),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(DISTINCT o_orderpriority),
        |  count(*) - count(o_orderpriority),
        |  min(o_orderpriority), max(o_orderpriority) FROM orders""".stripMargin,

    // bit-for-bit Morton replay: correlated sum over the 21 bit
    // positions; sum() is HUGEINT in DuckDB, cast back.
    "q_etl_zorder" ->
      """WITH st AS (
        |  SELECT min(l_orderkey) mina, max(l_orderkey) maxa,
        |    min(l_partkey) minb, max(l_partkey) maxb FROM lineitem),
        |n AS (
        |  SELECT l_orderkey, l_partkey, l_linenumber,
        |    CAST((l_orderkey - mina) * 65535
        |      // greatest(1, maxa - mina) AS BIGINT) AS na,
        |    CAST((l_partkey - minb) * 65535
        |      // greatest(1, maxb - minb) AS BIGINT) AS nb
        |  FROM lineitem, st),
        |z AS (
        |  SELECT l_orderkey, l_partkey, l_linenumber,
        |    (SELECT CAST(sum((((na >> i) & 1) << (2*i))
        |       + (((nb >> i) & 1) << (2*i + 1))) AS BIGINT)
        |     FROM range(0, 16) t(i)) AS zval
        |  FROM n)
        |SELECT l_orderkey, l_partkey, l_linenumber, zval,
        |  CAST(zval // 1048576 AS BIGINT) AS zbucket
        |FROM z""".stripMargin,
    "q_join_bucket" ->
      """SELECT l_orderkey, o_orderpriority,
        |  CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) + 50) // 100
        |    AS BIGINT) / 100.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,
    "q_etl_tsv" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS INT) AS n_regionkey FROM nation""".stripMargin,
    "q_etl_csv" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey,
        |  n_name || ',"' || n_name AS tricky,
        |  CAST(n_regionkey AS INT) AS n_regionkey FROM nation""".stripMargin,
    "q_etl_bulkload" ->
      "SELECT * FROM part",
    "q_etl_compact" ->
      "SELECT * FROM lineitem",
    "q_etl_json" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q_etl_orc" ->
      "SELECT * FROM supplier",
    // The index is invisible in the result: the oracle is the DIRECT
    // predicate on the base table — a stale/lossy index fails the hash.
    "q_idx_lookup" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q_etl_copytable" ->
      """SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_totalprice > 150000.0""".stripMargin,
    "q_etl_multi_sink" ->
      "SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'click'",
    "q_etl_export" ->
      "SELECT * FROM customer"
  )
}
