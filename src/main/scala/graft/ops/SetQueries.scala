package graft.ops

import graft.{QueryPack, Tables}
import graft.api.GraftOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set-operation tier (SURVEY.md §2.6): union/except/intersect plus the
  * SyncTable pattern — compare two tables by RANGE-BUCKET HASHES first so
  * only differing buckets would ever need row-level repair. At 100 TB the
  * bucket summaries are a few KB per side regardless of table size; the
  * full-row compare never happens for in-sync ranges.
  */
object SetQueries extends QueryPack {

  /** SyncTable: source = orders; target = a deterministic "replica" that
    * lost every 97th order. Only exactly-representable columns (longs/
    * strings) go into the fingerprint — double-to-string formatting
    * differs across engines.
    */
  def syncDiff(s: SparkSession, d: String): DataFrame = {
    val src = Tables.orders(s, d)
    val tgt = src.filter(pmod(col("o_orderkey"), lit(97L)) =!= 0)
    GraftOps.syncDiff(src, tgt, bucketKey = col("o_orderkey"),
      fingerprint = concat_ws("|", col("o_orderkey"), col("o_orderstatus")),
      buckets = 32)
      .select(col("bucket"), col("src_count"), col("tgt_count"),
        col("src_hash"), col("tgt_hash"))
  }

  /** q_cdc_diff: row-level changelog between two snapshots — the
    * companion to [[syncDiff]]'s bucket digests: once a bucket
    * disagrees, this emits the actual INSERT/UPDATE/DELETE rows. The
    * target snapshot is a deterministic mutation of orders (both
    * engines synthesize it — the piiScrub discipline): every 97th key
    * deleted, every 101st surviving key's priority rewritten, a clone of
    * every 103rd key inserted at key -(k+1). Negation-with-offset is the
    * disjoint insert namespace at ANY scale (orderkeys are >= 0, so
    * -(k+1) is strictly negative and can never collide with a genuine
    * key — a fixed "+20M" offset would collide once the key domain
    * clears 20M, ~sf4, and plain -k collides on key 0; either collision
    * duplicates keys and fans out the full-outer join). ONE full-outer
    * equi-join on the key
    * classifies every row; fingerprints use exactly-representable
    * columns only. At 100 TB each side shuffles once on its key and
    * AQE handles the skewless hash join — never a row-pair product.
    */
  def cdcDiff(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
    val src = base.select(col("o_orderkey"),
      concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("s_fp"))
    val tgt = base.filter(pmod(col("o_orderkey"), lit(97L)) =!= 0)
      .select(col("o_orderkey"),
        concat_ws("|", col("o_orderstatus"),
          when(pmod(col("o_orderkey"), lit(101L)) === 0, lit("RUSH"))
            .otherwise(col("o_orderpriority"))).as("t_fp"))
      .unionByName(base.filter(pmod(col("o_orderkey"), lit(103L)) === 0)
        .select((-col("o_orderkey") - 1).as("o_orderkey"),
          concat_ws("|", col("o_orderstatus"), col("o_orderpriority"))
            .as("t_fp")))
    src.join(tgt, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        when(col("s_fp").isNull, lit("I"))
          .when(col("t_fp").isNull, lit("D"))
          .when(col("s_fp") =!= col("t_fp"), lit("U")).as("change_type"))
      .filter(col("change_type").isNotNull)
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    // UNION (distinct): nation keys present in either side.
    "q_union" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").cast("int")))
        .distinct()),

    // EXCEPT: customers that never ordered (SyncTable source∖target shape).
    "q_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).select(col("o_custkey")))),

    // INTERSECT: customers present on both sides.
    "q_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .intersect(Tables.orders(s, d).select(col("o_custkey")))),

    "q_sync_diff" -> syncDiff,
    "q_cdc_diff" -> cdcDiff
  )

  val oracle = Map(
    "q_union" ->
      """SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS INT) FROM supplier""".stripMargin,
    "q_except" ->
      "SELECT c_custkey AS custkey FROM customer EXCEPT SELECT o_custkey FROM orders",
    "q_intersect" ->
      "SELECT c_custkey AS custkey FROM customer INTERSECT SELECT o_custkey FROM orders",
    // CAST(sum(..) AS BIGINT): DuckDB widens sum(BIGINT) to HUGEINT, which
    // the driver's pandas comparator collapses to float64 and stringifies
    // differently than Spark's exact long — cast back before comparing.
    // FULL OUTER + coalesce mirrors GraftOps.syncDiff's one-sided-bucket
    // semantics.
    "q_cdc_diff" ->
      """WITH src AS (
        |  SELECT o_orderkey,
        |    o_orderstatus || '|' || o_orderpriority AS s_fp
        |  FROM orders),
        |tgt AS (
        |  SELECT o_orderkey,
        |    o_orderstatus || '|' ||
        |      CASE WHEN o_orderkey % 101 = 0 THEN 'RUSH'
        |           ELSE o_orderpriority END AS t_fp
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey - 1,
        |    o_orderstatus || '|' || o_orderpriority
        |  FROM orders WHERE o_orderkey % 103 = 0)
        |SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |  CASE WHEN s.o_orderkey IS NULL THEN 'I'
        |       WHEN t.o_orderkey IS NULL THEN 'D'
        |       WHEN s_fp <> t_fp THEN 'U' END AS change_type
        |FROM src s FULL OUTER JOIN tgt t ON s.o_orderkey = t.o_orderkey
        |WHERE (s.o_orderkey IS NULL OR t.o_orderkey IS NULL
        |       OR s_fp <> t_fp)""".stripMargin,
    "q_sync_diff" ->
      """WITH src AS (
        |  SELECT o_orderkey % 32 AS bucket, count(*) AS src_count,
        |    CAST(sum(CAST(('0x' || substr(md5(concat_ws('|', o_orderkey, o_orderstatus)), 1, 8)) AS BIGINT)) AS BIGINT) AS src_hash
        |  FROM orders GROUP BY 1),
        |tgt AS (
        |  SELECT o_orderkey % 32 AS bucket, count(*) AS tgt_count,
        |    CAST(sum(CAST(('0x' || substr(md5(concat_ws('|', o_orderkey, o_orderstatus)), 1, 8)) AS BIGINT)) AS BIGINT) AS tgt_hash
        |  FROM orders WHERE o_orderkey % 97 <> 0 GROUP BY 1)
        |SELECT bucket,
        |  coalesce(src_count, 0) AS src_count, coalesce(tgt_count, 0) AS tgt_count,
        |  coalesce(src_hash, 0) AS src_hash, coalesce(tgt_hash, 0) AS tgt_hash
        |FROM src FULL OUTER JOIN tgt USING (bucket)
        |WHERE coalesce(src_count, 0) <> coalesce(tgt_count, 0)
        |   OR coalesce(src_hash, 0) <> coalesce(tgt_hash, 0)""".stripMargin
  )
}
