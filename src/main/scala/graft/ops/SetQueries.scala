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

    "q_sync_diff" -> syncDiff
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
