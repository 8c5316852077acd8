package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan / source tier (SURVEY.md §2.1).
  *
  * Reference semantics: TableInputFormat full/range scans with
  * start/stop-row region pruning, Scan.addColumn projection, Get point
  * lookups, MultiTableInputFormat unions, TableSnapshotInputFormat direct
  * file reads. Spark analogs rely on parquet row-group min/max pruning for
  * ranges (`PushedFilters` in explain) and Catalyst column pruning for
  * projections (`ReadSchema`). At 100 TB the same plans hold: file splits
  * replace region splits, and the pushed predicates keep the scan I/O
  * proportional to selectivity, not table size.
  */
object ScanQueries extends QueryPack {

  /** Deterministic per-sf layout dir, written ONCE per JVM (presence of
    * parquet's _SUCCESS marker = complete): a fresh temp dir per
    * invocation would rewrite the whole table every time the query
    * lambda runs (Bench reps, Verify, PlanSpec) and leak a copy per run.
    */
  private def partitionedOrders(s: SparkSession, d: String): String = {
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_part_" + Integer.toHexString(d.hashCode))
    if (!new java.io.File(out, "_SUCCESS").exists()) {
      Tables.orders(s, d).write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(out.toString)
    }
    out.toString
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    // Hive-style partition pruning: the table is laid out as one
    // directory per o_orderpriority, and an equality predicate on the
    // partition column prunes at the DIRECTORY listing — zero I/O for
    // non-matching partitions, before row-group stats even load
    // (`PartitionFilters` in explain, pinned in PlanSpec). At 100 TB
    // this is the difference between a metadata operation and a scan:
    // date/source/tenant partitioning makes selective reads O(selected
    // partitions), and the pruning composes with the row-group pushdown
    // q_scan_range pins.
    // Explicit schema on the read (incl. the partition column): never
    // infer — and an all-pruned/empty layout must still resolve.
    "q_scan_partition" -> ((s, d) =>
      s.read.schema(Tables.orders(s, d).schema)
        .parquet(partitionedOrders(s, d))
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))),


    // Full table scan: every row, every column (one split per file).
    "q_scan_full" -> ((s, d) =>
      Tables.part(s, d)),

    // Rowkey range scan: predicate pushed to parquet row-group stats —
    // the analog of start/stop-row region pruning.
    "q_scan_range" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") >= 100 && col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"))),

    // Projection scan: only named columns are read (ReadSchema pruning).
    "q_scan_proj" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))),

    // Point lookup (Get): unique-key equality, pushed to the scan.
    "q_point_get" -> ((s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") === 42L)),

    // Multi-table input: two sources normalized into one logical stream.
    "q_multi_src" -> ((s, d) => {
      val c = Tables.customer(s, d).select(
        col("c_custkey").as("acct_key"), col("c_name").as("acct_name"),
        col("c_acctbal").as("acctbal"), lit("customer").as("src"))
      val su = Tables.supplier(s, d).select(
        col("s_suppkey").as("acct_key"), col("s_name").as("acct_name"),
        col("s_acctbal").as("acctbal"), lit("supplier").as("src"))
      c.unionByName(su)
    }),

    // Snapshot scan: direct file read bypassing the serving layer —
    // Spark's default mode for parquet.
    "q_snapshot_src" -> ((s, d) =>
      Tables.region(s, d))
  )

  val oracle = Map(
    "q_scan_partition" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q_scan_full" ->
      "SELECT * FROM part ORDER BY p_partkey",
    "q_scan_range" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem WHERE l_orderkey >= 100 AND l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scan_proj" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_point_get" ->
      "SELECT * FROM orders WHERE o_orderkey = 42",
    "q_multi_src" ->
      """SELECT c_custkey AS acct_key, c_name AS acct_name,
        |       c_acctbal AS acctbal, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey, s_name, s_acctbal, 'supplier' FROM supplier
        |ORDER BY src, acct_key""".stripMargin,
    "q_snapshot_src" ->
      "SELECT * FROM region ORDER BY r_regionkey"
  )
}
