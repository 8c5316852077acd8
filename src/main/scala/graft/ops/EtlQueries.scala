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

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

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
    Tables.events(s, d)
      .withColumn("route", col("event_type"))
      .write.mode("overwrite").partitionBy("route").parquet(out)
    s.read.parquet(out)
      .filter(col("route") === "click")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
  }

  /** Export/Import: lossless table → files → table round-trip, including
    * the binary+struct multimodal payload (types survive parquet).
    */
  def exportImport(s: SparkSession, d: String): DataFrame = {
    val out = tmp("graft_export")
    Tables.customer(s, d).write.mode("overwrite").parquet(out)
    s.read.parquet(out)
  }

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "q_etl_tsv" -> tsvRoundTrip,
    "q_etl_bulkload" -> bulkLoad,
    "q_etl_copytable" -> copyTable,
    "q_etl_multi_sink" -> multiSink,
    "q_etl_export" -> exportImport
  )

  val oracle = Map(
    "q_etl_tsv" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS INT) AS n_regionkey FROM nation""".stripMargin,
    "q_etl_bulkload" ->
      "SELECT * FROM part",
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
