package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * In the reference's domain these are HBase tables read via
  * TableInputFormat (one split per region); here every table is a parquet
  * directory and Spark's FileSourceScanExec provides splits, columnar
  * vectorized reads, predicate pushdown and column pruning for free
  * (SURVEY.md §1.2, §2.1).
  */
object Tables {
  /** Memoized per (session, path): `spark.read.parquet` fires a
    * footer-read Spark job at relation-build time, so an unmemoized
    * loader costs every query build one job per table it touches. The
    * fixtures are read-only (TESTDATA.md), so the resolved relation
    * never goes stale; at 100 TB this is the difference between "plan
    * build is metadata-free" and "every plan build lists the lake".
    */
  private val loaded =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // evict entries whose session has stopped — a long-lived JVM cycling
    // sessions must not pin dead sessions (and their resolved plans)
    loaded.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    loaded.getOrElseUpdate((spark, s"$dir/$name.parquet"),
      spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Normalize the events `ts` column to TimestampType regardless of how
    * the fixture encoded it — the generator has shipped both
    * TIMESTAMP(NANOS) (which `nanosAsLong` delivers as a long of nanos)
    * and plain timestamp[us] (which Spark reads as TIMESTAMP_NTZ under
    * `parquet.inferTimestampNTZ`). Dispatch on the RESOLVED dtype so an
    * ingest never breaks when the fixture schema shifts again:
    *  - LongType: nanos → µs via integer `div` (not `/`, which goes
    *    through double and loses precision at 1e18 nanos); fixture
    *    timestamps are µs-aligned so the truncation is lossless.
    *  - TIMESTAMP_NTZ: cast to TimestampType — the session timezone is
    *    pinned to UTC (Sessions.scala / build.sbt), so the cast is
    *    value-identical and matches DuckDB's native µs TIMESTAMP read.
    *  - TimestampType: already what downstream expects; pass through.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — extend Tables.normalizeTs")
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(t(spark, dir, "events"))

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** One group of registered queries + their DuckDB oracle SQL.
  * SparkEntry unions all packs; keys must be globally unique.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-runnable ANSI SQL per query key. Omit keys whose semantics are
    * not SQL-expressible (driver then records a weaker rows-only check).
    */
  def oracle: Map[String, String]
}
