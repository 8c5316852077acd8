package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryPack. Each pack covers one tier of the operator
  * inventory in SURVEY.md §2; keys are the q_* / x_* / s_* IDs from there.
  */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    ops.ScanQueries,
    ops.FilterQueries,
    ops.JoinQueries,
    ops.AggQueries,
    ops.WindowQueries,
    ops.SetQueries,
    ops.ScalarQueries,
    ops.LlmQueries,
    ops.CurateQueries,
    ops.EtlQueries,
    ops.StreamQueries,
    ops.TpchQueries,
    ops.SqlQueries,
    ops.GraphQueries,
    ops.AnalyticsQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.AggQueries.groupAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
