package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Runtime-object proof of scan pruning: PlanSpec pins `ReadSchema` /
  * `PushedFilters` as plan STRINGS, which asserts what the optimizer
  * printed. Here the assertions read the executed `FileSourceScanExec`
  * node itself — `requiredSchema` is the struct the vectorized parquet
  * reader is constructed from (it physically cannot decode a column not
  * listed there), and `dataFilters` are what gets compiled into the
  * row-group/page-level parquet filters. The difference between "the
  * plan text says 2 columns" and "the reader object was built for 2
  * columns" — the latter is what a 100-TB scan bill is made of.
  *
  * (A task-metrics bytesRead comparison was tried first and measured
  * 17KB for a 10.8MB file on BOTH the full and pruned scans — the
  * Hadoop FS statistics this path relies on do not capture the
  * vectorized reader's data-page reads in this environment, so byte
  * accounting is not a usable signal here.)
  */
class IoPruningSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    // sparkPlan, not executedPlan: AQE wraps stages in QueryStageExec
    // leaves that hide their subtrees from collect, and requiredSchema /
    // dataFilters are fixed at planning time anyway
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  test("column pruning: the executed reader is built for exactly the used columns") {
    val pruned = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
    val ss = scans(pruned)
    assert(ss.nonEmpty, "no FileSourceScanExec found")
    val readCols = ss.head.requiredSchema.fieldNames.toSet
    assert(readCols === Set("l_returnflag", "l_quantity"),
      s"reader built for $readCols — pruning did not reach the scan object")
  }

  test("filter pushdown: the executed scan carries the data filter") {
    val ranged = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") < 100)
      .select(sum(col("l_quantity")).as("q"))
    val ss = scans(ranged)
    assert(ss.nonEmpty, "no FileSourceScanExec found")
    val s = ss.head
    assert(s.dataFilters.nonEmpty,
      "no data filters on the scan — the range predicate stayed in a Filter node")
    assert(s.requiredSchema.fieldNames.toSet === Set("l_orderkey", "l_quantity"),
      s"reader built for ${s.requiredSchema.fieldNames.toSet}")
  }
}
