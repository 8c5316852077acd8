package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Hadoop-Counters analog (SURVEY.md §2.4 "Counters"): job-level metric
  * side channels. Spark's two mechanisms: `observe()` metrics flowing
  * through the plan, and LongAccumulators updated by tasks.
  */
class CountersSpec extends SparkSpec {

  test("observe() reports row and sum counters alongside the job result") {
    val obs = new Observation("ingest_metrics")
    val li = Tables.lineitem(spark, sf)
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum(col("l_quantity")).as("qty_seen"))
    val n = li.count()
    val metrics = obs.get
    assert(metrics("rows_seen") === n)
    assert(metrics("qty_seen").asInstanceOf[Double] > 0.0)
  }

  test("accumulators count per-task events like MR counters") {
    val acc = spark.sparkContext.longAccumulator("bad_rows")
    import spark.implicits._
    val flags = Tables.lineitem(spark, sf)
      .select(col("l_discount")).as[Double]
      .map { d => if (d > 0.08) acc.add(1); d }
    flags.count() // run the job; tasks update the accumulator
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_discount") > 0.08).count()
    assert(acc.value === expected)
  }
}
