package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule must turn a NAIVELY-written constant-width
  * range join into a banded equi-join: no nested-loop stage in the
  * physical plan, identical results to both the naive semantics and the
  * hand-banded formulation.
  */
class BandedRangeJoinRuleSpec extends SparkSpec {

  private def naiveJoin = {
    val p = Tables.part(spark, sf)
    val sup = Tables.supplier(spark, sf)
    p.join(sup,
        col("p_retailprice").between(col("s_acctbal"), col("s_acctbal") + 50.0))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_parts"))
  }

  test("naive range join is auto-rewritten away from nested-loop") {
    val df = naiveJoin
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_band"),
      "rule did not fire:\n" + optimized.take(800))
  }

  test("rewritten join returns exactly the naive-semantics rows") {
    // independent ground truth via a filtered cross product on a SMALL
    // slice (rule doesn't fire without the between-shape, so disable by
    // using an explicit cross join + filter)
    val p = Tables.part(spark, sf).select(col("p_partkey"), col("p_retailprice"))
      .filter(col("p_partkey") <= 200)
    val sup = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_acctbal"))
    val truth = p.crossJoin(sup)
      .filter(col("p_retailprice") >= col("s_acctbal") &&
        col("p_retailprice") <= col("s_acctbal") + 50.0)
      .select(col("p_partkey"), col("s_suppkey"))
    val viaRule = p.join(sup,
        col("p_retailprice").between(col("s_acctbal"), col("s_acctbal") + 50.0))
      .select(col("p_partkey"), col("s_suppkey"))
    assert(viaRule.except(truth).isEmpty && truth.except(viaRule).isEmpty)
    assert(viaRule.count() === truth.count())
  }
}
