package graft

import graft.api.GraftOps
import org.apache.spark.sql.functions._

/** Opt-in driver-longevity soak (set GRAFT_SOAK_TEST=1): a resident
  * driver serving thousands of DISTINCT plans must hold its two known
  * retention surfaces bounded — the SQL status store's per-execution
  * plan strings (the round-9 suite-length OOM: unbounded explainString
  * retention inside AQE's onUpdatePlan, fixed by the Sessions.scala
  * retainedExecutions/maxPlanStringLength caps) and the quantile walks'
  * per-invocation persisted frames (bounded by GraftOps' tracked-cache
  * LRU). This spec re-creates both leak shapes and asserts the caps as
  * red tests, so the next retention regression fails here instead of
  * OOM-ing a production driver mid-flight.
  *
  *   GRAFT_SOAK_TEST=1 sbt "testOnly graft.SoakSpec"
  */
class SoakSpec extends SparkSpec {

  private def enabled = sys.env.get("GRAFT_SOAK_TEST").contains("1")

  test("status store stays bounded over 3000 distinct plans") {
    assume(enabled, "set GRAFT_SOAK_TEST=1 to run")
    val rt = Runtime.getRuntime
    def usedMb: Long = {
      System.gc(); (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
    }
    val before = usedMb
    var i = 0
    while (i < 3000) {
      // a DISTINCT literal per iteration defeats any plan/string
      // dedup — exactly the shape that accumulated before the cap
      spark.range(64)
        .select((col("id") + lit(i)).as("x"))
        .groupBy(pmod(col("x"), lit(8)).as("g")).agg(sum(col("x")).as("s"))
        .collect()
      i += 1
    }
    val execs = spark.sharedState.statusStore.executionsCount()
    assert(execs <= 64,
      s"status store retained $execs executions — the retainedExecutions " +
        "cap is not holding")
    val grown = usedMb - before
    assert(grown < 1500,
      s"driver heap grew $grown MiB over 3000 plans — a retention " +
        "surface is accumulating")
  }

  test("quantile-walk caches stay bounded over 200 changing inputs") {
    assume(enabled, "set GRAFT_SOAK_TEST=1 to run")
    import spark.implicits._
    val baseline = spark.sparkContext.getPersistentRDDs.size
    var i = 0
    while (i < 200) {
      // each input is plan-distinct, so every call persists a fresh
      // ranged frame; the tracked-cache LRU must evict, not accumulate
      val df = Seq.tabulate(50)(j => ("g" + (j % 3), (j + i).toDouble, 1.0))
        .toDF("g", "v", "w")
      GraftOps.weightedMedian(df, col("g"), col("v"), col("w"),
        parallelWalk = true).collect()
      i += 1
    }
    val persisted = spark.sparkContext.getPersistentRDDs.size
    assert(persisted - baseline <= 70,
      s"persistent RDD count grew from $baseline to $persisted over 200 " +
        "quantile calls — the tracked-cache LRU is not evicting")
  }
}
