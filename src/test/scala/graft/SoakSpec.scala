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

  test("concurrent mixed-query serving: bit-stable vs serial, bounded retention") {
    assume(enabled, "set GRAFT_SOAK_TEST=1 to run")
    // TUNING.md's serving story is a RESIDENT driver taking queries from
    // many threads against one session. The shared mutable surfaces are
    // the CacheManager (persistOnce races: two threads may both see
    // storageLevel NONE), the tracked-cache LRU (one thread can evict a
    // frame another is mid-reading — must recompute, not corrupt), the
    // thread-local codec pools, and the status store. Mix of exactly
    // those shapes; every thread runs every query and must reproduce the
    // serial result bit-for-bit.
    val mixed = Seq(
      "q_group_agg",      // plain codegen agg (control)
      "q_topk_group",     // window + limit
      "q_agg_wmedian",    // tracked-cache LRU quantile walks
      "x_dedup_near",     // persistOnce'd shingle table
      "x_lsh_recall",     // SHARED cacheOnce subtree feeding two legs
      "x_sim_brute",      // custom codegen CosineSim + typed Aggregator
      "x_mm_phash_dedup", // thread-local ImageIO codec pool
      "q_window_rank")    // range repartition + window
    def canon(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(_.toString).sorted.toSeq
    val serial = mixed.map(n => n -> canon(n)).toMap
    val threads = 8
    val rounds = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      val tasks = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var r = 0
            while (r < rounds) {
              // per-thread rotation: every query runs concurrently with
              // every other at some point in the schedule
              mixed.indices.foreach { i =>
                val name = mixed((i + t) % mixed.length)
                try {
                  val got = canon(name)
                  if (got != serial(name))
                    failures.add(s"$name diverged from serial on thread $t round $r")
                } catch {
                  case e: Throwable =>
                    failures.add(s"$name threw on thread $t round $r: ${e.getMessage}")
                }
              }
              r += 1
            }
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(failures.isEmpty,
      s"concurrent serving faults: ${failures.toArray.mkString("; ")}")
    val execs = spark.sharedState.statusStore.executionsCount()
    assert(execs <= 64,
      s"status store retained $execs executions under concurrent serving")
    val persisted = spark.sparkContext.getPersistentRDDs.size
    assert(persisted <= 100,
      s"$persisted RDDs left persisted after the concurrent mix — a " +
        "cache surface is accumulating under contention")
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
