package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in multi-executor-JVM proof (set GRAFT_CLUSTER_TEST=1):
  *
  *   GRAFT_CLUSTER_TEST=1 sbt "testOnly graft.ClusterSpec"
  *
  * Everything else in the suite runs on `local[n]` — one JVM, where a
  * closure that accidentally captures a non-serializable driver object,
  * a custom Expression/Aggregator class missing from the executor
  * classpath, or state that silently lives in driver memory all pass
  * undetected. `local-cluster[2,2,1536]` launches two REAL executor
  * JVMs (separate processes via the standalone Worker), so this suite
  * is the closest single-box approximation of the 1000-executor target:
  * task binaries, broadcasts, accumulators/observe metrics, streaming
  * state stores and shuffle blocks all cross process boundaries.
  *
  * Three claims are pinned:
  *  1. PARITY — a representative query per serialization surface
  *     (codegen agg, broadcast join, shuffle join, window, recursive
  *     CTE, observe-metric cap, iterative lineage-truncated loop,
  *     custom codegen CosineSim Expression, typed TopKByScore
  *     Aggregator, MinHash LSH, typed mapPartitions harness) returns
  *     bit-identical rows on the cluster and on local[4].
  *  2. DURABILITY — `localCheckpoint` genuinely loses its blocks when
  *     every executor dies (the failure mode GraftOps.truncateLineage
  *     documents), while a reliable `checkpoint` to a shared dir — the
  *     exact call truncateLineage makes when GRAFT_CHECKPOINT_DIR is
  *     set — survives the same total executor loss.
  *  3. STREAMING STATE — flatMapGroupsWithState over RocksDB keeps
  *     per-key state correct when the state store lives in executor
  *     JVMs, not the driver.
  */
class ClusterSpec extends AnyFunSuite with BeforeAndAfterAll {
  private def enabled = sys.env.get("GRAFT_CLUSTER_TEST").contains("1")
  /** GRAFT_CLUSTER_FULL=1 widens the parity set from the 11
    * representative serialization surfaces to EVERY registered query —
    * the full 234-entry sweep takes minutes instead of seconds, so it is
    * a separate opt-in, but it is the strongest distributed-correctness
    * claim the suite can make: nothing in the library silently depends
    * on single-JVM execution.
    */
  private def fullSweep = sys.env.get("GRAFT_CLUSTER_FULL").contains("1")
  private val sf = "/root/testdata/sf0.001"

  /** One query per distinct thing that must serialize across JVMs. */
  private val representativeQueries = Seq(
    "q_group_agg",     // codegen partial+final aggregate
    "q_join_bcast",    // TorrentBroadcast of the dim table
    "q_join_shuffle",  // shuffle blocks fetched across processes
    "q_window_rank",   // window exec after a range repartition
    "q_sql_recursive", // recursive CTE union loop
    "q_basket",        // observe() metrics = accumulators from executors
    "q_pagerank",      // iterative loop + localCheckpoint on executors
    "x_sim_brute",     // custom codegen CosineSim + typed TopKByScore
    "x_dedup_near",    // MinHash/LSH over xxhash64 permutations
    "x_dedup_cluster", // pointer-jumping loop, lineage truncation
    "x_multimodal",    // typed mapPartitions decode harness
    "x_mm_phash_dedup") // thread-local ImageIO codecs on executor JVMs

  private val parityQueries: Seq[String] =
    if (fullSweep) SparkEntry.queries.keys.toSeq.sorted
    else representativeQueries

  private var expected: Map[String, Seq[String]] = Map.empty
  private var cluster: SparkSession = _

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** PIDs of live executor JVMs, by scanning /proc/&#42;/cmdline directly.
    * ProcessHandle.info().commandLine() silently truncates long command
    * lines, and once the executor classpath carries the scalatest jars
    * the `CoarseGrainedExecutorBackend` main-class token lands past the
    * truncation point — the raw proc read has no such cap.
    */
  private def executorPids(): Seq[Long] = {
    val proc = new java.io.File("/proc")
    proc.listFiles((_, n) => n.forall(_.isDigit)).toSeq.flatMap { d =>
      try {
        val cmd = new String(java.nio.file.Files.readAllBytes(
          d.toPath.resolve("cmdline")))
        if (cmd.contains("CoarseGrainedExecutorBackend")) Some(d.getName.toLong)
        else None
      } catch { case _: Exception => None } // process exited mid-scan
    }
  }

  private def awaitExecutors(n: Int, timeoutMs: Long = 90000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (executorPids().size < n && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    assert(executorPids().size >= n,
      s"cluster never reached $n live executor JVMs")
  }

  /** Forcibly kill every executor JVM. The standalone Master relaunches
    * replacements (the app still wants cores), so the session stays
    * usable — but every block the dead executors held is gone, which is
    * the point.
    */
  private def killAllExecutors(): Unit = {
    val pids = executorPids()
    assert(pids.nonEmpty, "no executor JVMs found to kill")
    pids.foreach(pid => ProcessHandle.of(pid).ifPresent(_.destroyForcibly()))
    val deadline = System.currentTimeMillis() + 30000
    while (executorPids().exists(pids.contains) &&
      System.currentTimeMillis() < deadline) Thread.sleep(250)
    awaitExecutors(1) // at least one replacement registered
  }

  override def beforeAll(): Unit = if (enabled) {
    // Phase 1: expected answers from the plain single-JVM session every
    // other suite uses. Stop it so the cluster context can own the JVM.
    val local = Sessions.build()
    expected = parityQueries.map { n =>
      val r = n -> canon(SparkEntry.queries(n)(local, sf))
      if (fullSweep) local.catalog.clearCache()
      r
    }.toMap
    local.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // Phase 2: two real executor JVMs. They need the graft classes (for
    // task binaries referencing CosineSim/TopKByScore/processors), the
    // scalatest jars (a lambda defined inside this spec deserializes
    // through the spec class, whose superclasses live in scalatest),
    // and the same JDK-17 --add-opens the driver gets from build.sbt —
    // spark-submit injects these, a Worker-launched executor does not.
    // NOT the whole driver classpath: ~300 /opt/spark jar entries blow
    // past the Worker's executor launch command limit and the executor
    // never comes up.
    val testJars = sys.props("java.class.path")
      .split(java.io.File.pathSeparator)
      .filter(p => p.contains("scalatest") || p.contains("scalactic") ||
        p.contains("scalacheck"))
    val classes = (Seq("target/scala-2.13/classes",
      "target/scala-2.13/test-classes")
      .map(p => new java.io.File(p).getAbsolutePath) ++ testJars)
      .mkString(java.io.File.pathSeparator)
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    cluster = Sessions.build(
      master = "local-cluster[2,2,1536]",
      extraConfigs = Map(
        "spark.executor.extraClassPath" -> classes,
        "spark.executor.extraJavaOptions" -> addOpens))
    awaitExecutors(2)
  }

  override def afterAll(): Unit = if (cluster != null) {
    cluster.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  parityQueries.foreach { name =>
    test(s"cluster parity: $name matches local[4] bit-for-bit") {
      assume(enabled, "set GRAFT_CLUSTER_TEST=1 to run")
      assert(canon(SparkEntry.queries(name)(cluster, sf)) === expected(name))
      // the 234-query sweep would otherwise accumulate every cacheOnce
      // table in 1.5GB executors; the 11-query run keeps its caches
      if (fullSweep) cluster.catalog.clearCache()
    }
  }

  test("cluster durability: localCheckpoint dies with its executors") {
    assume(enabled, "set GRAFT_CLUSTER_TEST=1 to run")
    // Lineage is truncated, blocks live only in executor memory/disk —
    // total executor loss must make downstream reads FAIL, not silently
    // recompute. This is the documented hazard that
    // GraftOps.truncateLineage's reliable mode exists to close.
    val df = cluster.range(0, 50000).repartition(8)
      .selectExpr("id", "id % 7 AS k").localCheckpoint(true)
    assert(df.count() === 50000) // materialized while executors live
    killAllExecutors()
    val e = intercept[Exception] {
      df.groupBy("k").count().collect()
    }
    assert(e.getMessage != null)
  }

  test("cluster durability: reliable checkpoint survives total executor loss") {
    assume(enabled, "set GRAFT_CLUSTER_TEST=1 to run")
    // The exact call truncateLineage makes when GRAFT_CHECKPOINT_DIR is
    // set: checkpoint files land on the shared filesystem, so freshly
    // relaunched executors can serve the truncated table.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cluster_ckpt").toString
    cluster.sparkContext.setCheckpointDir(dir)
    val df = cluster.range(0, 50000).repartition(8)
      .selectExpr("id", "id % 7 AS k").checkpoint(true)
    val before = canon(df.groupBy("k").count())
    killAllExecutors()
    assert(canon(df.groupBy("k").count()) === before)
  }

  test("cluster resilience: executor killed mid-query, answer still exact") {
    assume(enabled, "set GRAFT_CLUSTER_TEST=1 to run")
    // The recovery path a 1000-executor deployment exercises daily: a
    // worker dies holding finished map outputs, the scheduler refetches/
    // recomputes, and the job completes with the RIGHT answer — not a
    // partial one. Closed-form oracle so nothing is recomputed locally:
    // sum(id) over [0, n) = n(n-1)/2, and n % k == 0 distinct keys.
    val n = 400000000L
    val k = 100000L
    val agg = cluster.range(0, n, 1, 64)
      .selectExpr(s"id % $k AS k", "id")
      .groupBy("k").agg(sum("id").as("s"))
      .agg(sum(col("s")).as("total"), count(lit(1)).as("groups"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val result = Future(agg.collect())
    val tracker = cluster.sparkContext.statusTracker
    val deadline = System.currentTimeMillis() + 60000
    while (tracker.getActiveJobIds().isEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(tracker.getActiveJobIds().nonEmpty, "job never started")
    Thread.sleep(500) // let map tasks finish on both executors
    val victim = executorPids().head
    ProcessHandle.of(victim).ifPresent(_.destroyForcibly())
    val row = Await.result(result, 180.seconds).head
    assert(row.getLong(0) === n * (n - 1) / 2)
    assert(row.getLong(1) === k)
  }

  test("cluster streaming: RocksDB state survives total executor loss") {
    assume(enabled, "set GRAFT_CLUSTER_TEST=1 to run")
    // Executor-level WALPlayer analog: per-key state checkpoints to the
    // shared dir, so when every executor holding a RocksDB instance dies
    // between batches, replacements reload the store from the checkpoint
    // and the running counts CONTINUE — they don't restart from zero.
    val spark = cluster
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cluster_stream_ckpt").toString
    try {
      def ts(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")
      val in = MemoryStream[Ev]
      val counted = in.toDS()
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[Long, (Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
            val cnt = state.getOption.getOrElse(0L) + evs.size
            state.update(cnt)
            Iterator((user, cnt))
        }.toDF("user_id", "running_n")
      val q = counted.writeStream.format("memory")
        .queryName("cluster_state_loss").outputMode("append")
        .option("checkpointLocation", ckpt).start()
      in.addData(Ev(1, ts("10:00"), 7, "click", 1.0, "{}"),
        Ev(2, ts("10:01"), 7, "click", 1.0, "{}"),
        Ev(3, ts("10:01"), 9, "click", 1.0, "{}"))
      q.processAllAvailable()
      killAllExecutors()
      in.addData(Ev(4, ts("10:02"), 7, "buy", 2.0, "{}"))
      q.processAllAvailable(); q.stop()
      val got = spark.table("cluster_state_loss")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((7L, 2L), (9L, 1L), (7L, 3L)),
        s"state must survive executor loss, not restart at zero: $got")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("cluster streaming: RocksDB state lives in executor JVMs") {
    assume(enabled, "set GRAFT_CLUSTER_TEST=1 to run")
    val spark = cluster
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      def ts(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")
      val in = MemoryStream[Ev]
      val counted = in.toDS()
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[Long, (Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
            val n = state.getOption.getOrElse(0L) + evs.size
            state.update(n)
            Iterator((user, n))
        }.toDF("user_id", "running_n")
      val q = counted.writeStream.format("memory")
        .queryName("cluster_state_tbl").outputMode("append").start()
      in.addData(Ev(1, ts("10:00"), 7, "click", 1.0, "{}"),
        Ev(2, ts("10:01"), 7, "click", 1.0, "{}"),
        Ev(3, ts("10:01"), 9, "click", 1.0, "{}"))
      q.processAllAvailable()
      in.addData(Ev(4, ts("10:02"), 7, "buy", 2.0, "{}"))
      q.processAllAvailable(); q.stop()
      val got = spark.table("cluster_state_tbl")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((7L, 2L), (9L, 1L), (7L, 3L)),
        s"per-user running counts must accumulate across batches: $got")
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
