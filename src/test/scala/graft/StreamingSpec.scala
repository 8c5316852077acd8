package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event record for MemoryStream-driven tests. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

/** Streaming document record for near-dedup tests. */
case class Doc(doc_id: Long, ts: Timestamp, text: String)

/** Structured Streaming tier (SURVEY.md §2.8): every StreamOps transform
  * driven through a real streaming source (file source or MemoryStream)
  * into a memory sink, asserting stream/batch parity and the stateful
  * semantics (watermark drop, dedup, arbitrary state, upsert sink) that
  * have no batch analog.
  */
class StreamingSpec extends SparkSpec {

  private def ts(m: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $m:00")

  /** The fixture is a single parquet FILE; the file stream source tails a
    * directory, so stage a landing dir holding a copy of it.
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_landing")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events-00000.parquet"))
    dir.toString
  }

  test("s_source: file-source replay delivers every event exactly once") {
    val q = StreamOps.readEventStream(spark, eventsDir)
      .writeStream.format("memory").queryName("src_tbl")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("src_tbl").count() ===
      Tables.events(spark, sf).count())
  }

  test("s_tumbling: streaming result equals the batch transform") {
    val q = StreamOps.tumbling(StreamOps.readEventStream(spark, eventsDir))
      .writeStream.format("memory").queryName("tumb_tbl")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("tumb_tbl")
    val batch = StreamOps.tumbling(Tables.events(spark, sf))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("s_sliding: streaming result equals the batch transform") {
    val q = StreamOps.sliding(StreamOps.readEventStream(spark, eventsDir))
      .writeStream.format("memory").queryName("slide_tbl")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("slide_tbl")
    val batch = StreamOps.sliding(Tables.events(spark, sf))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("s_session: streaming result equals the batch transform") {
    val q = StreamOps.sessionize(StreamOps.readEventStream(spark, eventsDir))
      .writeStream.format("memory").queryName("sess_tbl")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sess_tbl")
    val batch = StreamOps.sessionize(Tables.events(spark, sf))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("s_enrich: stream-static broadcast enrichment equals the batch join") {
    val q = StreamOps.enrich(StreamOps.readEventStream(spark, eventsDir),
        Tables.customer(spark, sf))
      .writeStream.format("memory").queryName("enrich_tbl")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("enrich_tbl")
    val batch = StreamOps.enrich(Tables.events(spark, sf),
      Tables.customer(spark, sf))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("s_watermark: late data beyond the watermark is dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamOps.tumblingWithWatermark(in.toDF())
      .writeStream.format("memory").queryName("wm_tbl")
      .outputMode("append").start()
    // batch 1: two on-time clicks at 10:00–10:05 + one at 10:30 that will
    // advance the watermark to 10:20 (> window end 10:05).
    in.addData(
      Ev(1, ts("10:01"), 1, "click", 1.0, "{}"),
      Ev(2, ts("10:03"), 1, "click", 1.0, "{}"),
      Ev(3, ts("10:30"), 1, "click", 1.0, "{}"))
    q.processAllAvailable()
    // batch 2: a LATE event for the already-closed 10:00 window, plus a
    // far-future row to flush remaining windows.
    in.addData(
      Ev(4, ts("10:02"), 1, "click", 1.0, "{}"),
      Ev(5, ts("11:30"), 1, "click", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    val counts = spark.table("wm_tbl")
      .select(col("bucket_start").cast("string"), col("n_events"))
      .as[(String, Long)].collect().toMap
    assert(counts("2024-01-01 10:00:00") === 2,
      "late event must NOT be counted into the closed 10:00 window")
  }

  test("s_dedup: duplicate event_ids within the watermark emit once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamOps.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup_tbl")
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("10:00"), 1, "click", 1.0, "{}"),
      Ev(1, ts("10:00"), 1, "click", 1.0, "{}"),
      Ev(2, ts("10:01"), 2, "click", 1.0, "{}"))
    q.processAllAvailable()
    in.addData(Ev(1, ts("10:02"), 1, "click", 1.0, "{}")) // dup, 2nd batch
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_tbl").count() === 2)
  }

  test("s_restart: dropDuplicatesWithinWatermark state survives a " +
    "checkpoint restart") {
    // the dedup tier's restart law, next to the transformWithState and
    // fMGWS ones: a duplicate event_id arriving AFTER the restart must
    // still be suppressed, because the seen-keys state came back from
    // the checkpoint — a state store (or a Spark minor upgrade) that
    // silently dropped dedup state would emit (1, 1, 2) here and
    // double-deliver at every pipeline restart in production
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_restart_dedup").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_restart_dedup_out").toString
    val in = MemoryStream[Ev]
    def deduped = StreamOps.dedupStream(in.toDF())
    val q1 = deduped.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    in.addData(
      Ev(1, ts("10:00"), 1, "click", 1.0, "{}"),
      Ev(2, ts("10:01"), 2, "click", 1.0, "{}"))
    q1.processAllAvailable(); q1.stop()
    val q2 = deduped.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    in.addData(Ev(1, ts("10:02"), 1, "click", 1.0, "{}")) // dup of batch 1
    q2.processAllAvailable(); q2.stop()
    val ids = spark.read.parquet(outDir).select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L),
      s"restarted dedup must suppress the pre-restart key, got $ids")
  }

  test("s_rate_limit: token bucket admits by event time exactly and the " +
    "bucket survives a checkpoint restart") {
    // capacity 2, refill 1 token/s. Batch 1 at t0: 3 events -> 2
    // allowed, 1 dropped, bucket empty. STOP. Batch 2 after restart at
    // t0+1.5s: refill 1.5 tokens -> 1 allowed, 1 dropped. A state store
    // that lost the bucket would re-seed at capacity and admit BOTH
    // batch-2 events — the restart law and the arithmetic in one gate.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_restart_rate").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_restart_rate_out").toString
      val in = MemoryStream[Ev]
      def limited = in.toDS()
        .map(e => (e.user_id, e.ts.getTime))
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.RateLimitProcessor(capacity = 2,
            refillMilliPerSec = 1000),
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
        .toDF("user_id", "allowed", "dropped")
      val q1 = limited.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      in.addData(
        Ev(1, ts("10:00"), 7, "click", 1.0, "{}"),
        Ev(2, ts("10:00"), 7, "click", 1.0, "{}"),
        Ev(3, ts("10:00"), 7, "click", 1.0, "{}"))
      q1.processAllAvailable(); q1.stop()
      val q2 = limited.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      val t2 = new java.sql.Timestamp(ts("10:00").getTime + 1500L)
      in.addData(
        Ev(4, t2, 7, "click", 1.0, "{}"),
        Ev(5, t2, 7, "click", 1.0, "{}"))
      q2.processAllAvailable(); q2.stop()
      val rows = spark.read.parquet(outDir)
        .as[(Long, Long, Long)].collect().sortBy(_._2)(Ordering[Long].reverse)
        .toSet
      assert(rows === Set((7L, 2L, 1L), (7L, 1L, 1L)),
        s"token bucket must admit 2+1 and survive the restart: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("s_rate_limit: sub-1/s refill accrues exactly (1 token per 2 s " +
    "= 500 milli-tokens/s)") {
    // capacity 1, refill 500 milli/s. One batch, events at t0 / t0+1s /
    // t0+2s / t0+2s: the seed token admits t0; +1 s refills only half a
    // token (drop); +2 s completes the token (admit); the second t0+2s
    // event finds an empty bucket (drop). An integer tokens/sec knob
    // cannot express this rate at all — the docstring's contract.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // transformWithState requires the RocksDB provider (multi-column-
    // family state) — same scoped override as the restart law above
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val limited = in.toDS()
        .map(e => (e.user_id, e.ts.getTime))
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.RateLimitProcessor(capacity = 1,
            refillMilliPerSec = 500),
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
        .toDF("user_id", "allowed", "dropped")
      val q = limited.writeStream.format("memory").queryName("rate_half")
        .outputMode("append").start()
      val t0 = ts("10:00").getTime
      in.addData(
        Ev(1, new java.sql.Timestamp(t0), 9, "click", 1.0, "{}"),
        Ev(2, new java.sql.Timestamp(t0 + 1000L), 9, "click", 1.0, "{}"),
        Ev(3, new java.sql.Timestamp(t0 + 2000L), 9, "click", 1.0, "{}"),
        Ev(4, new java.sql.Timestamp(t0 + 2000L), 9, "click", 1.0, "{}"))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("rate_half").as[(Long, Long, Long)]
        .collect().toSet
      assert(rows === Set((9L, 2L, 2L)),
        s"1-token/2s bucket must admit exactly 2 of 4: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("s_dedup_hist: incremental admit screen drops near-dups of " +
    "history and in-batch; history survives a checkpoint restart; " +
    "band-less docs are screen-exempt") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bandDir = java.nio.file.Files
      .createTempDirectory("graft_incr_bands").toString + "/b"
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_incr_out").toString + "/o"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_incr_ckpt").toString
    val in = MemoryStream[Doc]
    def start() = StreamOps.startIncrDedup(in.toDF(), bandDir, outDir, ckpt)
    val q1 = start()
    in.addData(
      Doc(1, ts("10:00"), "alpha beta gamma delta epsilon zeta"),
      // same token stream through case/whitespace noise: every band
      // collides with doc 1's -> in-batch drop (min-keeper rule)
      Doc(2, ts("10:00"), "Alpha  beta GAMMA delta epsilon zeta"),
      Doc(3, ts("10:01"), "a completely different document body here"),
      Doc(4, ts("10:01"), "hi there")) // < 3 tokens: band-less, admitted
    q1.processAllAvailable(); q1.stop()
    val q2 = start() // RESTART: history must come from the band FILES
    in.addData(
      // near-dup of the PRE-restart admit: must drop against history
      Doc(5, ts("10:02"), "alpha beta gamma delta epsilon zeta"),
      Doc(6, ts("10:02"), "another novel body that shares no shingles"),
      // byte-identical to doc 4 but band-less: the NEAR-dup screen
      // never drops sig-less docs (exact dedup is s_dedup's job)
      Doc(7, ts("10:03"), "hi there"))
    q2.processAllAvailable(); q2.stop()
    val kept = spark.read.parquet(outDir).select("doc_id")
      .as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L, 6L, 7L),
      s"history screen must drop 2 (in-batch) and 5 (history): $kept")
  }

  test("s_dedup_hist replay law: re-running a micro-batch under the " +
    "same batchId is idempotent — no double-append, no self-screen") {
    // foreachBatch is at-least-once: a crash between the two writes or
    // before the checkpoint commit replays the batch. The sink writes
    // per-batchId dynamic-overwrite partitions and the history read
    // excludes the current batchId, so a replay must (a) never
    // double-append band-less docs and (b) never drop the batch's own
    // docs against its own earlier band write.
    import spark.implicits._
    val bandDir = java.nio.file.Files
      .createTempDirectory("graft_replay_bands").toString + "/b"
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_replay_out").toString + "/o"
    val b0 = Seq(
      Doc(1, ts("10:00"), "alpha beta gamma delta epsilon zeta"),
      Doc(2, ts("10:00"), "hi there")).toDF() // band-less: never self-screens
    StreamOps.incrDedupBatch(b0, bandDir, outDir, batchId = 0L)
    val b1 = Seq(
      Doc(3, ts("10:01"), "a completely different document body here"),
      // near-dup of batch-0's admit: history screen must still drop it
      Doc(4, ts("10:01"), "alpha beta gamma delta epsilon zeta"),
      Doc(5, ts("10:01"), "bye now")).toDF()
    StreamOps.incrDedupBatch(b1, bandDir, outDir, batchId = 1L)
    def snapshot() = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val once = snapshot()
    assert(once === Seq(1L, 2L, 3L, 5L),
      s"pre-replay admit set wrong: $once")
    // REPLAY batch 1 (same data, same batchId): output must not change
    StreamOps.incrDedupBatch(b1, bandDir, outDir, batchId = 1L)
    assert(snapshot() === once, "replayed batch must be a no-op")
    // band history is also stable: one band row set, not two
    val bands = spark.read.parquet(bandDir).select("doc_id")
      .as[Long].collect().sorted.toSeq
    StreamOps.incrDedupBatch(b1, bandDir, outDir, batchId = 1L)
    assert(spark.read.parquet(bandDir).select("doc_id")
      .as[Long].collect().sorted.toSeq === bands,
      "replayed batch must not grow the band history")
  }

  test("s_dedup_near: signature-equal docs emit once; short docs all survive") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamOps.dedupNearStream(in.toDF())
      .writeStream.format("memory").queryName("dedup_near_tbl")
      .outputMode("append").start()
    in.addData(
      // same token stream through different raw bytes (case, interior
      // runs of whitespace) -> same shingles -> same signature: this is
      // near-dedup over the normalized relation, not byte equality
      Doc(1, ts("10:00"), "Alpha Beta gamma delta epsilon"),
      Doc(2, ts("10:01"), "alpha   beta GAMMA delta epsilon"),
      Doc(3, ts("10:01"), "a completely different document body here"),
      // < 3 tokens: no shingles, no signature -- both must survive even
      // though their texts are byte-identical
      Doc(4, ts("10:02"), "hi there"),
      Doc(5, ts("10:02"), "hi there"))
    q.processAllAvailable()
    // second batch: another member of doc 1's signature class, still
    // within the watermark horizon -> dropped by retained state
    in.addData(Doc(6, ts("10:03"), "alpha beta gamma delta epsilon"))
    q.processAllAvailable(); q.stop()
    val kept = spark.table("dedup_near_tbl").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L, 5L),
      "one survivor per signature class; sig-less docs never dropped")
  }

  test("s_curate: near-dedup + quality filter compose in one stream") {
    // the streaming curation shape: arriving docs pass through bounded-
    // state near-dedup, then the stateless quality gates — both
    // transforms are the SAME code the batch tier gates (x_dedup_sig /
    // x_quality oracles), composed on an unbounded source
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val good = ("the quick brown fox jumps over the lazy dog while the " +
      "other animals watch the scene and wait for the show to end today")
    val in = MemoryStream[Doc]
    val q = graft.api.GraftOps.qualityScore(
        StreamOps.dedupNearStream(in.toDF()), col("doc_id"), col("text"))
      .filter(col("keep") === 1)
      .writeStream.format("memory").queryName("curate_tbl")
      .outputMode("append").start()
    in.addData(
      Doc(1, ts("10:00"), good),
      Doc(2, ts("10:01"), good.toUpperCase),          // near-dup of 1
      Doc(3, ts("10:01"), "way too short"),           // fails quality gates
      Doc(4, ts("10:02"), good + " an entirely different closing stanza" +
        " rounds the second document out nicely indeed"))
    q.processAllAvailable(); q.stop()
    val kept = spark.table("curate_tbl").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L),
      "near-dup suppressed in-stream, low-quality gated, originals kept")
  }

  test("s_join: stream-stream interval join equals the batch join") {
    val q = StreamOps.clickAttribution(StreamOps.readEventStream(spark, eventsDir))
      .writeStream.format("memory").queryName("join_tbl")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("join_tbl")
    val batch = StreamOps.clickAttribution(Tables.events(spark, sf))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("s_outer_join: NULL-user clicks still emit, with NULL buy side") {
    // Dirty-feed contract: a click whose user_id is NULL can never match
    // (NULL equi-join key), but LEFT OUTER semantics must still emit it
    // with NULL buy columns once the watermark closes its interval —
    // dropping it silently would under-count the no-attribution bucket.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = StreamOps.clickAttributionOuter(
        in.toDF().withColumn("user_id",
          when(col("user_id") < 0, lit(null)).otherwise(col("user_id"))))
      .writeStream.format("memory").queryName("outer_null_tbl")
      .outputMode("append").start()
    in.addData(
      Ev(1, ts("10:00"), -1, "click", 1.0, "{}"), // NULL user click
      Ev(2, ts("10:01"), 7, "click", 1.0, "{}"),
      Ev(3, ts("10:05"), 7, "purchase", 5.0, "{}"))
    q.processAllAvailable()
    // the global watermark is the MIN over both sides' nodes, and filter
    // pushdown means each side only sees its own event type — so BOTH a
    // far-future click and a far-future purchase are needed to advance
    // it past every open click interval; eviction then happens in the
    // batch AFTER the advance (watermarks commit at batch end)
    in.addData(Ev(8, ts("13:00"), 99, "click", 1.0, "{}"),
      Ev(9, ts("13:00"), 99, "purchase", 1.0, "{}"))
    q.processAllAvailable()
    in.addData(Ev(10, ts("13:01"), 99, "click", 1.0, "{}"),
      Ev(11, ts("13:01"), 99, "purchase", 1.0, "{}"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("outer_null_tbl")
      .select(col("click_id"), col("buy_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got.contains((1L, -1L)),
      s"NULL-user click must emit with a NULL buy side: $got")
    assert(got.contains((2L, 3L)), s"matched click must attribute: $got")
  }

  test("s_stateful: per-user running counters via flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
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
    val q = counted.writeStream.format("memory").queryName("state_tbl")
      .outputMode("append").start()
    in.addData(Ev(1, ts("10:00"), 7, "click", 1.0, "{}"),
      Ev(2, ts("10:01"), 7, "click", 1.0, "{}"))
    q.processAllAvailable()
    in.addData(Ev(3, ts("10:02"), 7, "buy", 2.0, "{}"))
    q.processAllAvailable(); q.stop()
    val byBatch = spark.table("state_tbl").as[(Long, Long)].collect().toSet
    assert(byBatch === Set((7L, 2L), (7L, 3L)),
      "state must carry the count across micro-batches")
  }

  test("s_stateful: same running counters via transformWithState") {
    // Spark 4's supported arbitrary-state API, pinned alongside the
    // flatMapGroupsWithState form above — same inputs, same expected
    // emissions. transformWithState requires the RocksDB state store
    // provider; scope it to this query and restore after.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val counted = in.toDS()
        .groupByKey(_.user_id)
        .transformWithState(
          new graft.streaming.RunningCountProcessor[Ev],
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
        .toDF("user_id", "running_n")
      val q = counted.writeStream.format("memory").queryName("tws_tbl")
        .outputMode("append").start()
      in.addData(Ev(1, ts("10:00"), 7, "click", 1.0, "{}"),
        Ev(2, ts("10:01"), 7, "click", 1.0, "{}"))
      q.processAllAvailable()
      in.addData(Ev(3, ts("10:02"), 7, "buy", 2.0, "{}"))
      q.processAllAvailable(); q.stop()
      val got = spark.table("tws_tbl").as[(Long, Long)].collect().toSet
      assert(got === Set((7L, 2L), (7L, 3L)),
        "transformWithState must carry the count across micro-batches")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("s_stateful: SessionGapProcessor closes sessions on event-time timers") {
    // The arbitrary-state sessionizer: extend (same-key event inside the
    // gap re-arms the timer), close (watermark passes last + gap fires
    // the timer exactly once), and the stale-timer guard (the re-arm
    // deletes the old deadline so only the live gap deadline closes).
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val gapMs = 5 * 60 * 1000L
      val in = MemoryStream[Ev]
      val sessions = in.toDS()
        .withWatermark("ts", "0 seconds")
        .map(e => (e.user_id, e.ts.getTime))
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.SessionGapProcessor(gapMs),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          OutputMode.Append())
      val q = sessions.toDF().writeStream.format("memory")
        .queryName("gap_tbl").outputMode("append").start()
      // one event per batch so every extension exercises the re-arm path
      in.addData(Ev(1, ts("10:00"), 7, "click", 1.0, "{}"))
      q.processAllAvailable()
      in.addData(Ev(2, ts("10:04"), 7, "click", 1.0, "{}")) // extends 7
      q.processAllAvailable()
      in.addData(Ev(3, ts("10:30"), 8, "click", 1.0, "{}"))
      q.processAllAvailable()
      in.addData(Ev(4, ts("10:31"), 8, "click", 1.0, "{}")) // extends 8;
      q.processAllAvailable() // watermark 10:30 >= 10:09 closes user 7
      in.addData(Ev(5, ts("11:30"), 9, "click", 1.0, "{}"))
      q.processAllAvailable()
      in.addData(Ev(6, ts("11:31"), 9, "click", 1.0, "{}"))
      q.processAllAvailable(); q.stop() // watermark 11:30 closes user 8
      val got = spark.table("gap_tbl")
        .select(col("user_id"), col("session_start_ms"),
          col("session_end_ms"), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val t = (m: String) => ts(m).getTime
      assert(got.contains((7L, t("10:00"), t("10:04"), 2L)),
        s"user 7's extended session must close once with both events: $got")
      assert(got.contains((8L, t("10:30"), t("10:31"), 2L)),
        s"user 8's session must close after the watermark passes: $got")
      assert(got.count(_._1 == 7L) === 1,
        "the stale pre-extension timer must not emit a second session")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("s_restart: flatMapGroupsWithState state survives a checkpoint restart") {
    // The WALPlayer-analog durability claim: stop a checkpointed query
    // mid-stream, restart from its checkpoint dir, and the per-key state
    // must continue where it left off — a lost state store would emit
    // (7, 1) after restart instead of (7, 3).
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_restart_fmgws").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_restart_fmgws_out").toString
    val in = MemoryStream[Ev]
    // parquet file sink: the fault-tolerant sink whose _spark_metadata
    // commit log makes the cross-restart output exactly-once readable
    // (the memory sink refuses checkpoint recovery by design)
    def counted = in.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          Iterator((user, n))
      }.toDF("user_id", "running_n")
    val q1 = counted.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    in.addData(Ev(1, ts("10:00"), 7, "click", 1.0, "{}"),
      Ev(2, ts("10:01"), 7, "click", 1.0, "{}"))
    q1.processAllAvailable(); q1.stop() // simulated failure/stop
    val q2 = counted.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    in.addData(Ev(3, ts("10:02"), 7, "buy", 2.0, "{}"))
    q2.processAllAvailable(); q2.stop()
    val all = spark.read.parquet(outDir).as[(Long, Long)].collect().toSet
    assert(all === Set((7L, 2L), (7L, 3L)),
      s"restarted query must resume from checkpointed state (a lost " +
        s"store would emit (7,1), a replayed batch a duplicate): $all")
  }

  test("state source: a checkpoint's state store is readable offline") {
    // The ops tool a stateful deployment leans on when a job misbehaves:
    // read the checkpointed state store itself as a batch DataFrame
    // (format "statestore") and see exactly what the job believes —
    // without touching the running query. Proven here: after a
    // checkpointed running-count aggregation, the offline read returns
    // the same per-user counts the stream computed.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_state_source").toString
    val in = MemoryStream[Ev]
    val q = in.toDF().groupBy(col("user_id")).count()
      .writeStream.format("memory").queryName("state_src_tbl")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    in.addData(Ev(1, ts("10:00"), 7, "click", 1.0, "{}"),
      Ev(2, ts("10:01"), 7, "click", 1.0, "{}"),
      Ev(3, ts("10:02"), 9, "buy", 2.0, "{}"))
    q.processAllAvailable(); q.stop()
    val state = spark.read.format("statestore").load(ckpt)
    // schema: key struct (grouping cols), value struct (agg buffer);
    // address the buffer positionally so the test doesn't depend on the
    // internal aggregate alias
    val valueField = state.select(col("value.*")).columns.head
    val got = state
      .select(col("key.user_id"), col(s"value.`$valueField`").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((7L, 2L), (9L, 1L)),
      s"offline state read must equal the stream's belief: $got")
  }

  test("s_restart: transformWithState RocksDB state survives a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_restart_tws").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_restart_tws_out").toString
      val in = MemoryStream[Ev]
      def counted = in.toDS()
        .groupByKey(_.user_id)
        .transformWithState(
          new graft.streaming.RunningCountProcessor[Ev],
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
        .toDF("user_id", "running_n")
      val q1 = counted.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      in.addData(Ev(1, ts("10:00"), 7, "click", 1.0, "{}"),
        Ev(2, ts("10:01"), 7, "click", 1.0, "{}"))
      q1.processAllAvailable(); q1.stop()
      val q2 = counted.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      in.addData(Ev(3, ts("10:02"), 7, "buy", 2.0, "{}"))
      q2.processAllAvailable(); q2.stop()
      val all = spark.read.parquet(outDir).as[(Long, Long)].collect().toSet
      assert(all === Set((7L, 2L), (7L, 3L)),
        s"RocksDB-backed state must resume across the restart, got $all")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("s_restart: SessionGapProcessor timers survive a checkpoint restart") {
    // The strongest durability claim of the arbitrary-state tier: not
    // just VALUE state but a REGISTERED EVENT-TIME TIMER must come back
    // from the checkpoint — the session armed before the stop has to
    // close after the restart, when the watermark finally passes its
    // gap deadline. A state store that lost the timer would never emit.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val gapMs = 5 * 60 * 1000L
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_restart_gap").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_restart_gap_out").toString
      val in = MemoryStream[Ev]
      def sessions = in.toDS()
        .withWatermark("ts", "0 seconds")
        .map(e => (e.user_id, e.ts.getTime))
        .groupByKey(_._1)
        .transformWithState(
          new graft.streaming.SessionGapProcessor(gapMs),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          OutputMode.Append())
        .toDF()
      val q1 = sessions.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      in.addData(Ev(1, ts("10:00"), 7, "click", 1.0, "{}")) // arms 10:05
      q1.processAllAvailable(); q1.stop() // stop with the timer live
      val q2 = sessions.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      in.addData(Ev(2, ts("10:30"), 8, "click", 1.0, "{}")) // wm -> 10:30
      q2.processAllAvailable()
      in.addData(Ev(3, ts("10:31"), 8, "click", 1.0, "{}")) // evict batch
      q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(outDir)
        .select(col("user_id"), col("session_start_ms"),
          col("session_end_ms"), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val t0 = ts("10:00").getTime
      assert(got.contains((7L, t0, t0, 1L)),
        s"the pre-restart timer must fire post-restart and close the " +
          s"session exactly once: $got")
      assert(got.count(_._1 == 7L) === 1, s"exactly-once close: $got")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("s_upsert_sink: foreachBatch merge keeps latest version per key") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val target = java.nio.file.Files
      .createTempDirectory("graft_upsert").toString
    val in = MemoryStream[Ev]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val existing =
          try spark.read.parquet(target)
          catch { case _: Throwable => spark.emptyDataFrame }
        val all = if (existing.isEmpty) batch
          else existing.unionByName(batch)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id"))
          .orderBy(col("ts").desc)
        all.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .write.mode("overwrite").parquet(target + "_next")
        // atomic-swap stand-in for a real table commit
        spark.read.parquet(target + "_next")
          .write.mode("overwrite").parquet(target)
      }
      .start()
    in.addData(Ev(1, ts("10:00"), 1, "click", 1.0, "{}"))
    q.processAllAvailable()
    in.addData(Ev(1, ts("10:05"), 1, "click", 9.0, "{}")) // newer version
    q.processAllAvailable(); q.stop()
    val fin = spark.read.parquet(target).as[Ev].collect()
    assert(fin.length === 1 && fin.head.value === 9.0,
      "upsert must keep only the latest version of key 1")
  }

  test("s_mv_sink: foreachBatch partial-agg merge equals the batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // streaming mirror of q_mv_refresh: each micro-batch aggregates to
    // (user, n, cents) partials and MERGES with the persisted MV by
    // union + re-aggregate — per batch the work is batch-partials plus
    // an MV-sized merge, never a replay of past batches
    val target = java.nio.file.Files
      .createTempDirectory("graft_mv").toString
    val in = MemoryStream[Ev]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val partials = batch.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 100).cast("long")).as("cents"))
        val existing =
          try spark.read.parquet(target)
          catch { case _: Throwable => spark.emptyDataFrame }
        val merged = if (existing.isEmpty) partials
          else existing.unionByName(partials)
            .groupBy(col("user_id"))
            .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
        merged.write.mode("overwrite").parquet(target + "_next")
        spark.read.parquet(target + "_next")
          .write.mode("overwrite").parquet(target)
      }
      .start()
    in.addData(Ev(1, ts("10:00"), 1, "click", 1.5, "{}"),
      Ev(2, ts("10:01"), 2, "click", 2.0, "{}"))
    q.processAllAvailable()
    in.addData(Ev(3, ts("10:02"), 1, "buy", 3.25, "{}"))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(target)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 475L), (2L, 1L, 200L)),
      "maintained MV must equal the from-scratch aggregate")
  }

  test("s_distinct: chained stateful aggregations emit watermark-closed buckets") {
    val q = StreamOps.distinctUsers(StreamOps.readEventStream(spark, eventsDir))
      .writeStream.format("memory").queryName("dist_tbl")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dist_tbl")
    val batch = StreamOps.distinctUsers(Tables.events(spark, sf))
    // append mode emits only the buckets the 10-minute watermark has
    // closed: streamed must be a subset of batch, and exact on the
    // strictly-closed prefix (strict < sidesteps the boundary-equality
    // convention of window expiry)
    assert(streamed.except(batch).isEmpty,
      "streamed buckets must match the batch distinct counts")
    val maxTs = Tables.events(spark, sf).agg(max(col("ts"))).head.getTimestamp(0)
    val horizon = new Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val closed = batch.filter(
      col("bucket_start") + expr("INTERVAL 5 MINUTES") < lit(horizon))
    assert(closed.except(streamed).isEmpty,
      "every watermark-closed bucket must have been emitted")
    assert(streamed.count() > 0,
      "no buckets emitted — the chained aggregation is not progressing")
  }

  test("s_media: the typed decode harness runs unchanged on a stream") {
    // the multimodal decode stage is pure map work, so the SAME
    // MultimodalDecode.decode call that serves batch must compose into
    // readStream -> decode -> sink with no code change — the
    // streaming-ingest path of a media pipeline (decode on arrival,
    // metadata to the sink, corrupt payloads flagged not thrown)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[graft.api.MediaIn]
    val q = graft.api.MultimodalDecode.decode(in.toDS())
      .writeStream.format("memory").queryName("media_tbl")
      .outputMode("append").start()
    val png = graft.api.MultimodalDecode.encodePng(12, 7, seed = 1L)
    in.addData(
      graft.api.MediaIn(1L, png, "image/png"),
      graft.api.MediaIn(2L, "corrupt".getBytes, "image/png"))
    q.processAllAvailable()
    in.addData(graft.api.MediaIn(3L, png.take(8), "image/png"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("media_tbl")
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getInt(4),
        r.getBoolean(5))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 12, 7, true), (2L, 0, 0, false),
      (3L, 0, 0, false)),
      "streamed decode must match batch semantics incl. loud failures")
  }

  test("s_media: the MP4 track probe composes into a stream (1→N rows)") {
    // same batch-code-unchanged claim the decode harness proved, now for
    // the per-track generator shape: one arriving container can emit
    // several sink rows, and a corrupt arrival emits its one loud row
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[graft.api.MediaIn]
    val q = graft.api.MultimodalDecode.probeVideoTracks(in.toDS())
      .writeStream.format("memory").queryName("vtracks_tbl")
      .outputMode("append").start()
    val two = graft.api.MultimodalDecode.encodeMp4(6000L, 1000, 640, 360,
      audioTrack = true)
    in.addData(graft.api.MediaIn(1L, two, "video/mp4"),
      graft.api.MediaIn(2L, two.take(10), "video/mp4"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("vtracks_tbl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(5)))
      .toSet
    assert(got === Set((1L, 1L, "vide", true), (1L, 2L, "soun", true),
      (2L, 0L, "", false)),
      s"streamed track probe must match batch semantics: $got")
  }

  test("s_media_restart: the codec path survives a checkpointed restart") {
    // The thread-local ImageIO reader/writer pools are per-executor-
    // thread state that NO checkpoint carries — a resumed stream gets
    // fresh task threads and must lazily re-create its codecs. Prove it:
    // run the real decode+phash path through a checkpointed parquet-sink
    // query, stop it mid-stream, restart from the checkpoint, and the
    // post-restart batch must decode (and fingerprint) bit-identically
    // to the pre-restart one — with no duplicate or lost rows across the
    // failure point.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_restart_media").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_restart_media_out").toString
    val in = MemoryStream[graft.api.MediaIn]
    def decoded = graft.api.MultimodalDecode.phash(in.toDS()).toDF()
    val png = graft.api.MultimodalDecode.encodePng(20, 14, seed = 6L)
    val expectedHash = graft.api.MultimodalDecode.dHash64(png).get
    val q1 = decoded.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    in.addData(graft.api.MediaIn(1L, png, "image/png"),
      graft.api.MediaIn(2L, "corrupt".getBytes, "image/png"))
    q1.processAllAvailable(); q1.stop() // simulated failure/stop
    val q2 = decoded.writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    // same payload after the restart: the resumed query's fresh task
    // threads must rebuild their codec pools and hash identically
    in.addData(graft.api.MediaIn(3L, png, "image/png"),
      graft.api.MediaIn(4L, null, "image/png"))
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, expectedHash, true), (2L, 0L, false),
      (3L, expectedHash, true), (4L, 0L, false)),
      s"resumed stream must re-create codec state and fingerprint " +
        s"identically across the restart: ${got.toSeq}")
  }

  test("state budget: watermark eviction bounds window-agg and dedup state") {
    // The TUNING.md §7 claim, observed instead of asserted on faith: run
    // 40 batches whose event time advances 10 minutes each (80 distinct
    // 5-minute windows, 200 distinct dedup keys ingested over the run)
    // and read the state store's own row counts from the progress
    // metrics. With a 10-minute watermark the stores may only retain the
    // un-closed tail — a constant — so max rows across the whole run
    // must sit far below the ingested-key total, or state grows with
    // stream lifetime and a 100-TB deployment OOMs on day two.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = ts("10:00").getTime
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
        .foldLeft(0L)(math.max)
    val inW = MemoryStream[Ev]
    val qw = StreamOps.tumblingWithWatermark(inW.toDF())
      .writeStream.format("memory").queryName("budget_w_tbl")
      .outputMode("append").start()
    val inD = MemoryStream[Ev]
    val qd = StreamOps.dedupStream(inD.toDF())
      .writeStream.format("memory").queryName("budget_d_tbl")
      .outputMode("append").start()
    for (i <- 0 until 40) {
      val evs = (0 until 5).map { j =>
        Ev(i * 5L + j, new Timestamp(base + i * 10L * 60 * 1000 + j * 1000),
          j.toLong, "click", 1.0, "{}")
      }
      inW.addData(evs); qw.processAllAvailable()
      inD.addData(evs); qd.processAllAvailable()
    }
    val wRows = stateRows(qw)
    val dRows = stateRows(qd)
    qw.stop(); qd.stop()
    // Relative bounds, not exact internals: the horizon-deep tail is a
    // few windows / a few batches of keys, so anything under a quarter
    // of the ingested totals proves eviction is bounding state, without
    // pinning Spark's exact state-accounting or eviction timing (which
    // an upgrade may legally shift by a batch or two).
    // 80 windows ingested; only the un-closed tail may remain.
    assert(wRows > 0 && wRows < 20,
      s"window state held $wRows of 80 ingested windows — watermark " +
        "eviction is not bounding it")
    // 200 unique event_ids ingested; only the horizon-deep tail may remain.
    assert(dRows > 0 && dRows < 50,
      s"dedup state held $dRows of 200 ingested keys — watermark " +
        "eviction is not bounding it")
  }
}
