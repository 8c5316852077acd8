package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming tier (SURVEY.md §2.8) — the WALPlayer / incremental-scan
  * surface of the reference generalized to Structured Streaming over the
  * `events` table.
  *
  * Every transform here takes a DataFrame and works UNCHANGED on a batch
  * or a streaming input — that is the point: the same declarative plan
  * serves the DuckDB-oracle-gated batch registration (s_* keys in
  * StreamQueries) and the readStream → memory-sink paths in
  * StreamingSpec. Event-time semantics (watermarks, windows, sessions)
  * rather than arrival order make the results deterministic at any
  * parallelism.
  */
object StreamOps {

  /** File-source incremental ingest — the WALPlayer analog: replay a
    * landing DIRECTORY of event files as an unbounded stream (the file
    * source tails the directory; new files = new WAL segments).
    *
    * The streaming file source requires an explicit schema; discover it
    * with a one-time batch footer read of the directory (driver-side
    * metadata only, no data scan) so the stream tracks whatever physical
    * encoding the fixture uses, then apply the same `ts` normalization as
    * the batch path (graft.Tables.normalizeTs). An EMPTY landing
    * directory (stream started before the first file lands — the normal
    * WAL-tailing deployment order) has nothing to infer from, so fall
    * back to the current fixture schema with ts already a timestamp.
    */
  def readEventStream(s: SparkSession, eventsDir: String): DataFrame = {
    val fallback = StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
    val rawSchema: StructType =
      try s.read.parquet(eventsDir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => fallback }
    graft.Tables.normalizeTs(
      s.readStream.schema(rawSchema).parquet(eventsDir))
  }

  /** s_tumbling: 5-minute tumbling window counts per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** s_sliding: 10-minute window sliding every 5 — each event lands in
    * exactly two buckets.
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("n_events"))

  /** s_session: 30-minute-gap session windows per user. Session end =
    * last event + gap (Spark's session_window contract).
    */
  def sessionize(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** s_watermark: tumbling counts with a 10-minute watermark — bounds
    * state and drops late data in append mode.
    */
  def tumblingWithWatermark(events: DataFrame): DataFrame =
    tumbling(events.withWatermark("ts", "10 minutes"))

  /** s_dedup: exactly-once by event_id within the watermark horizon. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** s_dedup_near: streaming near-dedup by FULL MinHash signature
    * equality — the streamable near-dup relation. The banded LSH pair
    * join batch dedup uses is not streamable (unbounded two-sided
    * state); signature equality IS, because the whole 16-perm signature
    * collapses to one per-row key, computed map-side by the native
    * minhash_sig expression in a single pass over the arriving
    * document. dropDuplicatesWithinWatermark keeps the FIRST arrival of
    * each signature class and expires class state once it falls behind
    * the watermark, so state is bounded by the horizon, never the
    * corpus. Sig-less docs (< 3 tokens — nothing to shingle) get a
    * per-doc unique key and always survive, matching the batch twin
    * ([[graft.api.GraftOps.dedupBySignature]], oracle-gated as
    * x_dedup_sig) — the two share the identical sigKey relation.
    */
  def dedupNearStream(docs: DataFrame, horizon: String = "10 minutes"): DataFrame =
    graft.api.GraftOps.withSigKey(docs, col("doc_id"), col("text"))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("sig_key")
      .drop("sig_key")

  /** s_join: stream-stream interval join — every purchase within 10
    * minutes after a click by the same user (click attribution). The time
    * bound in the join condition is what lets Structured Streaming expire
    * join state (each side keeps only a watermark-deep buffer); in batch
    * the same plan is an equi-join on user_id with the range as a post-
    * filter — one shuffle per side, never a time-range cross product.
    * withWatermark is a no-op on batch inputs, so the transform serves
    * both the oracle-gated batch registration and StreamingSpec's
    * stream-stream parity test unchanged.
    */
  def clickAttribution(events: DataFrame): DataFrame = {
    val clicks = events.withWatermark("ts", "1 hour")
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val buys = events.withWatermark("ts", "1 hour")
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("buy_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    clicks.join(buys,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("click_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("click_id"), col("buy_id"),
        col("click_ts"), col("buy_ts"))
  }

  /** s_outer_join: stream-stream LEFT OUTER interval join — every click
    * with its attributed purchase OR an explicit no-purchase null row.
    * The outer side is what makes this stateful beyond [[clickAttribution]]:
    * an unmatched click can only emit once the WATERMARK proves no
    * qualifying purchase can still arrive (click_ts + 10 min behind the
    * watermark), so emission lag is bounded by delay + interval and join
    * state stays watermark-deep on both sides. In batch the identical
    * plan is a plain left outer join with the range predicate in the ON
    * clause — which is how the DuckDB oracle gates it.
    */
  def clickAttributionOuter(events: DataFrame): DataFrame = {
    val clicks = events.withWatermark("ts", "1 hour")
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val buys = events.withWatermark("ts", "1 hour")
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("buy_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    clicks.join(buys,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("click_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("buy_id"),
        col("click_ts"), col("buy_ts"))
  }

  /** s_enrich: stream-static dimension enrichment — every event joined to
    * its customer row. The production shape behind most streaming ETL:
    * the dimension is broadcast (stateless join, no streaming state at
    * all), so the stream side never shuffles and the plan is identical in
    * batch and streaming. At 100 TB/day of events the dimension refresh
    * cadence, not join state, is the only operational concern.
    */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"),
          col("c_nationkey"))),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("c_mktsegment"), col("c_nationkey"))

  /** s_distinct: exact distinct active users per 5-minute bucket and
    * event type — the streaming cardinality readout (DAU/MAU at window
    * grain). A streaming count(DISTINCT) is unsupported, so this is TWO
    * CHAINED stateful aggregations (the Spark 3.4+ multiple-stateful-
    * operator shape): a user-grain pre-aggregate collapses each
    * (window, type, user) to one row, then the distinct count is a plain
    * count of first-level groups — re-windowed via window_time(), the
    * documented chained-window idiom. State per window is one row per
    * active user (bounded by the watermark horizon), and the first level
    * partial-aggregates map-side, so the shuffle carries user-grain rows
    * once, never raw events twice. NULL user_ids are excluded
    * (count(DISTINCT) semantics in both engines).
    */
  def distinctUsers(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(window(window_time(col("w")), "5 minutes").as("w2"),
        col("event_type"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("w2.start").as("bucket_start"), col("event_type"),
        col("n_users"))

  /** One micro-batch of the streaming INCREMENTAL near-dedup admit
    * screen — the streaming twin of the batch x_dedup_incr relation: a
    * document is admitted iff NO LSH band of its MinHash signature
    * collides with the historical band table or with a lower-keyed
    * in-batch document (the batch tier's min-keeper rule, so arrival
    * ties inside one batch resolve deterministically). Band-less docs
    * (< 3 tokens — nothing to shingle) are screen-exempt and always
    * admitted, the withSigKey nosig discipline. Banding constants are
    * [[graft.api.GraftOps.bandKeyTable]]'s — the SAME relation the
    * batch gates prove — so batch and streaming candidates can never
    * disagree. Returns (admitted docs, their bands to append to
    * history).
    *
    * The history side rides a broadcast: right while admitted-history
    * bands fit an executor (the admit screen's normal regime — history
    * is the DEDUPED corpus's bands, orders of magnitude smaller than
    * the raw feed). When history outgrows that, drop the broadcast
    * hint and the same plan runs as a bkey shuffle join, or put
    * [[graft.api.GraftOps.bloomAntiJoin]]'s bitmap in front — the
    * batch tier already gates that shape (x_dedup_bloom).
    */
  def admitNovel(batch: DataFrame, historyBands: DataFrame)
      : (DataFrame, DataFrame) = {
    // cached: feeds the history screen, the in-batch screen and the
    // admitted-band append — one signature pass per batch (the caller
    // unpersists after the batch's writes; see startIncrDedup)
    val bands = graft.api.GraftOps.cacheOnce(graft.api.GraftOps
      .bandKeyTable(batch, col("doc_id"), col("text")))
    val histHit = bands
      .join(broadcast(historyBands.select(col("band"), col("bkey"))),
        Seq("band", "bkey"), "left_semi")
      .select(col("doc_id")).distinct()
    // in-batch screen: within a band bucket the minimum doc_id is the
    // keeper; anything above a bucket-mate is dropped this batch
    val bucketMin = bands.groupBy(col("band"), col("bkey"))
      .agg(min(col("doc_id")).as("keep_id"))
    val inBatchDrop = bands.join(bucketMin, Seq("band", "bkey"))
      .filter(col("doc_id") > col("keep_id"))
      .select(col("doc_id")).distinct()
    val dropped = histHit.unionByName(inBatchDrop).distinct()
    val admitted = batch.join(dropped, Seq("doc_id"), "left_anti")
    val newBands = bands.join(dropped, Seq("doc_id"), "left_anti")
    (admitted, newBands)
  }

  /** One [[admitNovel]] micro-batch against file-backed history,
    * IDEMPOTENT on `batchId` — foreachBatch is at-least-once, so a
    * crash between the two output writes (or after both, before the
    * checkpoint commit) REPLAYS the batch; both outputs are therefore
    * written as a dynamic OVERWRITE of the `batch_id=<id>` partition
    * (a replay rewrites its own partition, never double-appends), and
    * the history read EXCLUDES the current batchId's partition so a
    * replayed batch never screens against its own earlier (possibly
    * partial) band write — which would have silently dropped every doc
    * of the replayed batch. Exposed for the replay law in
    * StreamingSpec, which runs the same (batch, batchId) twice and
    * proves both outputs are byte-stable.
    */
  def incrDedupBatch(batch: DataFrame, bandDir: String, outDir: String,
                     batchId: Long): Unit = {
    val spark = batch.sparkSession
    val history =
      try spark.read.parquet(bandDir)
        .filter(col("batch_id") =!= batchId)
        .select(col("doc_id"), col("band"), col("bkey"))
      catch {
        // first batch: no history written yet — an empty band
        // table with the right schema
        case _: org.apache.spark.sql.AnalysisException =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType.fromDDL(
              "doc_id BIGINT, band INT, bkey STRING"))
      }
    val (admitted, newBands) = admitNovel(batch, history)
    admitted.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(outDir)
    newBands.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(bandDir)
    // drop THIS batch's band cache (cacheOnce is idempotent by
    // plan equality, so re-deriving the handle returns the same
    // registered frame) — targeted, never clearCache(), which
    // would evict the session's other operators' persists
    graft.api.GraftOps.cacheOnce(graft.api.GraftOps
      .bandKeyTable(batch, col("doc_id"), col("text"))).unpersist()
    ()
  }

  /** Wire [[admitNovel]] as a foreachBatch stream: survivors land in
    * `outDir`, their bands in `bandDir` — history lives in FILES, not
    * the state store, because an admitted document screens FOREVER
    * (no watermark bounds it) and files survive a checkpoint restart
    * by construction (the restart law in StreamingSpec proves the
    * wiring: a post-restart near-dup of a pre-restart admit must
    * drop). Batch boundaries make the admit sequence deterministic
    * per assignment, the RateLimitProcessor contract; at-least-once
    * replays are absorbed by [[incrDedupBatch]]'s per-batchId dynamic
    * partition overwrite.
    */
  def startIncrDedup(docs: DataFrame, bandDir: String, outDir: String,
                     checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        incrDedupBatch(batch, bandDir, outDir, batchId)
      }
      .start()
  }
}

/** One closed session: key, bounds, event count. */
case class ClosedSession(user_id: Long, session_start_ms: Long,
                         session_end_ms: Long, n_events: Long)

/** Gap-timeout sessionizer on `transformWithState` with EVENT-TIME
  * TIMERS — the arbitrary-state form of session_window, for pipelines
  * that need per-session custom state (running aggregates, first/last
  * payloads) rather than a windowed aggregate. Per key the state is one
  * (start, last, n) triple plus ONE registered timer at last + gap; a
  * new event inside the gap extends the session and re-arms the timer,
  * and the timer firing (watermark passed last + gap) emits the closed
  * session and clears the state — so emission is exactly-once per
  * session and state size is O(live keys), the same bound
  * session_window's merging state carries. Input rows must arrive with
  * a watermark (TimeMode.EventTime contract).
  */
class SessionGapProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), ClosedSession] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TTLConfig, TimerValues, ValueState}

  // (session_start_ms, last_event_ms, n_events)
  @transient private var sess: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long)]("sess",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues)
      : Iterator[ClosedSession] = {
    // fold this batch's rows into the open session; rows inside one
    // micro-batch may arrive unordered, so track min/max, not sequence
    var (start, last, n) =
      if (sess.exists()) sess.get() else (Long.MaxValue, Long.MinValue, 0L)
    val hadTimer = sess.exists()
    rows.foreach { case (_, tsMs) =>
      start = math.min(start, tsMs); last = math.max(last, tsMs); n += 1
    }
    sess.update((start, last, n))
    // one live timer per key: re-arm at the new gap deadline
    if (hadTimer) getHandle.listTimers().foreach(t =>
      getHandle.deleteTimer(t.asInstanceOf[Long]))
    getHandle.registerTimer(last + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[ClosedSession] = {
    val out =
      if (sess.exists()) {
        val (start, last, n) = sess.get()
        // a re-armed session's stale timer may fire first; only close
        // when THIS timer is the live gap deadline
        if (expiredTimerInfo.getExpiryTimeInMs() == last + gapMs) {
          sess.clear()
          Iterator(ClosedSession(key, start, last, n))
        } else Iterator.empty
      } else Iterator.empty
    out
  }
}

/** Per-key running row counter on Spark 4's supported arbitrary-state
  * API (`transformWithState` / `StatefulProcessor`) — the replacement
  * surface for `flatMapGroupsWithState`, which remains for back-compat.
  * Same semantics as the fMGWS form StreamingSpec pins: after each
  * micro-batch the key's total row count is emitted once. State is ONE
  * long per key in the state store (RocksDB provider required by the
  * API), so a 100-TB keyspace costs 8 bytes per live key plus the store
  * overhead — the same bound the fMGWS form carries, but on the API that
  * supports state TTL, timers, and composite state types going forward.
  */
class RunningCountProcessor[I]
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, I, (Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, TimerValues, ValueState}

  @transient private var n: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    n = getHandle.getValueState[Long]("n",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[I],
                               timerValues: TimerValues)
      : Iterator[(Long, Long)] = {
    val total = (if (n.exists()) n.get() else 0L) + rows.size
    n.update(total)
    Iterator((key, total))
  }
}

/** Per-key token-bucket rate limiter on `transformWithState` — the
  * ingest-throttling shape every streaming ETL front door carries: each
  * key holds a bucket of `capacity` tokens refilled at
  * `refillMilliPerSec` MILLI-tokens per second of EVENT time (1000 =
  * one token/s; 500 = one token every 2 s — sub-1/s rates are
  * first-class, which is why the knob is milli-tokens, not tokens);
  * each arriving event consumes one token or is counted dropped. Rows
  * inside a micro-batch are processed in event-time order (batches
  * deliver unordered), so the admit/drop sequence is a pure function
  * of the event times PER BATCH ASSIGNMENT: a late row delivered in a
  * LATER batch is processed after the newer rows that beat it there,
  * unlike the same row arriving in-batch — the deterministic contract
  * is per-batch event-time order, and the restart law fixes batch
  * boundaries to test exactly that. State is one (tokens_micro,
  * last_ms) pair per key; emission is one (key, allowed, dropped) row
  * per key per batch. Tokens are tracked in integer MICRO-tokens —
  * elapsed ms × milli-tokens/s is micro-tokens exactly, so any refill
  * rate accrues with zero rounding and no float drift across
  * checkpointed restarts.
  *
  * State-schema note: the micro-token representation renamed the
  * persisted state from "bucket" (milli-tokens) to "bucket_micro", so
  * a checkpoint written by the milli-token build restarts with a FRESH
  * full bucket instead of silently reinterpreting the old balance
  * 1000x too small — the unit change is a state-schema break, and the
  * rename makes it a visible reset, never a wrong number. The
  * `refillMilliPerSec` parameter name carries the unit for the same
  * reason (positional callers of the old `refillPerSec` would have
  * shifted semantics 1000x with no compile break).
  */
class RateLimitProcessor(capacity: Long, refillMilliPerSec: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, TimerValues, ValueState}
  // capacity bound keeps micro + gap*refill provably inside a Long
  // (2 × capMicro ≤ 2^42 × 10^6 < 2^63) — loud here, not a wrap later
  require(capacity >= 1 && capacity <= (1L << 41) &&
    refillMilliPerSec >= 0,
    "RateLimitProcessor: 1 <= capacity <= 2^41, refill >= 0")

  // (micro-tokens available, event-time ms of the last refill)
  @transient private var bucket: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bucket = getHandle.getValueState[(Long, Long)]("bucket_micro",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues)
      : Iterator[(Long, Long, Long)] = {
    val evs = rows.toArray.sortBy(_._2)
    var (micro, last) =
      if (bucket.exists()) bucket.get()
      else (capacity * 1000000L, evs.headOption.map(_._2).getOrElse(0L))
    var allowed = 0L
    var dropped = 0L
    val capMicro = capacity * 1000000L
    evs.foreach { case (_, tsMs) =>
      if (tsMs > last) {
        // a gap long enough to fill the bucket short-circuits to full
        // BEFORE the multiply — a key idle for months times a large
        // refill rate would otherwise overflow the Long product
        val gap = tsMs - last
        micro =
          if (refillMilliPerSec > 0 && gap > capMicro / refillMilliPerSec)
            capMicro
          else math.min(capMicro, micro + gap * refillMilliPerSec)
        last = tsMs
      }
      if (micro >= 1000000L) { micro -= 1000000L; allowed += 1L }
      else dropped += 1L
    }
    bucket.update((micro, last))
    Iterator((key, allowed, dropped))
  }
}
