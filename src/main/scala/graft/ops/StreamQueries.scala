package graft.ops

import graft.{QueryPack, Tables}
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch registrations of the streaming transforms (SURVEY.md §2.8): the
  * t2 oracle is DuckDB over static parquet, so each windowed transform is
  * gated here on its BATCH semantics — StreamOps transforms are
  * input-agnostic, and StreamingSpec proves the same plans produce the
  * same results when fed through readStream + memory sink.
  */
object StreamQueries extends QueryPack {

  val queries = Map[String, (SparkSession, String) => DataFrame](
    "s_tumbling" -> ((s, d) => StreamOps.tumbling(Tables.events(s, d))),
    "s_sliding" -> ((s, d) => StreamOps.sliding(Tables.events(s, d))),
    "s_session" -> ((s, d) => StreamOps.sessionize(Tables.events(s, d))),
    "s_join" -> ((s, d) => StreamOps.clickAttribution(Tables.events(s, d))),
    "s_outer_join" -> ((s, d) =>
      StreamOps.clickAttributionOuter(Tables.events(s, d))),
    "s_enrich" -> ((s, d) =>
      StreamOps.enrich(Tables.events(s, d), Tables.customer(s, d))),
    "s_distinct" -> ((s, d) => StreamOps.distinctUsers(Tables.events(s, d)))
  )

  val oracle = Map(
    "s_enrich" ->
      """SELECT event_id, user_id, event_type, value,
        |  c_mktsegment, c_nationkey
        |FROM events JOIN customer ON user_id = c_custkey""".stripMargin,
    // Spark's window() origin is the epoch; 5-minute buckets are therefore
    // identical to DuckDB's 2000-01-01-origin time_bucket (both origins
    // are midnight-aligned).
    "s_tumbling" ->
      """SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS bucket_start,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // A 10-minute window sliding every 5 puts each event in exactly the
    // buckets starting at tb and tb-5min, where tb = its 5-minute bucket.
    "s_sliding" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS tb,
        |    event_type
        |  FROM events),
        |x AS (
        |  SELECT tb AS bucket_start, event_type FROM b
        |  UNION ALL
        |  SELECT tb - INTERVAL '5 minutes', event_type FROM b)
        |SELECT bucket_start, event_type, count(*) AS n_events
        |FROM x GROUP BY 1, 2""".stripMargin,
    // Gaps-and-islands sessionization; session end = last event + gap,
    // matching session_window's contract.
    "s_session" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR CAST(ts AS TIMESTAMP) - CAST(lag(ts) OVER w AS TIMESTAMP)
        |              > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin,
    // Exact windowed distinct — NULL users excluded on both sides
    // (count(DISTINCT) semantics); Spark buckets from the epoch, DuckDB
    // from 2000-01-01, both midnight-aligned for 5-minute widths.
    "s_distinct" ->
      """SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS bucket_start,
        |  event_type, count(DISTINCT user_id) AS n_users
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    // Batch semantics of the stream-stream interval join: purchases at or
    // within 10 minutes after a same-user click.
    "s_join" ->
      """SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id,
        |  CAST(c.ts AS TIMESTAMP) AS click_ts, CAST(b.ts AS TIMESTAMP) AS buy_ts
        |FROM events c JOIN events b
        |  ON b.user_id = c.user_id
        | AND c.event_type = 'click' AND b.event_type = 'purchase'
        | AND CAST(b.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(b.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL '10 minutes'""".stripMargin,
    // Batch semantics of the stream-stream LEFT OUTER interval join: the
    // purchase filter must live in the ON clause (a WHERE would turn the
    // outer join back into an inner one).
    "s_outer_join" ->
      """SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id,
        |  CAST(c.ts AS TIMESTAMP) AS click_ts, CAST(b.ts AS TIMESTAMP) AS buy_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT OUTER JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON b.user_id = c.user_id
        | AND CAST(b.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(b.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL '10 minutes'""".stripMargin
  )
}
