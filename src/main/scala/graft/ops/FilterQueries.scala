package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Predicate tier (SURVEY.md §2.2) — the reference's filter class algebra
  * (RowFilter, PrefixFilter, SingleColumnValueFilter, ValueFilter,
  * RegexStringComparator, PageFilter, TimestampsFilter, FilterList)
  * re-expressed as Column predicates. Catalyst pushes every one of these
  * to the parquet scan (server-side filtering analog); the dynamic-
  * qualifier ValueFilter runs over the exploded tall form from §1.2.
  */
object FilterQueries extends QueryPack {

  val queries = Map[String, (SparkSession, String) => DataFrame](
    // RowFilter: compare on the row key.
    "q_filter_row" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 50L)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))),

    // PrefixFilter: rowkey starts-with.
    "q_filter_prefix" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_name").startsWith("Customer#00000001"))
        .select(col("c_custkey"), col("c_name"))),

    // SingleColumnValueFilter: keep row when a named column passes a
    // comparison (implicitly requires the column present = isNotNull).
    "q_filter_scv" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_acctbal").isNotNull && col("c_acctbal") > 5000.0 &&
          col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))),

    // ValueFilter: compare EVERY cell value — evaluated over the exploded
    // tall (key, qualifier, value) form of a dynamic-schema row.
    "q_filter_value" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          explode(map(
            lit("p_size"), col("p_size").cast("double"),
            lit("p_retailprice"), col("p_retailprice")))
            .as(Seq("qual", "val")))
        .filter(col("val") >= 990.0)),

    // RegexStringComparator: regex match on a cell value.
    "q_filter_regex" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("text").rlike("join .*filter"))
        .select(col("doc_id"), col("lang"), col("n_chars"))),

    // PageFilter: first N rows in key order.
    "q_filter_page" -> ((s, d) =>
      Tables.orders(s, d).orderBy(col("o_orderkey")).limit(100)),

    // TimestampsFilter / Scan.setTimeRange: cell-timestamp predicate.
    "q_filter_ts" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-11 00:00:00").cast("timestamp"))
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))),

    // FilterList: MUST_PASS_ALL / MUST_PASS_ONE tree = &&/|| conjunctions.
    "q_filter_list" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter((col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
          || (col("l_returnflag") === "R" && col("l_tax") > 0.06))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_discount"), col("l_tax"))),

    // MultiRowRangeFilter: several disjoint rowkey ranges in one scan —
    // each range prunes parquet row groups independently (OR of pushed
    // predicates), the analog of multi-range region pruning.
    "q_filter_multirange" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter((col("l_orderkey") >= 100 && col("l_orderkey") < 200) ||
          (col("l_orderkey") >= 1000 && col("l_orderkey") < 1100) ||
          (col("l_orderkey") >= 5000 && col("l_orderkey") < 5100))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    // RandomRowFilter, made reproducible: a deterministic 1% hash sample
    // (md5-keyed), the only sane form at 100 TB — re-running the job
    // yields the same sample, and the oracle can replay it.
    "q_filter_sample" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(
          conv(substring(md5(concat_ws("|", col("l_orderkey"),
            col("l_linenumber"))), 1, 8), 16, 10).cast("long") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))),

    // TTL expiry (HColumnDescriptor#setTimeToLive): keep only cells
    // younger than maxAge relative to the newest cell. The global max is a
    // one-row broadcast, not a window over a single partition.
    "q_filter_ttl" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.crossJoin(broadcast(ev.agg(max(col("ts")).as("mx"))))
        .filter(col("ts") >= col("mx") - expr("INTERVAL 7 DAYS"))
        .select(col("event_id"), col("ts"), col("event_type"))
    }),

    // QualifierFilter / ColumnPrefixFilter / ColumnRangeFilter: project
    // columns of a DYNAMIC-schema row by name predicate — map_filter over
    // the MapType qualifier map (name prefix + lexicographic range), then
    // explode the surviving cells.
    "q_filter_qualifier" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          map(
            lit("evt:type"), col("event_type"),
            lit("evt:user"), col("user_id").cast("string"),
            lit("val:amount"), col("value").cast("string"),
            lit("val:props"), col("props")).as("cells"))
        .select(col("event_id"),
          explode(map_filter(col("cells"),
            (k, _) => k.startsWith("evt:") && k < "evt:zz"))
            .as(Seq("qual", "cell")))),

    // Rowkey compose / decompose / salt: salted key = pmod(key,S) # key,
    // then parse it back — the round-trip proves both directions.
    "q_rowkey_ops" -> ((s, d) =>
      Tables.customer(s, d)
        .withColumn("salt", pmod(col("c_custkey"), lit(16L)))
        .withColumn("salted_key",
          concat(col("salt"), lit("#"), lpad(col("c_custkey").cast("string"), 9, "0")))
        .withColumn("parsed_key",
          split(col("salted_key"), "#").getItem(1).cast("long"))
        .select(col("c_custkey"), col("salt"), col("salted_key"), col("parsed_key")))
  )

  val oracle = Map(
    "q_filter_row" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_orderkey < 50 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_multirange" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE (l_orderkey >= 100 AND l_orderkey < 200)
        |   OR (l_orderkey >= 1000 AND l_orderkey < 1100)
        |   OR (l_orderkey >= 5000 AND l_orderkey < 5100)""".stripMargin,
    "q_filter_sample" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE CAST(('0x' || substr(md5(concat_ws('|', l_orderkey, l_linenumber)), 1, 8)) AS BIGINT) % 100 = 0""".stripMargin,
    "q_filter_ttl" ->
      """SELECT event_id, ts, event_type FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY""".stripMargin,
    "q_filter_qualifier" ->
      """SELECT event_id, qual, cell FROM (
        |  SELECT event_id, 'evt:type' AS qual, event_type AS cell FROM events
        |  UNION ALL
        |  SELECT event_id, 'evt:user', CAST(user_id AS VARCHAR) FROM events
        |) WHERE starts_with(qual, 'evt:') AND qual < 'evt:zz'""".stripMargin,
    "q_filter_prefix" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE starts_with(c_name, 'Customer#00000001') ORDER BY c_custkey""".stripMargin,
    "q_filter_scv" ->
      """SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        |WHERE c_acctbal IS NOT NULL AND c_acctbal > 5000.0
        |  AND c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,
    "q_filter_value" ->
      """SELECT p_partkey, qual, val FROM (
        |  SELECT p_partkey, 'p_size' AS qual, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
        |) WHERE val >= 990.0 ORDER BY p_partkey, qual""".stripMargin,
    "q_filter_regex" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE regexp_matches(text, 'join .*filter') ORDER BY doc_id""".stripMargin,
    "q_filter_page" ->
      "SELECT * FROM orders ORDER BY o_orderkey LIMIT 100",
    "q_filter_ts" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-11 00:00:00' ORDER BY event_id""".stripMargin,
    "q_filter_list" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_discount, l_tax
        |FROM lineitem
        |WHERE (l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0)
        |   OR (l_returnflag = 'R' AND l_tax > 0.06)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_rowkey_ops" ->
      """SELECT c_custkey, c_custkey % 16 AS salt,
        |  concat(c_custkey % 16, '#', lpad(CAST(c_custkey AS VARCHAR), 9, '0')) AS salted_key,
        |  CAST(split_part(concat(c_custkey % 16, '#', lpad(CAST(c_custkey AS VARCHAR), 9, '0')), '#', 2) AS BIGINT) AS parsed_key
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
