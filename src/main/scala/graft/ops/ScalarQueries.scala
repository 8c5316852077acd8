package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Scalar-function tier (SURVEY.md §2.7) — the open-coded Java transforms
  * that live in reference mapper bodies (Bytes decodes, String.split,
  * SimpleDateFormat, arithmetic), re-expressed as Spark built-ins so every
  * one stays inside whole-stage codegen. One registered query per family.
  *
  * Dialect notes for the DuckDB oracles: Spark `log` = DuckDB `ln`;
  * DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  * replace-all; float math rounded to 6 dp on both sides.
  */
object ScalarQueries extends QueryPack {

  val queries = Map[String, (SparkSession, String) => DataFrame](
    // String family over documents.text.
    "q_scalar_string" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          upper(substring(col("text"), 1, 10)).as("head10"),
          length(col("text")).as("text_len"),
          regexp_replace(substring(col("text"), 1, 40), "\\s+", "_").as("head40_snake"),
          concat_ws("|", col("lang"), col("source")).as("tag"),
          lpad(col("doc_id").cast("string"), 6, "0").as("padded_id"),
          translate(col("lang"), "en", "EN").as("lang_up"),
          levenshtein(col("lang"), lit("en")).as("lev_en"),
          trim(lit("  x  ")).as("trimmed"))),

    // Date/time family over orders.o_orderdate (midnight-aligned ms).
    "q_scalar_date" -> ((s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
            .as("days_to_98"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))),

    // Math family over lineitem.
    "q_scalar_math" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 1000L)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          round(pow(lit(1.0) + col("l_discount"), 2), 6).as("disc_sq"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          round(abs(col("l_discount") - 0.05), 6).as("disc_dev"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          pmod(col("l_orderkey"), lit(7L)).as("key_mod7"))),

    // Conditional family over customer.
    "q_scalar_cond" -> ((s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0.0, "debt")
            .when(col("c_acctbal") < 5000.0, "mid")
            .otherwise("rich").as("bal_band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("NONE"))
            .as("seg_or_none"),
          greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
          least(col("c_acctbal"), lit(0.0)).as("bal_neg"))),

    // Hash family (dedup fingerprints, SyncTable-style row hashes).
    "q_scalar_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          md5(col("text")).as("md5_text"),
          sha2(col("text"), 256).as("sha256_text"))),

    // Array family over embeddings (dims, element access, fold, min).
    "q_scalar_array" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("first_el"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double")), 6).as("el_sum"),
          round(array_min(col("embedding")).cast("double"), 6).as("el_min"),
          round(array_max(col("embedding")).cast("double"), 6).as("el_max"))),

    // Generator surface (1→N expansion): posexplode with ordinality —
    // the TableMapper multi-emit extension point as a built-in generator.
    "q_generator" -> ((s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 8)
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos", "el")))
        .select(col("vec_id"), col("pos"),
          round(col("el").cast("double"), 6).as("el"))),

    // JSON family over events.props (dynamic-schema cell payloads).
    "q_scalar_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"))),

    // Variant family (Spark 4): parse the JSON payload ONCE into the
    // binary Variant encoding, then extract typed paths from the parsed
    // value — the parse-once-access-many discipline for semi-structured
    // columns at scale, where per-access get_json_object re-parses the
    // string every time. try_variant_get on a missing path is NULL (the
    // schema-drift tolerance a dynamic payload column needs), never an
    // error.
    "q_scalar_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(
          col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_int"),
          expr("try_variant_get(v, '$.missing', 'int')").as("absent_val"),
          expr("CAST(variant_get(v, '$.k', 'double') >= 50.0 AS INT)")
            .as("k_high"))),

    // Variant introspection (Spark 4): schema_of_variant reports the
    // INFERRED type of each parsed payload (the schema-discovery pass a
    // dynamic column needs before promotion to typed columns), and
    // is_variant_null distinguishes a JSON null VALUE from an absent
    // path — get_json_object conflates the two, variant does not.
    "q_variant_ops" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(
          col("event_id"),
          expr("schema_of_variant(v)").as("vschema"),
          expr("CAST(is_variant_null(try_variant_get(v, '$.k', 'variant'))" +
            " AS INT)").as("k_is_null"),
          expr("CAST(is_variant_null(parse_json('null')) AS INT)")
            .as("null_lit_is_null"))),

    // Variant 1→N: variant_explode unrolls each parsed object into
    // (pos, key, value) rows — the generator that turns a dynamic
    // payload column into a tall typed table without a schema up front.
    // It is a table-valued generator (FROM-clause only), so this query
    // rides the SQL surface with a LATERAL join, like q_sql_lateral.
    "q_variant_explode" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .createOrReplaceTempView("graft_variant_v")
      s.sql(
        """SELECT event_id, f.pos AS pos, f.key AS key,
          |  variant_get(f.value, '$', 'int') AS val
          |FROM graft_variant_v,
          |LATERAL variant_explode(v) AS f""".stripMargin)
    }),

    // Map family: dynamic qualifiers as MapType + map_filter + explode.
    "q_map_ops" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          map(
            lit("type"), col("event_type"),
            lit("uid"), col("user_id").cast("string")).as("quals"))
        .select(col("event_id"),
          explode(map_filter(col("quals"), (k, _) => k === "type"))
            .as(Seq("qual", "val"))))
  )

  val oracle = Map(
    "q_scalar_string" ->
      """SELECT doc_id,
        |  upper(substr(text, 1, 10)) AS head10,
        |  length(text) AS text_len,
        |  regexp_replace(substr(text, 1, 40), '\s+', '_', 'g') AS head40_snake,
        |  concat_ws('|', lang, source) AS tag,
        |  lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
        |  translate(lang, 'en', 'EN') AS lang_up,
        |  levenshtein(lang, 'en') AS lev_en,
        |  trim('  x  ') AS trimmed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  CAST(day(o_orderdate) AS INTEGER) AS o_day,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(l_quantity), 6) AS sqrt_qty,
        |  round(pow(1.0 + l_discount, 2), 6) AS disc_sq,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  round(abs(l_discount - 0.05), 6) AS disc_dev,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  l_orderkey % 7 AS key_mod7
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scalar_cond" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0.0 THEN 'debt'
        |       WHEN c_acctbal < 5000.0 THEN 'mid'
        |       ELSE 'rich' END AS bal_band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS seg_or_none,
        |  greatest(c_acctbal, 0.0) AS bal_pos,
        |  least(c_acctbal, 0.0) AS bal_neg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_scalar_hash" ->
      """SELECT doc_id, md5(text) AS md5_text, sha256(text) AS sha256_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_scalar_array" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
        |  round(CAST(list_aggregate(embedding, 'sum') AS DOUBLE), 6) AS el_sum,
        |  round(CAST(list_min(embedding) AS DOUBLE), 6) AS el_min,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS el_max
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_generator" ->
      """SELECT vec_id, CAST(i - 1 AS INT) AS pos,
        |  round(CAST(embedding[CAST(i AS INT)] AS DOUBLE), 6) AS el
        |FROM (SELECT vec_id, embedding,
        |        unnest(range(1, len(embedding) + 1)) AS i
        |      FROM embeddings WHERE vec_id < 8)""".stripMargin,
    "q_scalar_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q_scalar_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(NULL AS INTEGER) AS absent_val,
        |  CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50.0
        |    AS INTEGER) AS k_high
        |FROM events ORDER BY event_id""".stripMargin,
    "q_map_ops" ->
      """SELECT event_id, 'type' AS qual, event_type AS val
        |FROM events ORDER BY event_id""".stripMargin,
    // Every props payload is {"k": <int>}: the inferred schema is the
    // constant OBJECT<k: BIGINT>, k is never a JSON null, and the null
    // literal always is — the oracle replays those invariants, so a
    // drifted inference or null-conflation fails the hash.
    "q_variant_ops" ->
      """SELECT event_id, 'OBJECT<k: BIGINT>' AS vschema,
        |  0 AS k_is_null, 1 AS null_lit_is_null
        |FROM events ORDER BY event_id""".stripMargin,
    "q_variant_explode" ->
      """SELECT event_id, 0 AS pos, 'k' AS key,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS val
        |FROM events ORDER BY event_id""".stripMargin
  )
}
