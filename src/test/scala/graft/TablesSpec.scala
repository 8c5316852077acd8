package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-normalization contract for the events table — the schema-drift
  * tripwire asked for by the round-6 verdict. The fixture generator has
  * shipped `ts` as both TIMESTAMP(NANOS) (arriving as a nanos long under
  * `nanosAsLong`) and timestamp[us] (arriving as TIMESTAMP_NTZ); a third
  * flip must fail HERE with a clear message, not as 21 downstream
  * analysis errors at the driver's gate.
  */
class TablesSpec extends SparkSpec {

  test("events ingest yields TimestampType at every shipped sf") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1")) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType === TimestampType,
        s"$dir/events.parquet did not normalize to TimestampType")
      assert(ev.limit(1).count() === 1)
    }
  }

  test("normalized ts is µs-aligned UTC matching the raw file") {
    // unix_micros is timezone-free; compare against DuckDB-equivalent
    // native read (NTZ cast in the UTC session) via a raw reload.
    val ev = Tables.events(spark, sf)
    val mn = ev.agg(min(unix_micros(col("ts")))).head().getLong(0)
    // fixture events are generated in 2024 (TESTDATA.md); an off-by-
    // 1000x unit error (ns read as µs, or a double divide) lands
    // centuries away from this window.
    val us2023 = 1672531200000000L
    val us2026 = 1767225600000000L
    assert(mn > us2023 && mn < us2026,
      s"min(ts)=$mn µs is outside the fixture's generation window " +
        "— unit mishandling in Tables.normalizeTs?")
  }

  test("normalizeTs converts a nanos-long column losslessly") {
    // the legacy physical encoding: TIMESTAMP(NANOS) + nanosAsLong
    // delivers a long of nanos; synthesize it since current fixtures
    // ship µs. 2024-01-10T00:00:00.000001Z = 1704844800000001 µs.
    val us = 1704844800000001L
    val df = spark.range(1).select(lit(us * 1000L).as("ts"))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).head().getLong(0) === us)
  }

  test("normalizeTs passes a µs timestamp column through unchanged") {
    val us = 1704844800000001L
    val ntz = spark.range(1)
      .select(timestamp_micros(lit(us)).cast(TimestampNTZType).as("ts"))
    val out = Tables.normalizeTs(ntz)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).head().getLong(0) === us)

    val ltz = spark.range(1).select(timestamp_micros(lit(us)).as("ts"))
    assert(Tables.normalizeTs(ltz).select(unix_micros(col("ts")))
      .head().getLong(0) === us)
  }

  test("normalizeTs fails loud on an unsupported physical type") {
    val df = spark.range(1).select(lit("2024-01-10").as("ts"))
    val e = intercept[IllegalStateException](Tables.normalizeTs(df))
    assert(e.getMessage.contains("normalizeTs"))
  }

  test("streaming reader starts on an EMPTY landing directory") {
    // the WAL-tailing deployment order: stream first, files later —
    // schema discovery must fall back, not throw UNABLE_TO_INFER_SCHEMA
    val dir = Files.createTempDirectory("graft_tablesspec_empty")
    val streamed = streaming.StreamOps.readEventStream(spark, dir.toString)
    assert(streamed.isStreaming)
    assert(streamed.schema("ts").dataType === TimestampType)
  }

  test("streaming reader agrees with the batch path on schema + rows") {
    // readEventStream discovers the raw schema from the directory and
    // must normalize identically to Tables.events; a one-batch drain
    // into memory proves it end to end on the real fixture.
    // the fixture is a single parquet FILE; the file stream source
    // tails a directory, so stage a landing dir holding a copy
    val dir = Files.createTempDirectory("graft_tablesspec_landing")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events-00000.parquet"))
    val streamed = streaming.StreamOps.readEventStream(spark, dir.toString)
    assert(streamed.schema("ts").dataType === TimestampType)
    val ckpt = Files.createTempDirectory("graft_tablesspec_ckpt")
    val q = streamed.writeStream.format("memory")
      .queryName("tables_spec_stream")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("tables_spec_stream").count() ===
        Tables.events(spark, sf).count())
    } finally {
      q.stop()
      spark.catalog.dropTempView("tables_spec_stream")
      // clean the staged copy + checkpoint out of /tmp (fixture-sized,
      // would otherwise accumulate per test run)
      for (root <- Seq(dir, ckpt)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }
}
