package graft

import graft.api.MultimodalDecode
import org.apache.spark.sql.functions._

/** The batch decode harness: typed partition-at-a-time plumbing with the
  * stubbed decoder — schema in/out, determinism, and partition-count
  * preservation (no shuffle in the decode stage).
  */
class MultimodalDecodeSpec extends SparkSpec {

  private def payloads = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text").cast("binary").as("content"),
      lit("text/plain").as("mime"))

  test("decode emits one metadata row per payload with faithful sizes") {
    val in = payloads
    val out = MultimodalDecode.decodeDF(in)
    assert(out.count() === in.count())
    assert(out.schema.fieldNames.toSet ===
      Set("doc_id", "mime", "n_bytes", "width", "height", "ok"))
    // n_bytes must equal the binary length (decoder saw the real payload)
    val joined = out.join(in.select(col("doc_id"),
      length(col("content")).cast("long").as("expect_bytes")), "doc_id")
    assert(joined.filter(col("n_bytes") =!= col("expect_bytes")).count() === 0)
    assert(out.filter(!col("ok")).count() === 0)
  }

  test("features: exact byte histogram, all 16 bins, map-only") {
    import spark.implicits._
    val in = Seq((1L, "abc".getBytes("UTF-8"), "text/plain"),
      (2L, Array.empty[Byte], "text/plain"))
      .toDF("doc_id", "content", "mime")
    val out = MultimodalDecode.featuresDF(in)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length === 32, "16 bins per payload, empty included")
    val d1 = rows.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    // 'a'=97 -> bin 1, 'b'=98 -> bin 2, 'c'=99 -> bin 3
    assert(d1(1) === 1L && d1(2) === 1L && d1(3) === 1L)
    assert(d1.values.sum === 3L)
    assert(rows.filter(_._1 == 2L).forall(_._3 == 0L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "feature stage must not shuffle")
  }

  test("decode is deterministic and map-only (no shuffle)") {
    val a = MultimodalDecode.decodeDF(payloads)
    val b = MultimodalDecode.decodeDF(payloads)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "decode stage must not shuffle")
  }
}
