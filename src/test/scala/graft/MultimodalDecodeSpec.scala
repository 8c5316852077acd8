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

  test("decode is deterministic and map-only (no shuffle)") {
    val a = MultimodalDecode.decodeDF(payloads)
    val b = MultimodalDecode.decodeDF(payloads)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "decode stage must not shuffle")
  }
}
