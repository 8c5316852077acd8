package graft.api

import org.apache.spark.sql.{DataFrame, Dataset}

/** One media payload row entering the decode stage. */
case class MediaIn(doc_id: Long, content: Array[Byte], mime: String)

/** Decoded metadata leaving the decode stage. */
case class MediaMeta(doc_id: Long, mime: String, n_bytes: Long,
                     width: Int, height: Int, ok: Boolean)

/** Batch decode harness for opaque media columns — the Scala analog of a
  * mapInPandas decode stage: partition-at-a-time iteration so a real
  * decoder can amortize per-batch setup (native lib handles, model
  * weights) across every row of the partition instead of paying it per
  * row.
  *
  * The decoder body is a DETERMINISTIC STUB (this container ships no
  * imaging/audio libraries): it fakes width/height from content bytes.
  * Swapping in a real decoder changes ONLY `decodeOne`; the Spark-side
  * plumbing — typed schema in/out, per-partition batching, partition
  * sizing guidance — is the real, tested surface.
  *
  * 100-TB note: decode is pure map work — no shuffle. Size input
  * partitions by payload bytes (spark.sql.files.maxPartitionBytes), not
  * row counts, and repartition upstream if single files hold many large
  * payloads.
  */
object MultimodalDecode {

  /** STUB standing in for e.g. a JNI image decoder. Deterministic: fakes
    * dimensions from the first content bytes.
    */
  private def decodeOne(in: MediaIn): MediaMeta = {
    val b0 = if (in.content.nonEmpty) in.content(0) & 0xff else 0
    val b1 = if (in.content.length > 1) in.content(1) & 0xff else 0
    MediaMeta(in.doc_id, in.mime, in.content.length.toLong,
      width = 64 + b0 * 4, height = 64 + b1 * 4, ok = in.content.nonEmpty)
  }

  /** Decode a payload Dataset partition-at-a-time. */
  def decode(payloads: Dataset[MediaIn]): Dataset[MediaMeta] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { rows =>
      // per-partition setup for a real decoder would happen HERE, once
      rows.map(decodeOne)
    }
  }

  /** Convenience: DataFrame in (doc_id, content, mime), metadata out. */
  def decodeDF(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    decode(df.as[MediaIn]).toDF()
  }
}
