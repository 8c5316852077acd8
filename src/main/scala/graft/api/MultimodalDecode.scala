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
    // NULL payload = corrupt feed row: decode "fails" loudly (ok=false,
    // zero bytes) instead of NPE-ing the partition
    val c = if (in.content == null) Array.emptyByteArray else in.content
    val b0 = if (c.nonEmpty) c(0) & 0xff else 0
    val b1 = if (c.length > 1) c(1) & 0xff else 0
    MediaMeta(in.doc_id, in.mime, c.length.toLong,
      width = 64 + b0 * 4, height = 64 + b1 * 4, ok = c.nonEmpty)
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

  /** Per-payload byte histogram features — REAL byte work (not a stub):
    * 16 bins over `byte & 0xff mod 16`, the stand-in position where an
    * image pipeline runs its embedding/feature model. Same partition-at-
    * a-time shape as [[decode]] (a real model would load weights once per
    * partition here); output is tall (doc_id, bin, cnt) with all 16 bins
    * present per doc — fixed-arity rows keep the result oracle-comparable
    * (array cells are unsortable in the driver's pandas comparator).
    */
  def features(payloads: Dataset[MediaIn]): Dataset[MediaFeat] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { rows =>
      rows.flatMap { in =>
        // a NULL payload (corrupt feed row) yields no features — absent
        // rows are the loud signal; a real pipeline joins back against
        // the manifest to count them
        if (in.content == null) Iterator.empty
        else {
          val hist = new Array[Long](16)
          var i = 0
          while (i < in.content.length) {
            hist((in.content(i) & 0xff) % 16) += 1; i += 1
          }
          (0 until 16).iterator.map(b => MediaFeat(in.doc_id, b, hist(b)))
        }
      }
    }
  }

  def featuresDF(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    features(df.as[MediaIn]).toDF()
  }
}

/** One histogram-bin feature row leaving the feature stage. */
case class MediaFeat(doc_id: Long, bin: Int, cnt: Long)
