// Native Catalyst expressions must name `AbstractDataType` (the
// ImplicitCastInputTypes contract), which Spark declares private[sql] —
// so, like every out-of-tree native expression, these live under the
// org.apache.spark.sql namespace. Only public expression APIs are used.
package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}

/** Per-row kernels behind [[MinHashSig]] and [[SimHash60]]. Top-level
  * object with no companion class, so Scala emits static forwarders —
  * generated Java from `doGenCode` calls these directly.
  *
  * Hash semantics are BIT-IDENTICAL to the composed built-in forms the
  * engine used before (and the DuckDB oracles still replay):
  *   hv  = conv(substring(md5(s), 1, 12), 16, 10)   — first 48 md5 bits
  *   h60 = conv(substring(md5(t), 1, 15), 16, 10)   — first 60 md5 bits
  * so swapping an operator onto these expressions cannot move a single
  * output hash — only the plan shape (no explode, no wide aggregate).
  */
object TextSigKernels {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Value of the first 12 hex chars of md5 = first 6 digest bytes,
    * big-endian (what `conv(substring(md5(s),1,12),16,10)` computes).
    */
  private def head48(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)

  /** Value of the first 15 hex chars of md5 = first 7 digest bytes plus
    * the high nibble of byte 7, big-endian (60 bits).
    */
  private def head60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** One-pass MinHash signature: for each shingle, ONE md5 → 48-bit hv,
    * then `perms` arithmetic permutations hv*(2p+1) mod 2^42 folded into
    * running minimums. Null elements are skipped (the exploded form's
    * md5(NULL) rows were ignored by min()); an array with no valid
    * element returns null (the exploded form emitted no group at all —
    * callers filter).
    */
  def minhashSig(shingles: ArrayData, perms: Int): ArrayData = {
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val digest = md5.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        digest.reset()
        val hv = head48(digest.digest(shingles.getUTF8String(i).getBytes))
        var p = 0
        while (p < perms) {
          val h = hv * (2 * p + 1) % (1L << 42)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    if (any) UnsafeArrayData.fromPrimitiveArray(mins) else null
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }

  /** One-pass sliding-window gram hashes: md5 hex of each `n`-token
    * window joined by a single space — bit-identical to
    * `md5(concat-joined gramsN window)` but with no intermediate gram
    * strings or chained zip_with passes (the composed form ran n-1
    * interpreted array traversals per row and built every window string
    * twice). The digest streams token bytes + separators directly.
    * Windows containing a null token are dropped (the composed form's
    * null-propagating concat + filter); fewer than `n` tokens yields an
    * empty array, matching gramsN.
    */
  def gramMd5(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    val out = new java.util.ArrayList[AnyRef](math.max(0, len - n + 1))
    val digest = md5.get()
    val space = ' '.toByte
    var i = 0
    while (i + n <= len) {
      var ok = true
      var j = i
      while (ok && j < i + n) { if (words.isNullAt(j)) ok = false; j += 1 }
      if (ok) {
        digest.reset()
        var k = i
        while (k < i + n) {
          if (k > i) digest.update(space)
          digest.update(words.getUTF8String(k).getBytes)
          k += 1
        }
        out.add(hex(digest.digest()))
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Value of the first 8 hex chars of md5 = first 4 digest bytes,
    * big-endian unsigned (32 bits).
    */
  private def head32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  /** One-pass MOSS winnowing (GraftOps.winnowFingerprints semantics,
    * whole derivation per document): gram hashes packed as
    * hash·2²⁰ + (2²⁰−1−pos) so a plain sliding min is "min hash,
    * rightmost on ties", ragged tail windows included, then distinct +
    * ascending sort. Returns (n_grams, sorted selected keys) or null
    * when the doc has no gram — the exploded form emitted no rows for
    * it. Bit-identical to the posexplode → window-min → collect_set
    * pipeline this replaces; the difference is plan shape: that pipeline
    * shuffled and SORTED one row per corpus gram to satisfy the
    * doc-partitioned window, this is a map-side array pass.
    */
  def winnowSels(words: ArrayData, gramN: Int,
                 window: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val posCap = 1L << 20
    val len = words.numElements()
    val digest = md5.get()
    val space = ' '.toByte
    // gram keys in position order (positions index the SURVIVING grams,
    // matching posexplode over the null-filtered gram array)
    val keys = new java.util.ArrayList[java.lang.Long](math.max(0, len - gramN + 1))
    var i = 0
    while (i + gramN <= len) {
      var ok = true
      var j = i
      while (ok && j < i + gramN) { if (words.isNullAt(j)) ok = false; j += 1 }
      if (ok) {
        digest.reset()
        var k = i
        while (k < i + gramN) {
          if (k > i) digest.update(space)
          digest.update(words.getUTF8String(k).getBytes)
          k += 1
        }
        val pos = keys.size()
        keys.add(head32(digest.digest()) * posCap + (posCap - 1 - pos))
      }
      i += 1
    }
    val nG = keys.size()
    if (nG == 0) return null
    val sels = new java.util.TreeSet[java.lang.Long]()
    var p = 0
    while (p < nG) {
      var m = keys.get(p).longValue()
      var q = p + 1
      while (q < nG && q < p + window) {
        val v = keys.get(q).longValue()
        if (v < m) m = v
        q += 1
      }
      sels.add(m)
      p += 1
    }
    val out = new Array[Long](sels.size())
    val it = sels.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nG.toLong, UnsafeArrayData.fromPrimitiveArray(out)))
  }

  /** One-pass n-gram repetition statistics: occurrence counts of every
    * n-token gram (duplicates preserved, null-bearing windows dropped —
    * gramsN semantics), reduced to (total grams, top gram count, grams
    * belonging to a >1-occurrence class). Integer-only, so identical to
    * the exploded groupBy derivation under any aggregation order.
    * Returns null when the doc has no gram (the exploded form emitted
    * no group).
    */
  def gramStats(words: ArrayData, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val len = words.numElements()
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int]()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var tot = 0L
    var i = 0
    while (i + n <= len) {
      var ok = true
      var j = i
      while (ok && j < i + n) { if (words.isNullAt(j)) ok = false; j += 1 }
      if (ok) {
        // materialize the gram key (joined by single spaces) — the same
        // string the exploded form grouped on
        var g = words.getUTF8String(i)
        var k = i + 1
        while (k < i + n) {
          g = org.apache.spark.unsafe.types.UTF8String.concat(g, sep,
            words.getUTF8String(k))
          k += 1
        }
        counts.merge(g, 1, (a, b) => a + b)
        tot += 1
      }
      i += 1
    }
    if (tot == 0) return null
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](tot, top, dup))
  }

  /** One-pass 60-bit tf-weighted SimHash: per token ONE md5 → 60-bit h,
    * per-bit popularity counters, fingerprint bit i set iff
    * 2*popularity(i) > tokenCount (ties to 0 — same as the aggregated
    * `when(b*2 > n)` form). Returns null for an array with no valid
    * token (the exploded form emitted no group — callers filter).
    */
  def simhash60(tokens: ArrayData): java.lang.Long = {
    val pop = new Array[Int](60)
    var count = 0
    val digest = md5.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        count += 1
        digest.reset()
        val h = head60(digest.digest(tokens.getUTF8String(i).getBytes))
        var b = 0
        while (b < 60) {
          pop(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    if (count == 0) return null
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (2 * pop(b) > count) fp |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  /** One-pass indexed character q-grams: every q-char window of `s` as
    * (gram, occ) where occ numbers repeated grams 1, 2, … in position
    * order — bit-identical to the composed
    * `transform(grams, (g, i) -> (g, size(filter(slice(grams, 1, i),
    * x -> x = g)) + 1))` form, whose interpreted slice+filter lambdas
    * were O(L²) per string (the measured hot stage of the fuzzy-join
    * gram index). Here a per-row hash map makes it O(L). Fewer than q
    * chars yields an empty array.
    */
  def gramOcc(s: org.apache.spark.unsafe.types.UTF8String,
              q: Int): ArrayData = {
    val n = s.numChars()
    if (n < q)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val out = new Array[Any](n - q + 1)
    val seen =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    var i = 0
    while (i + q <= n) {
      val g = s.substringSQL(i + 1, q)
      val occ = seen.getOrDefault(g, 0) + 1
      seen.put(g, occ)
      out(i) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](g, occ))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codegen'd whole-signature MinHash (SURVEY.md §2.9 dedup tier, §2.10
  * custom-scalar extension point): `minhash_sig(shingles, perms)` →
  * array<bigint>. Replaces the tall form's corpus-scale
  * explode → md5/conv per row → 16-way min hash-aggregate with a single
  * map-side pass per document: the signature stage of near-dup/LSH no
  * longer materializes one row per shingle or pays a per-doc aggregation
  * at all. Bit-identical to the tall form (see [[TextSigKernels]]), so
  * the DuckDB oracles that replay the exploded SQL still hash-match.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  // multiplier 2p+1 <= 39 keeps hv*(2p+1) under 2^54 — the same no-
  // overflow contract the composed form documents (perms <= 20)
  private def checkPerms(p: Int): Int = {
    require(p >= 1 && p <= 20, s"minhash_sig perms must be in [1, 20], got $p")
    p
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextSigKernels.minhashSig(a.asInstanceOf[ArrayData],
      checkPerms(b.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($b < 1 || $b > 20) {
         |  throw new IllegalArgumentException(
         |    "minhash_sig perms must be in [1, 20], got " + $b);
         |}
         |${ev.value} = org.apache.spark.sql.graft.TextSigKernels.minhashSig($a, $b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd sliding-window gram hashing: `gram_md5(words, n)` →
  * array<string> of md5 hex, one per n-token window. Replaces the
  * explode(gramsN) + md5 pipeline of duplicate-span detection, whose
  * n-1 chained interpreted zip_with passes dominated the window=16
  * path. Bit-identical output (see [[TextSigKernels.gramMd5]]).
  */
case class GramMd5(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "gram_md5"

  private def checkN(n: Int): Int = {
    require(n >= 1, s"gram_md5 window must be >= 1, got $n")
    n
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextSigKernels.gramMd5(a.asInstanceOf[ArrayData],
      checkN(b.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($b < 1) {
         |  throw new IllegalArgumentException(
         |    "gram_md5 window must be >= 1, got " + $b);
         |}
         |${ev.value} = org.apache.spark.sql.graft.TextSigKernels.gramMd5($a, $b);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramMd5 =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd indexed character q-grams: `gram_occ(s, q)` →
  * array<struct<gram: string, occ: int>>, occ numbering repeated grams
  * in position order. Replaces the fuzzy-join gram index's O(L²)
  * interpreted slice+filter occurrence counting with one O(L) pass (see
  * [[TextSigKernels.gramOcc]] — bit-identical output).
  */
case class GramOcc(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("occ", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "gram_occ"

  private def checkQ(q: Int): Int = {
    require(q >= 1, s"gram_occ q must be >= 1, got $q")
    q
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextSigKernels.gramOcc(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      checkQ(b.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($b < 1) {
         |  throw new IllegalArgumentException(
         |    "gram_occ q must be >= 1, got " + $b);
         |}
         |${ev.value} = org.apache.spark.sql.graft.TextSigKernels.gramOcc($a, $b);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramOcc =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd whole-document MOSS winnowing:
  * `winnow_sels(words, gramN, window)` →
  * struct<n_grams: bigint, sels: array<bigint>> (sels sorted distinct
  * window minima). Replaces winnowFingerprints' posexplode → doc-
  * partitioned window sort → collect_set pipeline — which shuffled AND
  * sorted one row per corpus gram — with a single map-side pass per
  * document. NULL when the doc has no gram (the exploded form emitted
  * no rows). Bit-identical keys (see [[TextSigKernels.winnowSels]]).
  */
case class WinnowSels(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("sels", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_sels"

  private def check(gramN: Int, window: Int): Unit =
    require(gramN >= 2 && window >= 1,
      s"winnow_sels needs gramN >= 2 and window >= 1, got ($gramN, $window)")

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val (g, w) = (b.asInstanceOf[Int], c.asInstanceOf[Int])
    check(g, w)
    TextSigKernels.winnowSels(a.asInstanceOf[ArrayData], g, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      s"""
         |if ($b < 2 || $c < 1) {
         |  throw new IllegalArgumentException(
         |    "winnow_sels needs gramN >= 2 and window >= 1, got (" + $b + ", " + $c + ")");
         |}
         |${ev.value} = org.apache.spark.sql.graft.TextSigKernels.winnowSels($a, $b, $c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): WinnowSels =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Codegen'd per-document n-gram repetition statistics:
  * `gram_stats(words, n)` → struct<tot: bigint, top: bigint, dup:
  * bigint>. Replaces repetitionStats' explode → groupBy(doc, gram) →
  * groupBy(doc) chain — two corpus-scale shuffles per gram order, for
  * quantities that are per-document all along. Integer aggregates only,
  * so bit-identical under any order (see [[TextSigKernels.gramStats]]).
  */
case class GramStats(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("tot", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "gram_stats"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val n = b.asInstanceOf[Int]
    require(n >= 1, s"gram_stats window must be >= 1, got $n")
    TextSigKernels.gramStats(a.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($b < 1) {
         |  throw new IllegalArgumentException(
         |    "gram_stats window must be >= 1, got " + $b);
         |}
         |${ev.value} = org.apache.spark.sql.graft.TextSigKernels.gramStats($a, $b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramStats =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd whole-fingerprint SimHash: `simhash60(tokens)` → bigint.
  * Replaces the tall form's explode → md5/conv per token → 60 long-sum
  * aggregate columns with a single map-side pass per document.
  * Bit-identical to the aggregated form (see [[TextSigKernels]]).
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override def nullSafeEval(a: Any): Any = {
    val r = TextSigKernels.simhash60(a.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("fp")
      s"""
         |java.lang.Long $tmp = org.apache.spark.sql.graft.TextSigKernels.simhash60($a);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
