// Native Catalyst expressions must name `AbstractDataType` (the
// ImplicitCastInputTypes contract), which Spark declares private[sql] —
// so, like every out-of-tree native expression, these live under the
// org.apache.spark.sql namespace. Only public expression APIs are used.
package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}

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
