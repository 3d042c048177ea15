package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared MD5 plumbing for the native LSH signature kernels (r12):
  * a thread-local digest (MessageDigest is stateful and expression
  * objects are shared across concurrent tasks) and the hex-prefix
  * arithmetic the SQL formulations pinned into every oracle.
  *
  * `prefix48(bytes)` == `CAST(conv(substr(md5(s), 1, 12), 16, 10) AS
  * BIGINT)` — the first 6 digest bytes as an unsigned big-endian
  * integer (< 2⁴⁸, so always positive in a long). `chunk32(bytes, c)`
  * == `CAST(conv(substr(md5hex, 8c+1, 8), 16, 10) AS BIGINT)` — hex
  * chars [8c+1, 8c+8] are digest bytes [4c, 4c+4). */
private[functions] object LshMd5 {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def digest(utf8: Array[Byte]): Array[Byte] = {
    val m = md.get()
    m.reset()
    m.digest(utf8)
  }

  def prefix48(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  def chunk32(d: Array[Byte], c: Int): Long = {
    var v = 0L
    var i = 4 * c
    val end = i + 4
    while (i < end) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }
}

/** Native Catalyst expression: the full 16-slot MinHash signature of a
  * per-document shingle-set array in ONE pass — per element, one MD5,
  * one mod-P fold into all 16 affine minima. Value-identical to the
  * SQL formulation every oracle replays
  * (`MIN((aᵢ · h + bᵢ) % P)` over `h = conv(substr(md5(s),1,12),16,10)
  * % P`), but with no explode, no hash-aggregate and no exchange — the
  * signature is a map-side property of the set row (optimization guide
  * §2.4). Returns ARRAY<BIGINT> of `a.length` slot minima; null input
  * array or empty set → null (callers filter empty sets, matching the
  * old absent-group semantics). */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long],
                      p: Long)
    extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty, "bad affine family")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING> input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  /** Shared kernel: also the codegen entry point (one virtual call per
    * row; the loop body is identical interpreted and generated). */
  def sig(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val k = a.length
    val out = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        seen = true
        val d = LshMd5.digest(v.getUTF8String(i).getBytes)
        val h = LshMd5.prefix48(d) % p
        var j = 0
        while (j < k) {
          val m = (a(j) * h + b(j)) % p
          if (m < out(j)) out(j) = m
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "graftMinHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $ref.sig($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)
}

/** Native Catalyst expression: the 48-bit SimHash fingerprint of a
  * shingle-set array in ONE pass — per element, one MD5; per bit, a ±1
  * vote; fingerprint bit set where the vote sum is positive.
  * Value-identical to the oracle's
  * `SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)` columns folded
  * through `CASE WHEN s_b > 0 THEN 1 << b END` (exact integer
  * arithmetic, order-independent). Null input or empty set → null. */
case class SimHashFp(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 48, s"bad bits=$bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires ARRAY<STRING> input, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_fp"

  def fp(v: ArrayData): Any = {
    val n = v.numElements()
    val votes = new Array[Int](bits)
    var seen = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        seen = true
        val d = LshMd5.digest(v.getUTF8String(i).getBytes)
        val h = LshMd5.prefix48(d)
        var bit = 0
        while (bit < bits) {
          if (((h >> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    if (!seen) null
    else {
      var out = 0L
      var bit = 0
      while (bit < bits) {
        if (votes(bit) > 0) out |= 1L << bit
        bit += 1
      }
      java.lang.Long.valueOf(out)
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    fp(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "graftSimHashFp", this, classOf[SimHashFp].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |Object fpRes = $ref.fp($v);
         |if (fpRes == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) fpRes).longValue(); }
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(
      newChild: Expression): SimHashFp = copy(child = newChild)
}

/** Native Catalyst expression: the fuzzy-entity 16-slot signature over
  * a name-gram array in ONE pass — per element, the 4 slot-group MD5s
  * (`md5(g || '|' || grp)`), each contributing 4 disjoint 32-bit
  * chunks, folded into 16 minima. Value-identical to
  * [[graft.ops.FuzzyBand]]'s SQL formulation
  * (`MIN(CAST(conv(substr(md5(g || '|grp'), 8c+1, 8), 16, 10) AS
  * BIGINT))` per slot i = 4·grp + c). Null input or empty set → null. */
case class FuzzyBandSig(child: Expression, groups: Int, chunks: Int)
    extends UnaryExpression {

  require(groups > 0 && groups <= 10 && chunks > 0 && chunks <= 4,
    "bad geometry") // grp renders as ONE ascii digit in the md5 suffix

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fuzzy_band_sig requires ARRAY<STRING> input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "fuzzy_band_sig"

  def sig(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val k = groups * chunks
    val out = Array.fill(k)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        seen = true
        val g = v.getUTF8String(i).getBytes
        var grp = 0
        while (grp < groups) {
          // md5(g || '|' || grp) — grp is a single ASCII digit (≤ 9)
          val buf = java.util.Arrays.copyOf(g, g.length + 2)
          buf(g.length) = '|'
          buf(g.length + 1) = ('0' + grp).toByte
          val d = LshMd5.digest(buf)
          var c = 0
          while (c < chunks) {
            val m = LshMd5.chunk32(d, c)
            val slot = grp * chunks + c
            if (m < out(slot)) out(slot) = m
            c += 1
          }
          grp += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "graftFuzzyBandSig", this, classOf[FuzzyBandSig].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $ref.sig($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(
      newChild: Expression): FuzzyBandSig = copy(child = newChild)
}
