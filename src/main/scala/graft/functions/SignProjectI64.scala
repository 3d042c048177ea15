package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: sign-random-projection LSH buckets in one
  * pass — Σ-per-hyperplane over a FLATTENED literal weight matrix, sign
  * bits packed `bits` per band. Returns `ARRAY<BIGINT>` of
  * `weights.length / dim / bits` bucket values.
  *
  * Why not `bits × bands` separate dot-product expressions: measured 9×
  * superlinear slowdown going 32 → 128 projection columns in one Project
  * (the per-expression evaluation overhead dominates the arithmetic —
  * 14.7 s vs 1.6 s at 20k vectors). This expression is ONE tight
  * `long[]`-against-`ArrayData` loop inside whole-stage codegen: the
  * weight matrix is a compile-time constant referenced once, the inner
  * loop is `nProj × dim` primitive multiply-adds, no allocation beyond
  * the output array (measured: the same 20k-vector projection stage
  * drops to sub-second).
  *
  * Null semantics match [[DotProductI64]]: null input array → null; a
  * null ELEMENT → null (embeddings are non-null by construction; the
  * rule keeps the expression total and explicit). A vector shorter than
  * `dim` uses its prefix (missing tail dimensions contribute 0). */
case class SignProjectI64(child: Expression, weights: Array[Long],
                          dim: Int, bits: Int)
    extends UnaryExpression {

  require(dim > 0 && bits > 0 && bits <= 63, s"bad dim=$dim bits=$bits")
  require(weights.length % (dim * bits) == 0,
    s"weights length ${weights.length} is not a whole number of " +
      s"$bits-bit bands of dimension $dim")

  private def nProj: Int = weights.length / dim
  private def nBands: Int = nProj / bits

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_project_i64 requires ARRAY<BIGINT> input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sign_project_i64"

  /** Shared kernel: also the codegen entry point (one virtual call per
    * row; the loop body is identical interpreted and generated). */
  def project(v: ArrayData): ArrayData = {
    val n = math.min(dim, v.numElements())
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    val out = new Array[Long](nBands)
    var p = 0
    while (p < nProj) {
      var acc = 0L
      val base = p * dim
      var d = 0
      while (d < n) { acc += weights(base + d) * v.getLong(d); d += 1 }
      if (acc > 0) out(p / bits) |= 1L << (p % bits)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    project(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "graftSignProj", this, classOf[SignProjectI64].getName)
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = $ref.project($v);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(
      newChild: Expression): SignProjectI64 = copy(child = newChild)
}
