package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: Σ aᵢ·bᵢ over two BIGINT arrays.
  *
  * Why not `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (s,v) -> s+v)`:
  * higher-order functions are interpreted per row (lambda variables bound
  * reflectively, no codegen) AND the zip_with materializes an
  * intermediate array per row. In the similarity operators this is THE
  * hot loop — one dot product per (query × corpus) pair. This expression
  * generates a tight primitive `long` loop inside whole-stage codegen:
  * no allocation, no boxing, no virtual calls (brief preference order:
  * native `Expression` with `doGenCode` over UDFs).
  *
  * Semantics: null input array → null; a null ELEMENT in the overlapped
  * range → null (matching the higher-order formulation, where the null
  * propagates through zip_with and aggregate); arrays of unequal length
  * use the common prefix (zip_with would null-pad the shorter side and
  * thus return null — inputs here are fixed-dim embeddings, and the
  * prefix rule makes the expression total; the one deliberate
  * divergence, documented and tested).
  */
case class DotProductI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_i64 requires two ARRAY<BIGINT> inputs, got $l and $r")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_i64"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  // a null element can null the result even when both inputs are non-null
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI64 =
    copy(left = newLeft, right = newRight)
}
