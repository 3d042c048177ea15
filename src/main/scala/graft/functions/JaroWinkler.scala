package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity in [0, 1] over two
  * strings — the fuzzy-match scorer Spark's function library lacks
  * (`levenshtein` is its only edit metric).
  *
  * Same design rationale as [[DotProductI64]]: this runs once per
  * candidate pair inside an entity-resolution join, so it must stay in
  * whole-stage codegen — a Scala UDF would break the codegen span AND pay
  * serialization per row. The generated code is a single static call into
  * [[JaroWinklerAlgo.score]] (the pattern Spark's own `levenshtein` uses
  * with `UTF8String.levenshteinDistance`).
  *
  * Convention: the classic Winkler variant — prefix bonus (common prefix
  * capped at 4, scale 0.1) applied only when the Jaro score exceeds 0.7;
  * transposition count is the standard half-count with integer division.
  * This matches DuckDB's `jaro_winkler_similarity` (a rapidfuzz port), so
  * quantized scores are oracle-checkable cross-engine (verified by the
  * `fuzzy_jw_entities` query at all three fixture scales).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires two STRING inputs, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerAlgo.score(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerAlgo.score($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** The scoring kernel — a top-level object so the generated Java can call
  * it through the static forwarder. Operates on code points via
  * `UTF8String.toString` (candidate strings are short; the two boolean
  * match arrays are the only allocations). */
object JaroWinklerAlgo {

  /** Jaro similarity: matches within the standard window
    * (max(|s|,|t|)/2 - 1), transpositions = half the count of
    * out-of-sequence matches (integer division). An EMPTY side scores
    * 0.0 — including both-empty, where the textbook says 1.0; DuckDB
    * (rapidfuzz) returns 0.0 there and cross-engine parity wins over
    * the textbook (divergence documented + pinned in JaroWinklerSpec). */
  def jaro(su: UTF8String, tu: UTF8String): Double = {
    val s = su.toString
    val t = tu.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(i + window, m - 1)
      var j = math.max(i - window, 0)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true
          tMatch(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var outOfSeq = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) outOfSeq += 1
        k += 1
      }
      i += 1
    }
    val md = matches.toDouble
    (md / n + md / m + (md - outOfSeq / 2) / md) / 3.0
  }

  /** Winkler boost: common-prefix bonus (≤4 chars, scale 0.1), applied
    * only above the classic 0.7 threshold. */
  def score(su: UTF8String, tu: UTF8String): Double = {
    val j = jaro(su, tu)
    if (j <= 0.7) return j
    val s = su.toString
    val t = tu.toString
    val max = math.min(4, math.min(s.length, t.length))
    var l = 0
    while (l < max && s.charAt(l) == t.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}
