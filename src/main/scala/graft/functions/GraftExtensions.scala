package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's `SparkSessionExtensions` hook: registers the native
  * expressions under SQL names so `spark.sql("SELECT dot_i64(a, b)")`
  * and the DataFrame API share one codegen'd implementation. Two entry
  * points, same registration:
  *
  *   - builder-time (cluster deployments, every session gets it):
  *     `spark.sql.extensions=graft.functions.GraftExtensions`, or
  *     `SparkSession.builder().withExtensions(new GraftExtensions)`
  *   - runtime (an already-built session, notebooks):
  *     `GraftExtensions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => LevenshteinThresholdRule)
  }
}

object GraftExtensions {
  private type FunctionDescriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Every SQL-exposed native function. One list so builder-time and
    * runtime registration can never drift. */
  val functions: Seq[FunctionDescriptor] = Seq(
    (FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[DotProductI64].getName, "dot_i64"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"dot_i64 takes 2 arguments, got ${children.size}")
        DotProductI64(children.head, children(1))
      }),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"jaro_winkler takes 2 arguments, got ${children.size}")
        JaroWinkler(children.head, children(1))
      }),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"bloom_might_contain takes 2 arguments, got ${children.size}")
        BloomMightContain(children.head, children(1))
      }),
    (FunctionIdentifier("cos_topk"),
      new ExpressionInfo(classOf[CosTopK].getName, "cos_topk"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"cos_topk takes 3 arguments (score, id, k), got ${children.size}")
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"cos_topk k must be an integer literal, got $other")
        }
        CosTopK(children.head, children(1), k).toAggregateExpression()
      }))

  /** Register into an existing session's function registry (and the
    * optimizer rule via the experimental extra-optimizations hook —
    * an already-built session's rule batches are immutable). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(LevenshteinThresholdRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinThresholdRule
  }
}
