package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership test of a BIGINT key against a
  * serialized Bloom filter — the scan-side half of semi-join reduction
  * (a.k.a. runtime filtering), THE standard trick for joining a 100 TB
  * fact table against a selective dimension. The filter is built once
  * from the dimension keys (a tree-aggregated Spark job via
  * `DataFrameStatFunctions.bloomFilter`), serialized into this
  * expression as a foldable BINARY literal, and applied to every fact
  * row BEFORE the shuffle/join: non-matching rows (all but the fpp
  * fraction) never leave the scan stage. An exact join afterwards
  * removes the false positives, so end-to-end semantics stay exact.
  *
  * Deserialization happens once per deserialized expression instance
  * (`@transient lazy val`), not per row; codegen emits a single virtual
  * call on the referenced instance, so the probe stays inside the
  * whole-stage-codegen span of the scan's filter.
  *
  * Reference: the reference engine ships whole source tables to the
  * warehouse and lets BigQuery prune at query time
  * (`/root/reference/functions/utils/datasources.py:41-58`); on Spark the
  * equivalent lever for join pruning is a runtime Bloom filter.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a foldable (literal) filter argument")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (BINARY, BIGINT) inputs, got $l and $r")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  /** Folded once per deserialized instance — checkInputDataTypes
    * guarantees `left` is foldable, so its value (and null-ness) is
    * constant; both eval() and codegen consult this instead of
    * re-folding per row. */
  @transient private lazy val filterBytes: Array[Byte] =
    left.eval(null).asInstanceOf[Array[Byte]]

  /** Deserialized once per task (the expression tree is shipped in the
    * task binary; the lazy val re-materializes on first probe). */
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  /** Codegen entry point — one call per row, no allocation. */
  def test(v: Long): Boolean = filter.mightContainLong(v)

  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    if (v == null || filterBytes == null) null
    else test(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference `this` so generated code probes the lazily-deserialized
    // filter instead of re-reading the byte array per row (the pattern
    // Spark's own runtime-filter expression uses).
    val ref = ctx.addReferenceObj(
      "graftBloom", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.test($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  /** Serialize a built filter for embedding as a BINARY literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Build a serialized filter over a BIGINT dimension column. Handles
    * the empty-dimension case (Spark's `stat.bloomFilter` aggregate
    * yields a null sketch there) with an inserted-nothing filter, so the
    * probe correctly rejects every fact row. The `limit(1)` emptiness
    * probe is O(one row) even on a large dimension. */
  def build(df: org.apache.spark.sql.DataFrame, col: String,
      expected: Long, fpp: Double): Array[Byte] =
    if (df.limit(1).isEmpty) serialize(BloomFilter.create(1L, fpp))
    else serialize(df.stat.bloomFilter(col, expected, fpp))
}
