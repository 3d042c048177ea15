package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer under the ranking (score DESC, id ASC): a binary
  * min-heap whose root is the WORST kept pair, so admission is O(1) reject
  * or O(log k) replace and memory is exactly k pairs of primitives — the
  * property that makes the aggregate's partial (map-side) state per group
  * O(k) regardless of how many candidate rows a partition feeds it.
  */
final class TopKHeap(val k: Int) extends Serializable {
  val scores = new Array[Double](math.max(k, 1))
  val ids = new Array[Long](math.max(k, 1))
  var n = 0

  // Element i ranks STRICTLY below element j under (score DESC, id ASC).
  // Total order via Double.compare — `<` on raw doubles is false for any
  // NaN operand, which would let an under-full-admitted NaN reach the
  // root and reject every later candidate. Double.compare ranks NaN
  // above every real score (and -0.0 below 0.0), matching Spark's own
  // DESC sort order, so the heap keeps window-rank parity on NaN input.
  private def worse(si: Double, ii: Long, sj: Double, ij: Long): Boolean = {
    val c = java.lang.Double.compare(si, sj)
    c < 0 || (c == 0 && ii > ij)
  }

  def insert(s: Double, id: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1
      var i = n - 1
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else i = 0
      }
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true
        else { swap(i, m); i = m }
      }
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  /** Kept pairs best-first: (score DESC, id ASC) under the same total
    * order as admission (NaN first, like Spark's DESC sort). */
  def sortedPairs: IndexedSeq[(Double, Long)] =
    (0 until n).map(i => (scores(i), ids(i)))
      .sortWith { case ((s1, i1), (s2, i2)) =>
        val c = java.lang.Double.compare(s1, s2)
        c > 0 || (c == 0 && i1 < i2)
      }
}

/** Exact per-group top-k as a native [[TypedImperativeAggregate]]:
  * `cos_topk(score, id, k)` keeps the k best (score DESC, id ASC) pairs
  * and evaluates to `ARRAY<STRUCT<cos: DOUBLE, cid: BIGINT>>`, best
  * first.
  *
  * Why an aggregate and not `row_number() OVER (...) <= k`: the window
  * form needs every candidate row shuffled to its group's reducer before
  * the rank filter (WindowGroupLimit's partial mode bounds that to k per
  * map partition, but still pays a per-group SORT on the reduce side and
  * requires the window's clustered-distribution shuffle). The aggregate
  * form rides the normal partial-aggregation path: each map task folds
  * its candidate stream into O(k) heap state per group, the exchange
  * moves serialized heaps (not rows), and the final merge is
  * O(partials·log k) with no sort. At 100 TB with millions of query
  * groups that is the difference between shuffling candidate ROWS and
  * shuffling bounded STATE. Merge is order-independent (bounded
  * semilattice join), so the result is deterministic under any task
  * scheduling — ties broken by id, never by arrival.
  *
  * Admission, merge, and serialization all run on primitive arrays; no
  * boxing in the hot path (brief preference order: native expression
  * over UDAF/Aggregator, which would pay Encoder round-trips per row).
  *
  * DEPLOYMENT NOTE — `spark.sql.objectHashAggregate.sortBased
  * .fallbackThreshold` (default 128). `ObjectHashAggregateExec` counts
  * in-memory hash-map GROUPS and falls back to sort-based aggregation
  * past the threshold — and every CosTopK call site holds 10³–10⁵ query
  * groups per task, so at the 128-row default NONE of them actually
  * aggregate hash-wise: the candidate stream gets sorted by group key
  * (the very sort this aggregate exists to avoid) and, at scale, spilled.
  * Measured on the 100× corpus (1.6G-pair block product, 8k groups,
  * STRESS_r08.md §5): default threshold OOMs an 8 GiB harness outright
  * (spill read-ahead buffers × 32 tasks); with 48 GiB it completes in
  * 157.6 s warm; raising the threshold to 65,536 completes on the
  * DEFAULT 8 GiB heap in 43.5 s — 3.6× faster than the 6×-memory
  * sort-based run. Every session builder in this repo sets 65,536
  * (worst-case map cost ≈ threshold × ~300 B ≈ 20 MB/task — bounded
  * insurance); deployments embedding this aggregate elsewhere should
  * size the threshold to expected groups-per-task the same way. */
case class CosTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"cos_topk k must be positive, got $k")
    else (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"cos_topk requires (DOUBLE score, BIGINT id), got ($s, $i)")
    }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cos", DoubleType, nullable = false),
      StructField("cid", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "cos_topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var j = 0
    while (j < other.n) { buf.insert(other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedPairs.map { case (s, id) =>
      InternalRow(s, id)
    }.toArray[Any])

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(k)
    val m = bb.getInt
    var i = 0
    while (i < m) { val s = bb.getDouble; val d = bb.getLong; h.insert(s, d); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CosTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CosTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CosTopK =
    copy(score = newChildren(0), id = newChildren(1))
}
