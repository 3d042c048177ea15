package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[CosTopK]] — the bounded top-k aggregate: heap semantics (eviction,
  * ties, under-full), partial-merge correctness across forced map-side
  * partials, serialization roundtrip, and end-to-end parity with the
  * window-rank formulation it replaces at scale. */
class CosTopKSpec extends SparkTestBase {

  test("heap keeps the k best under (score DESC, id ASC) and evicts the worst") {
    val h = new TopKHeap(3)
    Seq((0.1, 1L), (0.9, 2L), (0.5, 3L), (0.7, 4L), (0.2, 5L))
      .foreach { case (s, i) => h.insert(s, i) }
    assert(h.sortedPairs == IndexedSeq((0.9, 2L), (0.7, 4L), (0.5, 3L)))
  }

  test("ties rank by id ascending, including at the admission boundary") {
    val h = new TopKHeap(2)
    // three equal scores: ids 7, 3, 5 — keep 3 then 5, evict 7
    h.insert(0.5, 7L); h.insert(0.5, 3L); h.insert(0.5, 5L)
    assert(h.sortedPairs == IndexedSeq((0.5, 3L), (0.5, 5L)))
    // an equal-score HIGHER id must not displace a kept lower id
    h.insert(0.5, 9L)
    assert(h.sortedPairs == IndexedSeq((0.5, 3L), (0.5, 5L)))
  }

  test("NaN scores keep a total order: NaN ranks first and never wedges the heap") {
    // raw `<` is false for any NaN comparison — an under-full-admitted
    // NaN at the root would then reject every later candidate. The
    // Double.compare order ranks NaN above all real scores (Spark's
    // DESC sort does the same), so admission keeps working.
    val h = new TopKHeap(2)
    h.insert(Double.NaN, 9L)
    h.insert(0.5, 1L); h.insert(0.8, 2L); h.insert(0.9, 3L)
    val kept = h.sortedPairs
    assert(kept.map(_._2) == IndexedSeq(9L, 3L), s"got $kept")
    assert(kept.head._1.isNaN)
    // a heap full of real scores still rejects below-root candidates
    val h2 = new TopKHeap(2)
    h2.insert(0.9, 1L); h2.insert(0.8, 2L)
    h2.insert(Double.NaN, 5L) // NaN ranks above both: evicts 0.8
    assert(h2.sortedPairs.map(_._2) == IndexedSeq(5L, 1L))
  }

  test("NaN parity with the window-rank formulation (Spark ranks NaN largest)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, Double.NaN, 1L), (1L, 0.9, 2L), (1L, 0.7, 3L),
      (1L, Double.NaN, 4L), (1L, 0.8, 5L)).toDF("g", "s", "id")
      .repartition(3).cache()
    val viaAgg = df.groupBy($"g")
      .agg(graft.functions.Kit.cosTopK($"s", $"id", 3).as("top"))
      .select(expr("transform(top, t -> t.cid)").as("ids"))
      .as[Seq[Long]].collect().head
    val w = Window.partitionBy($"g").orderBy($"s".desc, $"id".asc)
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .where($"rk" <= 3).orderBy($"rk")
      .select($"id").as[Long].collect().toSeq
    assert(viaAgg == viaWindow, s"agg $viaAgg vs window $viaWindow")
    assert(viaAgg == Seq(1L, 4L, 2L))
    df.unpersist()
  }

  test("under-full buffer returns everything it saw, best first") {
    val h = new TopKHeap(10)
    h.insert(0.2, 2L); h.insert(0.8, 1L)
    assert(h.sortedPairs == IndexedSeq((0.8, 1L), (0.2, 2L)))
  }

  test("serialize/deserialize roundtrips the kept set") {
    val agg = CosTopK(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0),
      org.apache.spark.sql.catalyst.expressions.Literal(0L), 3)
    val h = new TopKHeap(3)
    Seq((0.9, 2L), (0.5, 3L), (0.7, 4L)).foreach { case (s, i) => h.insert(s, i) }
    val back = agg.deserialize(agg.serialize(h))
    assert(back.sortedPairs == h.sortedPairs)
  }

  test("aggregate result is partition-count-invariant (partial merge is exact)") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => (i % 7, (i * 2654435761L % 1000) / 1000.0, i))
    def run(parts: Int) = rows.toDF("g", "s", "id")
      .repartition(parts)
      .groupBy($"g")
      .agg(graft.functions.Kit.cosTopK($"s", $"id", 5).as("top"))
      .select($"g", $"top")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(
        x => (x.getDouble(0), x.getLong(1))))
      .toMap
    val one = run(1)
    val many = run(13)
    assert(one == many)
    assert(one.values.forall(_.length == 5))
  }

  test("SQL name via extensions: cos_topk callable from spark.sql") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 0.9, 10L), (1L, 0.5, 11L), (1L, 0.7, 12L))
      .toDF("g", "s", "id").createOrReplaceTempView("ctk_in")
    val top = spark.sql(
      "SELECT cos_topk(s, id, 2) AS top FROM ctk_in GROUP BY g")
      .select(expr("transform(top, t -> t.cid)").as("ids"))
      .as[Seq[Long]].collect().head
    assert(top == Seq(10L, 12L))
  }

  test("aggregate matches the window-rank formulation per group") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 300L)
      .map(i => (i % 5, (i * 40503L % 997) / 997.0, i))
      .toDF("g", "s", "id").repartition(7).cache()
    val viaAgg = df.groupBy($"g")
      .agg(graft.functions.Kit.cosTopK($"s", $"id", 4).as("top"))
      .select($"g", posexplode($"top").as(Seq("rk", "t")))
      .select($"g", $"rk", $"t.cid".as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy($"g").orderBy($"s".desc, $"id".asc)
    val viaWindow = df
      .withColumn("rk", row_number().over(w) - 1)
      .where($"rk" < 4)
      .select($"g", $"rk", $"id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
    df.unpersist()
  }
}
