package graft.ops

import graft.SparkTestBase

/** K-means contract: planted clusters are recovered, results are
  * deterministic, and determinism survives repartitioning (the integer-
  * sum centroid update is order-independent; a double-average would
  * fail the repartition case). */
class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  // three well-separated planted clusters around (0,0), (1000,0), (0,1000)
  private def planted = {
    val pts =
      (0 until 20).map(i => (i.toLong, Seq(0L + i % 3, 0L + (i % 5)))) ++
      (20 until 40).map(i => (i.toLong, Seq(1000L + i % 3, 0L + (i % 5)))) ++
      (40 until 60).map(i => (i.toLong, Seq(0L + i % 3, 1000L + (i % 5))))
    pts.toDF("vec_id", "qe")
  }

  test("planted clusters are recovered exactly") {
    val cents = Clustering.kmeansCentroids(planted, k = 3, iters = 5)
    val assign = Clustering.kmeansAssign(planted, cents)
      .as[(Long, Int)].collect().toMap
    // every planted group lands in one cluster, and the groups differ
    val g0 = (0L until 20L).map(assign).toSet
    val g1 = (20L until 40L).map(assign).toSet
    val g2 = (40L until 60L).map(assign).toSet
    assert(g0.size == 1 && g1.size == 1 && g2.size == 1)
    assert(Set(g0.head, g1.head, g2.head).size == 3)
  }

  test("centroids are identical across runs and across repartitioning") {
    val a = Clustering.kmeansCentroids(planted, k = 3, iters = 4)
    val b = Clustering.kmeansCentroids(planted, k = 3, iters = 4)
    val c = Clustering.kmeansCentroids(planted.repartition(7), k = 3, iters = 4)
    assert(a == b)
    assert(a == c, "centroid update is not order-independent")
  }

  test("driver-local Lloyd rounds are centroid-identical to distributed") {
    // the r12 LocalTrainGate routes gate-sized corpora to lloydLocal;
    // its rounds must be BIT-equal to the distributed join loop from
    // the same init — including a deliberately empty cluster (the far
    // sentinel init) and a ragged tie landscape
    val base = planted
      .withColumn("nrm", graft.functions.Kit.dotI64(
        org.apache.spark.sql.functions.col("qe"),
        org.apache.spark.sql.functions.col("qe")))
      .persist()
    val init = Seq(Seq(0L, 0L), Seq(900L, 50L), Seq(50L, 900L),
      Seq(100000L, 100000L)) // 4th centroid owns nothing
    val dist = Clustering.lloydJoinDistributed(base, init, iters = 4)
    val local = Clustering.lloydLocal(
      base.select("qe").as[Seq[Long]].collect().map(_.toArray),
      init, iters = 4)
    base.unpersist()
    assert(local == dist)
    assert(local(3) == Seq(100000L, 100000L)) // empty cluster kept
  }

  test("an empty cluster keeps its previous centroid instead of vanishing") {
    // k=3 over two tight groups: one init centroid ends up owning nothing
    val pts = ((0 until 10).map(i => (i.toLong, Seq(0L, 0L))) ++
      (10 until 20).map(i => (i.toLong, Seq(1000L, 1000L)))).toDF("vec_id", "qe")
    val cents = Clustering.kmeansCentroids(pts, k = 3, iters = 3)
    assert(cents.size == 3)
    assert(cents.distinct.size >= 2) // the two populated clusters converged
  }
}
