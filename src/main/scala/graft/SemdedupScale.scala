package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Clustering, ParallelismFloor}

/** Scale evidence for ADAPTIVE-K semantic dedup — the production form of
  * `semdedup_prune` (which pins k = 8 for its unrolled-CTE oracle).
  * Runs the full pipeline at k = semdedupK(n) (≈ n / target-cluster-
  * size, so intra-cluster pairwise work is n·target/2, linear in the
  * corpus) over a gen_stress.py corpus, whose ~1% planted near-identical
  * pairs (cos ≈ 0.987) give the τ = 0.90 verdict true positives without
  * any in-query plant. Prints one JSON line: n, k, census totals, wall.
  *
  *   sbt 'runMain graft.SemdedupScale /tmp/sf1_stress [targetClusterSize [probes [mode]]]'
  *
  * mode `twolevel` runs the coarse/fine quantizer form instead
  * (single assignment, K1 = ⌈√k⌉ × K2 = ⌈k/K1⌉ cells — the
  * past-the-pack-bound mechanism, measured here below the bound so its
  * cost relative to flat is known before it's ever needed).
  */
object SemdedupScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: SemdedupScale <fixtureDir> [targetClusterSize [probes [mode]]]"))
    val target = if (args.length > 1) args(1).toLong else 1024L
    val probes = if (args.length > 2) args(2).toInt else 2
    val mode = if (args.length > 3) args(3) else "flat"
    // twolevel pruning dials (round-10): keep > 0 runs the PRUNED probe
    // census instead of the full probes×probes one — the measurement
    // path for the residual-distance bound
    val keep = if (args.length > 4) args(4).toInt else 0
    // ratio <= 0 means "no ratio bound" (the CLI spelling of the
    // Double.MaxValue sentinel)
    val ratio = Some(if (args.length > 5) args(5).toDouble else 0.0)
      .filter(_ > 0).getOrElse(Double.MaxValue)
    val fineProbes = if (args.length > 6) args(6).toInt else probes
    // twolevel k override: the dial that MEASURED the lattice axis in
    // round 10; since round 11 the winning (n/2)^(2/3) lattice IS the
    // twolevel default (Clustering.semdedupK2), so the override remains
    // only for off-default comparison runs
    val kOverride = if (args.length > 7) Some(args(7).toInt) else None
    // twolevel split override "K1xK2" (e.g. 128x64) — the round-12
    // rectangular-lattice measurement dial; k is then K1*K2 and
    // kOverride is ignored
    val splitOverride: Option[(Int, Int)] =
      if (args.length > 8) {
        val Array(a, b) = args(8).split("x").map(_.toInt)
        Some((a, b))
      } else None
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val q = ParallelismFloor(
      spark.read.parquet(s"$dir/embeddings.parquet").select(
        $"vec_id",
        expr("transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
          .as("qe")),
      s"$dir/embeddings.parquet")
      .withColumn("nrm", graft.functions.Kit.dotI64($"qe", $"qe"))
      .persist()
    val n = q.count()
    // flat mode balances assignment n·k against census n²/k → √(n/2);
    // twolevel assignment is n·2√k, so its balance sits at the finer
    // (n/2)^(2/3) lattice — the production default since round 11
    val k = splitOverride.map { case (a, b) => a * b }.getOrElse(
      kOverride.getOrElse(
        if (mode == "twolevel") Clustering.semdedupK2(n)
        else Clustering.semdedupK(n, target)))
    def phase[T](name: String)(body: => T): T = {
      val t = System.nanoTime()
      val r = body
      println(f"[semdedup-scale] $name: ${(System.nanoTime() - t) / 1e9}%.1f s")
      r
    }
    if (mode == "twolevel") {
      val t0 = System.nanoTime()
      val (cs1, cs2) = phase("twolevel-train")(splitOverride match {
        case Some((a, b)) =>
          Clustering.kmeansTwoLevelTrainSplit(q, a, b, iters = 3)
        case None if kOverride.isEmpty =>
          // the production default: semdedupK2's power-of-two k under
          // the measured-lattice factorization (rectangular mid-band)
          val (a, b) = Clustering.latticeSplit(k)
          Clustering.kmeansTwoLevelTrainSplit(q, a, b, iters = 3)
        case None => Clustering.kmeansTwoLevelTrain(q, k, iters = 3)
      })
      val asg = phase("assign")(
        Clustering.twoLevelCellAssign(q, cs1, cs2).persist())
      phase("assign-count")(asg.count())
      val census = phase("census")(
        Clustering.semdedupCensus(q, asg, tau = 0.90).collect())
      // multi-probe at BOTH levels: residual re-derived per probed
      // coarse centroid, then top-m fine cells per residual — a pair
      // can straddle either boundary, so both dials are needed. With
      // keep > 0 the candidates are residual-distance PRUNED (round-9
      // verdict #2): re-ranked by exact composed distance, top-`keep`
      // kept (optionally ratio-bounded) — census pair volume ∝ keep²
      val label =
        if (keep > 0) s"probe${probes}x$fineProbes-keep$keep" +
          (if (ratio != Double.MaxValue) s"-r$ratio" else "")
        else s"probe${probes}x$fineProbes"
      val cand = (if (keep > 0)
        Clustering.twoLevelProbeCellAssignPruned(
          q, cs1, cs2, probes, fineProbes, keep, ratio)
      else Clustering
        .twoLevelProbeCellAssign(q, cs1, cs2, probes, fineProbes))
        .persist()
      val nCand = phase(s"cand-$label")(cand.count())
      println(f"[semdedup-scale] $label candidates/vector: ${nCand.toDouble / n}%.2f")
      val probed = phase(s"census-$label")(
        Clustering.semdedupCensus(q, asg, tau = 0.90, candAsg = Some(cand))
          .collect())
      cand.unpersist()
      println(s"[semdedup-scale] $label n_dropped: " +
        probed.map(_.getAs[Long]("n_dropped")).sum)
      val wall = (System.nanoTime() - t0) / 1e9
      val splitStr = splitOverride.map { case (a, b) => s"${a}x$b" }
        .getOrElse {
          val (a, b) =
            if (kOverride.isEmpty) Clustering.latticeSplit(k)
            else Clustering.twoLevelSplit(k)
          s"${a}x$b"
        }
      println(f"""{"mode": "twolevel", "n": $n, "k": $k, """ +
        f""""split": "$splitStr", """ +
        f""""n_vecs": ${census.map(_.getAs[Long]("n_vecs")).sum}, """ +
        f""""n_dropped": ${census.map(_.getAs[Long]("n_dropped")).sum}, """ +
        f""""cells": ${census.length}, """ +
        f""""max_cell": ${census.map(_.getAs[Long]("n_vecs")).max}, """ +
        f""""wall_sec": $wall%.2f}""")
      spark.stop()
      return
    }
    val t0 = System.nanoTime()
    val centroids = phase("train")(
      Clustering.kmeansCentroidsJoin(q, k, iters = 3))
    val asg = phase("assign")(
      Clustering.kmeansAssignJoin(q, centroids).persist())
    phase("assign-count")(asg.count())
    val top = phase("cluster-histogram")(
      asg.groupBy("cluster").count().orderBy(desc("count")).limit(5)
        .collect().map(_.getLong(1)).mkString(","))
    println(s"[semdedup-scale] top-5 cluster sizes: $top")
    val census = phase("census")(
      Clustering.semdedupCensus(q, asg, tau = 0.90).collect())
    // multi-probe (top-m) candidate generation: recovers pairs whose
    // members straddle a cluster boundary — the recall-vs-k slope.
    // Persisted here (semdedupCensus reads it twice and does NOT cache
    // on the caller's behalf — see its scaladoc)
    val cand = Clustering.kmeansProbeAssign(q, centroids, probes).persist()
    val probed = phase(s"census-probe$probes")(
      Clustering.semdedupCensus(q, asg, tau = 0.90, candAsg = Some(cand))
        .collect())
    cand.unpersist()
    println(s"[semdedup-scale] probe$probes n_dropped: " +
      probed.map(_.getAs[Long]("n_dropped")).sum)
    val wall = (System.nanoTime() - t0) / 1e9
    val nVecs = census.map(_.getAs[Long]("n_vecs")).sum
    val nDropped = census.map(_.getAs[Long]("n_dropped")).sum
    val maxCluster = census.map(_.getAs[Long]("n_vecs")).max
    println(f"""{"n": $n, "k": $k, "target": $target, """ +
      f""""n_vecs": $nVecs, "n_dropped": $nDropped, """ +
      f""""max_cluster": $maxCluster, "wall_sec": $wall%.2f}""")
    spark.stop()
  }
}
