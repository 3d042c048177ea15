package graft

import org.apache.spark.sql.SparkSession

/** Scale/recall harness for the ANN retrieval family over a
  * `gen_stress.py` corpus: runs the named registered top-k queries
  * (default the PQ pipeline) cold+warm, then scores PLANTED-PAIR
  * recall@k against the generator's ground truth (`vec_plants.parquet`,
  * written by gen_stress since round 9 — no threshold re-derivation).
  * An "opportunity" is a planted pair with a query-side member
  * (vec_id % 25 == 0, the family convention); it is recovered when the
  * partner appears in that member's returned top-k. Prints one JSON
  * line per query.
  *
  *   sbt 'runMain graft.PqScale /tmp/sf100_stress ivf_topk ivfpq_rerank_topk'
  */
object PqScale {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names =
      if (args.tail.nonEmpty) args.tail.toSeq else Seq("ivfpq_rerank_topk")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // see CosTopK scaladoc: the 128-row default silently converts
      // every CosTopK aggregation to sort-based
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val plants = spark.read.parquet(s"$dir/vec_plants.parquet")
      .select("copy_id", "src_id").as[(Long, Long)].collect()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    names.foreach { name =>
      // "ivfpq_phased": the production-amortization decomposition —
      // ingest-side code/cell tables timed apart from query-side
      // probe→ADC→rerank (see Pq.ivfpqPhased) — one run, phases printed
      val runs = if (name == "ivfpq_phased") {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val (phases, result) = ops.Pq.ivfpqPhased(spark, dir)
        val rows = result.select("qid", "cid").as[(Long, Long)].collect()
        val sec = (System.nanoTime() - t0) / 1e9
        phases.foreach { case (p, s, r) =>
          println(f"""{"phase": "$p", "sec": $s%.2f, "rows": $r}""")
        }
        // measured footprint of every pinned table — the PQ memory
        // claim (code table ≪ full-width vectors) read off the block
        // manager, not computed from widths
        spark.sparkContext.getRDDStorageInfo.foreach { i =>
          println(s"""{"cached": "${i.name.replaceAll("\\s+", " ").take(80)}", """ +
            s""""mem_bytes": ${i.memSize}, "disk_bytes": ${i.diskSize}}""")
        }
        Seq((sec, rows), (sec, rows))
      } else {
        val d = SparkEntry.defs.find(_.name == name).getOrElse(
          sys.error(s"unknown query: $name"))
        (1 to 2).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val rows = d.fn(spark, dir).select("qid", "cid")
            .as[(Long, Long)].collect()
          ((System.nanoTime() - t0) / 1e9, rows)
        }
      }
      val top = runs.last._2.groupBy(_._1)
        .map { case (q, rs) => q -> rs.map(_._2).toSet }
      var opp = 0; var hit = 0
      for ((c, s) <- plants) {
        if (c % 25 == 0) {
          opp += 1; if (top.getOrElse(c, Set.empty).contains(s)) hit += 1
        }
        if (s % 25 == 0) {
          opp += 1; if (top.getOrElse(s, Set.empty).contains(c)) hit += 1
        }
      }
      val recall = if (opp == 0) 0.0 else hit.toDouble / opp
      println(f"""{"query": "$name", "n": $n, """ +
        f""""cold_sec": ${runs.head._1}%.2f, "warm_sec": ${runs.last._1}%.2f, """ +
        f""""rows": ${runs.last._2.length}, """ +
        f""""plant_opportunities": $opp, "plant_hits": $hit, """ +
        f""""recall": $recall%.4f}""")
    }
    spark.stop()
  }
}
