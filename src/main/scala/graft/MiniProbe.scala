package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r12): time the SUB-STAGES of the MinHash near-dup
  * backbone in isolation at sf0.1 so optimization effort lands where
  * the CPU actually goes. Not part of any driver contract. */
object MiniProbe {
  def time(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      time("shingleSets (strings) noop") {
        noop(graft.ops.TextOps.shingleSets(docs))
      }
      time("shingleHashSets noop") {
        noop(graft.ops.TextOps.shingleHashSets(docs))
      }
      val sets = graft.ops.TextOps.shingleSets(docs).persist()
      time("sets persist+count") { sets.count() }
      val sh = sets.select($"doc_id", explode($"sset").as("s"))
      time("explode only") { noop(sh) }
      time("explode+md5conv") {
        noop(sh.select($"doc_id",
          expr("CAST(conv(substr(md5(s), 1, 12), 16, 10) AS BIGINT) % 2147483647")
            .as("h")))
      }
      val hs = sh.select($"doc_id",
        expr("CAST(conv(substr(md5(s), 1, 12), 16, 10) AS BIGINT) % 2147483647")
          .as("h"))
      val MH_AB = (1 to 16).map { i =>
        ((1103515245L * i + 12345L) % 2147483647L,
          (69069L * i + 1013904223L) % 2147483647L)
      }
      val sigCols = MH_AB.zipWithIndex.map { case ((a, b), i) =>
        min(expr(s"($a * h + $b) % 2147483647")).as(s"m$i")
      }
      time("signature groupBy") {
        noop(hs.groupBy($"doc_id").agg(sigCols.head, sigCols.tail: _*))
      }
      time("verify transform(sset,xxhash64)") {
        noop(sets.select($"doc_id",
          expr("transform(sset, s -> xxhash64(s))").as("hs")))
      }
      time("full minhashNeardupPairs") {
        noop(graft.ops.TextOps.minhashNeardupPairs(docs))
      }
      spark.catalog.clearCache()
    }

    // --- q3: join-then-aggregate vs pre-aggregated lineitem ---
    for (rep <- 1 to 2) {
      println(s"--- q3 rep $rep ---")
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val m12 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(12, 2))
      time("q3 current (join-then-agg)") {
        noop(graft.SparkEntry.queries("q3_top_revenue")(spark, sfDir))
      }
      time("q3 pre-agg lineitem") {
        val t = (n: String) => graft.sources.Tables.load(spark, sfDir, n)
        val rev = t("lineitem")
          .select($"l_orderkey", $"l_extendedprice", $"l_discount")
          .groupBy($"l_orderkey")
          .agg(sum(m12($"l_extendedprice") * m12(lit(1) - $"l_discount"))
            .cast(DoubleType).as("revenue"))
        noop(t("customer").where($"c_mktsegment" === "BUILDING")
          .select($"c_custkey")
          .join(t("orders").select($"o_orderkey", $"o_custkey", $"o_orderdate"),
            $"c_custkey" === $"o_custkey")
          .join(rev, $"l_orderkey" === $"o_orderkey")
          .select($"l_orderkey", $"revenue", to_date($"o_orderdate").as("order_day"))
          .orderBy($"revenue".desc, $"l_orderkey".asc).limit(10))
      }
    }

    // --- cube_sales: Expand-over-corpus vs pre-aggregated base ---
    for (rep <- 1 to 2) {
      println(s"--- cube rep $rep ---")
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      time("cube old (Expand x4 over corpus)") {
        noop(graft.sources.Tables.loadSpread(spark, sfDir, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n_lines"),
            graft.functions.Kit.moneySum($"l_quantity").as("sum_qty")))
      }
      time("cube new (pre-agg base)") {
        noop(graft.SparkEntry.queries("cube_sales")(spark, sfDir))
      }
    }

    // --- grouped_count_distinct: Expand-dedup vs dedup-branch join ---
    for (rep <- 1 to 2) {
      println(s"--- gcd rep $rep ---")
      time("gcd current (Expand x3)") {
        noop(graft.SparkEntry.queries("grouped_count_distinct")(spark, sfDir))
      }
      val p = spark.sparkContext.defaultParallelism
      val spread = graft.sources.Tables.load(spark, sfDir, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_partkey")
        .repartition(p, $"l_orderkey")
      val supp = spread.groupBy($"l_orderkey", $"l_suppkey")
        .agg(count(lit(1)).as("c"))
        .groupBy($"l_orderkey")
        .agg(count($"l_suppkey").as("n_supp"), sum($"c").as("n_lines"))
      val part = spread.groupBy($"l_orderkey", $"l_partkey")
        .agg(count(lit(1)).as("cp"))
        .groupBy($"l_orderkey").agg(count($"l_partkey").as("n_part"))
      time("gcd dedup-branch join") {
        noop(supp.join(part, Seq("l_orderkey"))
          .select($"l_orderkey", $"n_supp", $"n_part", $"n_lines"))
      }
    }

    // --- per-call Tables.load fixed cost (r12) ---
    for (rep <- 1 to 2) {
      time(s"tables.load x20 plan-only (rep $rep)") {
        (1 to 20).foreach { _ =>
          graft.sources.Tables.load(spark, sfDir, "lineitem")
          graft.sources.Tables.load(spark, sfDir, "orders")
        }
      }
      time(s"scan_filter_project noop x5 (rep $rep)") {
        (1 to 5).foreach { _ =>
          noop(graft.SparkEntry.queries("scan_filter_project")(spark, sfDir))
        }
      }
    }

    // schema-supplied reads: does skipping inference remove the cost?
    {
      val liSchema = spark.read.parquet(s"$sfDir/lineitem.parquet").schema
      val ordSchema = spark.read.parquet(s"$sfDir/orders.parquet").schema
      for (rep <- 1 to 2)
        time(s"read.schema(...).parquet x20 plan-only (rep $rep)") {
          (1 to 20).foreach { _ =>
            spark.read.schema(liSchema).parquet(s"$sfDir/lineitem.parquet")
            spark.read.schema(ordSchema).parquet(s"$sfDir/orders.parquet")
          }
        }
    }

    // --- exact near-dup family sub-stages (r12) ---
    for (rep <- 1 to 2) {
      println(s"--- exact family rep $rep ---")
      val sets = graft.ops.TextOps.shingleHashSets(docs).persist()
      time("exact: hashed sets count") { sets.count() }
      val sh = sets.select($"doc_id", explode($"hset").as("h"))
      val rare = sh.groupBy($"h").agg(count(lit(1)).as("df"))
        .where($"df" <= 32).select($"h")
      val docLists = sh.join(rare, Seq("h"))
        .groupBy($"h").agg(collect_list($"doc_id").as("ds")).persist()
      time("exact: rare docLists count") { docLists.count() }
      val pairsExpr = expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y ->
          |    struct(least(x, y) AS doc_a, greatest(x, y) AS doc_b))))""".stripMargin)
      time("exact: pair explode only") {
        noop(docLists.select(explode(pairsExpr).as("p")))
      }
      time("exact: pair explode+agg") {
        noop(docLists.select(explode(pairsExpr).as("p"))
          .select($"p.doc_a", $"p.doc_b")
          .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("shared_rare")))
      }
      time("exact: full containment pipeline") {
        noop(graft.ops.TextOps.containmentNeardupPairs(docs))
      }
      spark.catalog.clearCache()
    }

    // --- textgate_verdicts phase split (r12): landing vs probe ---
    {
      import graft.ops.TextOps
      val dir = java.nio.file.Files.createTempDirectory("probe-tg").toString
      val wh = graft.pipeline.Warehouse(spark, dir)
      val gate = graft.streaming.TextGate(wh, "docs")
      val isInc = $"source".isin(TextOps.IncSources: _*)
      val all = graft.sources.Tables.load(spark, sfDir, "documents")
        .select($"doc_id", $"source", $"text")
      time("gate: corpus landBatch") {
        gate.landBatch(all.where(!isInc).select($"doc_id", $"text"), "corpus")
      }
      for (rep <- 1 to 2) {
        println(s"--- gate probe rep $rep ---")
        val b = all.where(isInc).select($"doc_id", $"text").persist()
        time("gate: batch persist+count") { b.count() }
        val sets = TextOps.shingleSets(b).persist()
        time("gate: batch shingleSets count") { sets.count() }
        val bands = TextOps.minhashBandsUncached(sets).persist()
        time("gate: batch bands count") { bands.count() }
        time("gate: batchBuckets collect") { gate.batchBuckets(bands) }
        time("gate: verdictsFor noop") {
          noop(gate.verdictsFor(b, sets, bands))
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
