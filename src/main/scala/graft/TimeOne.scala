package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time ONE registered query by name, median-of-3 after a
  * warmup pass, without paying the full 78-query Bench sweep. Usage:
  *
  *   sbt -batch "runMain graft.TimeOne fuzzy_match_entities"
  *
  * Optional second arg = sf dir (default /root/testdata/sf0.1). Same
  * session conf and noop-sink protocol as Bench so numbers compare.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeOne <query> [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val d = SparkEntry.defs.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // CosTopK-family aggregations hold 10^3-10^5 groups per task; the
      // 128-row default falls back to sort-based aggregation (and its
      // spill cascade) on every such query - see CosTopK scaladoc
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      d.fn(spark, sfDir).explain("formatted")
    d.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    val runs = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[timeone] run $i: $s%.3f s")
      s
    }
    println(f"[timeone] $name median: ${runs.sorted.apply(1)}%.3f s rows: ${d.fn(spark, sfDir).count()}")
    spark.stop()
  }
}
