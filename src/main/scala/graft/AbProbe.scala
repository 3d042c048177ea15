package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev A/B probe (r13): candidate rewrites timed against the registered
  * shapes under the Bench session conf. Not part of any driver contract;
  * sections are keyed by args so one run measures one question. */
object AbProbe {
  def time(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[ab] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("gcd")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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

    def li = graft.sources.Tables.load(spark, sfDir, "lineitem")

    // single-pass exact: one scan, map-side partial collect_set, one
    // exchange of partial states, no join
    def gcdSets: DataFrame = li
      .groupBy($"l_orderkey")
      .agg(size(collect_set($"l_suppkey")).cast(LongType).as("n_supp"),
        size(collect_set($"l_partkey")).cast(LongType).as("n_part"),
        count(lit(1)).as("n_lines"))

    // single-pass exact, aggregation spread post-shuffle (raw rows move)
    def gcdSetsSpread: DataFrame = li
      .select($"l_orderkey", $"l_suppkey", $"l_partkey")
      .repartition(spark.sparkContext.defaultParallelism, $"l_orderkey")
      .groupBy($"l_orderkey")
      .agg(size(collect_set($"l_suppkey")).cast(LongType).as("n_supp"),
        size(collect_set($"l_partkey")).cast(LongType).as("n_part"),
        count(lit(1)).as("n_lines"))

    def okCol(approx: org.apache.spark.sql.Column,
              exact: org.apache.spark.sql.Column) =
      abs(approx - exact) <= greatest(lit(5L), ceil(exact * 0.05))

    // single-pass approx: sketches ride the same one aggregation
    def gcdApproxSets: DataFrame = li
      .groupBy($"l_orderkey")
      .agg(size(collect_set($"l_suppkey")).cast(LongType).as("n_supp"),
        size(collect_set($"l_partkey")).cast(LongType).as("n_part"),
        count(lit(1)).as("n_lines"),
        approx_count_distinct($"l_suppkey", 0.05).as("a_supp"),
        approx_count_distinct($"l_partkey", 0.05).as("a_part"))
      .select($"l_orderkey", $"n_supp", $"n_part", $"n_lines",
        okCol($"a_supp", $"n_supp").as("supp_ok"),
        okCol($"a_part", $"n_part").as("part_ok"))

    section match {
      case "gcd" =>
        for (rep <- 1 to 3) {
          println(s"--- gcd rep $rep ---")
          time("gcd registered (dedup-branch join)") {
            noop(SparkEntry.queries("grouped_count_distinct")(spark, sfDir))
          }
          time("gcd collect_set single-pass") { noop(gcdSets) }
          time("gcd collect_set spread") { noop(gcdSetsSpread) }
          time("gcd_approx registered") {
            noop(SparkEntry.queries("grouped_count_distinct_approx")(spark, sfDir))
          }
          time("gcd_approx collect_set single-pass") { noop(gcdApproxSets) }
        }
        // value parity vs the registered forms (order-independent)
        val a = SparkEntry.queries("grouped_count_distinct")(spark, sfDir)
        println(s"[ab] gcd exceptAll counts: ${a.exceptAll(gcdSets).count()} / ${gcdSets.exceptAll(a).count()}")
        val b = SparkEntry.queries("grouped_count_distinct_approx")(spark, sfDir)
        println(s"[ab] gcd_approx exceptAll counts: ${b.exceptAll(gcdApproxSets).count()} / ${gcdApproxSets.exceptAll(b).count()}")
      case other => sys.error(s"unknown section: $other")
    }
    spark.stop()
  }
}
