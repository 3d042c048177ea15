package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round audit tool: write `.explain("formatted")` output
  * for named registered queries to `plans/<tag>/<query>_<suffix>.txt` —
  * the before/after plan evidence the round deliverables require.
  * Usage:
  *
  *   sbt -batch "runMain graft.PlanSnap r12 before q1 q2 ..."
  *
  * Plans are captured at sf0.1 (the driver's bench scale) under the
  * same session conf as Bench so join strategies and partition counts
  * match what the bench actually runs. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <query>...")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val out = Paths.get("plans", tag)
    Files.createDirectories(out)
    for (n <- names) {
      val d = SparkEntry.defs.find(_.name == n)
        .getOrElse(sys.error(s"no such query: $n"))
      val df = d.fn(spark, dir)
      // Capture via the captured-explain API (not stdout redirection):
      // same string explain("formatted") prints.
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(out.resolve(s"${n}_$suffix.txt"), txt)
      println(s"[plansnap] wrote ${out.resolve(s"${n}_$suffix.txt")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
