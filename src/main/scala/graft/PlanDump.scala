package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of named registered
  * queries at sf0.001 — `sbt 'runMain graft.PlanDump q1 q2'`. The
  * curated audit lives in [[Plans]] / PLANS.md; this is the quick loop
  * for iterating on a single query's plan shape. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- args) {
      val d = SparkEntry.defs.find(_.name == n).get
      println(s"===== $n =====")
      println(d.fn(spark, dir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
