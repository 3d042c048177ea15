package graft
object PlanDump { def main(a: Array[String]): Unit = {
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
    .config("spark.sql.legacy.parquet.nanosAsLong","true")
    .config("spark.ui.enabled","false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val d = SparkEntry.defs.find(_.name == a(0)).get
  println(d.fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString)
  spark.stop()
}}
