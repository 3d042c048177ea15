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
    spark.stop()
  }
}
