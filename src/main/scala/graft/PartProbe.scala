package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.ParallelismFloor

/** Dev probe: print the per-partition row counts of the floored+persisted
  * corpus exactly as SemdedupScale builds it, plus the executed plan of
  * one broadcast-join assignment — diagnosis harness for partition-skew
  * stragglers. Usage: sbt 'runMain graft.PartProbe <fixtureDir> [k]' */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val k = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
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
    q.count()
    val sizes = q.rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().sortBy(-_._2)
    println(s"[probe] partitions: ${sizes.length}; top sizes: " +
      sizes.take(8).mkString(" "))
    val centroids = graft.ops.Clustering.kmeansCentroids(q, 2, 1) ++
      (2 until k).map(_ => Seq.fill(64)(0L)) // padding centroids: shape only
    val t0 = System.nanoTime()
    val asg = graft.ops.Clustering.kmeansAssignJoin(q, centroids)
    asg.write.format("noop").mode("overwrite").save()
    println(f"[probe] one assignment pass (k=$k): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    asg.explain("formatted")
    spark.stop()
  }
}
