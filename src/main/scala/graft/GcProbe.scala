package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (r13, verdict item 1): controlled idle A/B over a list of
  * registered queries with PROCESS-CPU and GC telemetry next to every
  * wall — the instrumentation the r12 suspect cluster
  * (`grouped_count_distinct_approx`, `incremental_neardup`,
  * `tfidf_top_terms`, `window_running_sum` at cpu ≫ wall under
  * local[32]) needs to separate a box-wide load episode from a genuine
  * 32-concurrent-task memory/GC pathology. Usage:
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.GcProbe q1 q2 ..."
  *
  * Same session conf, warmup and noop-sink protocol as Bench (master
  * local[$SPARK_GRAFT_CPUS]) so walls compare against driver sweeps;
  * prints per-rep wall / process-CPU / GC seconds / GC count and the
  * median line per query. Not part of any driver contract. */
object GcProbe {
  private def processCpuNanos(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  private def gcStats(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val beans =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionTime).sum, beans.map(_.getCollectionCount).sum)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GcProbe <query>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val defs = args.map { n =>
      SparkEntry.defs.find(_.name == n).getOrElse(sys.error(s"no such query: $n"))
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bench's warmup: JIT-compile every plan shape at the smoke scale
    defs.foreach { d =>
      try d.fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      finally spark.catalog.clearCache()
    }
    val heap = Runtime.getRuntime.maxMemory() / (1 << 20)
    println(s"[gcprobe] cpus=$cpus sf=$sfDir reps=$reps maxHeapMB=$heap")
    defs.foreach { d =>
      val walls = (1 to reps).map { i =>
        val (g0, n0) = gcStats(); val c0 = processCpuNanos()
        val t0 = System.nanoTime()
        d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val (g1, n1) = gcStats(); val c1 = processCpuNanos()
        println(f"[gcprobe] ${d.name} rep $i: wall=$wall%.3f " +
          f"cpu=${(c1 - c0) / 1e9}%.3f gc=${(g1 - g0) / 1e3}%.3f " +
          s"gcN=${n1 - n0}")
        wall
      }
      println(f"[gcprobe] ${d.name} MEDIAN wall=${walls.sorted.apply(reps / 2)}%.3f cpus=$cpus")
    }
    spark.stop()
  }
}
