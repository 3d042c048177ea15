package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line on raw stdout (plus bench_result.json as a file
  * fallback) for the driver to parse.
  *
  * Each query is forced through the noop sink — `count()` would let
  * Catalyst prune every unused projection, so scalar-heavy queries would
  * measure nothing but parquet row counting (the r01 failure mode).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: run every query once at the smoke scale so whole-stage
    // codegen is compiled before anything is timed. Otherwise JIT
    // compilation cost (seconds, and nondeterministic in placement) lands
    // on whichever query runs first with a given plan shape, swamping the
    // numbers the measurement exists to produce.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.defs.foreach { d =>
        try d.fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        finally spark.catalog.clearCache()
      }
    // Median of three timed runs per query: single-run totals on this
    // shared machine spread ±2.4× with concurrent load (48.1 s vs 102.9 s
    // vs 43.3 s on identical round-2 code), which no 2×-baseline gate can
    // adjudicate. The median discards one arbitrarily-inflated run per
    // query; per-run values are kept in the JSON for transparency.
    val REPS = 3
    val results = SparkEntry.defs.map { d =>
      val runs = (1 to REPS).map { _ =>
        val t0 = System.nanoTime()
        try d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${d.name} failed: ${e.getMessage}")
        }
        // internal stage-table caches count toward the query's own time
        // and are dropped before the next run starts
        finally spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      (d.name, runs.sorted.apply(REPS / 2), runs)
    }
    val total = results.map(_._2).sum
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Full-precision medians + all per-run values go to the file.
    val fullQs = results.map { case (k, med, _) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val perRun = results.map { case (k, _, rs) =>
      s"\"" + k + "\":" + rs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    Files.writeString(
      Paths.get("bench_result.json"),
      s"""{"metric":"total","value":$total,"unit":"sec","protocol":"median-of-$REPS","queries":$fullQs,"runs":$perRun,"sf":"$sfDir"}""" + "\n")
    // The stdout line MUST fit, with room for sbt's trailing "[success]"
    // line, inside the driver's 2000-char output-tail window — round 3's
    // 6 KB line (full precision + per-run arrays) was clipped mid-line and
    // recorded as parsed:null. Millisecond precision for the per-query map,
    // and if future growth still overflows the budget, drop the fastest
    // queries first (the timing signal lives in the slow ones) and say so.
    val budget = 1800
    def line(qs: Seq[(String, Double)], omitted: Int): String = {
      val m = qs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","protocol":"median-of-$REPS","queries":$m$om,"sf":"$sfDir"}"""
    }
    val bySlow = results.map { case (k, med, _) => (k, med) }
      .sortBy(-_._2)
    var keep = bySlow.length
    while (keep > 1 && line(bySlow.take(keep), bySlow.length - keep).length > budget)
      keep -= 1
    val json = line(bySlow.take(keep), bySlow.length - keep)
    spark.stop()
    // Raw FD write after spark.stop(): immune to any stdout wrapping the
    // launcher installs, and nothing logs after it.
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
  }
}
