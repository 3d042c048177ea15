package graft

import org.apache.spark.sql.SparkSession

/** Scale-growth harness for the dedup/graph/ANN family: runs the named
  * queries against an arbitrary fixture dir (e.g. the 10× corpus from
  * `scripts/gen_stress.py`) and prints one JSON line per query with
  * wall seconds, result rows, and every `observe`d metric — candidate
  * volumes in particular. Comparing those counts across corpus sizes is
  * the direct test of the sub-quadratic claims in SURVEY.md §8: a
  * banded/bucketed detector whose candidates grow ~linearly survives
  * 100 TB; one whose candidates grow with corpus² does not.
  *
  *   sbt 'runMain graft.StressRun /tmp/sf1_stress minhash_lsh_neardup …'
  *
  * Each query runs twice (cold then warm, cache cleared between); both
  * times are reported. The JSON line also carries `"skew": true|false` —
  * whether any join in the EXECUTED adaptive plan was split by AQE's
  * skew-join optimization (`skew=true` in the final plan) — and, when
  * `SPARK_GRAFT_PLAN_DIR` is set, the executed plan of the warm run is
  * written to `<dir>/<query>.plan.txt` (the evidence artifact for the
  * broadcast→SMJ and skew-split claims in STRESS_r*.md). */
object StressRun {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val builder0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // CosTopK-family aggregations hold 10^3-10^5 groups per task; the
      // 128-row default falls back to sort-based aggregation (and its
      // spill cascade) on every such query - see CosTopK scaladoc
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // same knob as Verify: "k=v;k=v" extra confs, so evidence runs can
    // flip operator tunables (e.g. BandJoin's hot threshold) per run
    val builder = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .foldLeft(builder0) { (b, kv) =>
        kv.split("=", 2) match {
          case Array(k, v) => b.config(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_EXTRA_CONF entry is not key=value: '$kv'")
        }
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SINK=warehouse lands each result through the atomic
    // warehouse path instead of collect()ing it to this driver — the
    // honest wall for operators whose OUTPUT is corpus-sized (chunking
    // emits millions of rows; collecting them measures driver
    // deserialization, not the operator — round-8 verdict #7). Row count
    // comes from the sink's observed landing, so the result plan still
    // executes exactly once.
    val sinkWh = sys.env.get("SPARK_GRAFT_SINK").collect {
      case "warehouse" => graft.pipeline.Warehouse(spark,
        java.nio.file.Files.createTempDirectory("stress-sink").toString)
    }
    // sink mode executes a DERIVED plan (the sink's own observe wraps
    // the query), so observedMetrics never populate on the query's own
    // QueryExecution — round-10 find: the 1000× minhash line printed
    // n_pairs: 0. Capture them from the listener bus instead; the
    // sink's internal row-count Observation (auto-named) is filtered.
    val seenMetrics =
      new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (k, v) =>
            // the sink's internal row-count Observation is auto-named
            // with a UUID — keep only deliberately-named query metrics
            val uuidLike = k.matches(
              "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")
            if (!uuidLike && !k.startsWith("observation")) {
              seenMetrics.put(k, v); ()
            }
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    names.foreach { name =>
      val d = SparkEntry.defs.find(_.name == name).getOrElse(
        sys.error(s"unknown query: $name"))
      val runs = (1 to 2).map { run =>
        spark.catalog.clearCache()
        seenMetrics.clear()
        val t0 = System.nanoTime()
        val df = d.fn(spark, dir)
        val rows = sinkWh match {
          case Some(wh) => wh.load(s"${name}_$run", df,
            graft.pipeline.SinkPolicy.Overwrite).rows.toInt
          case None => df.collect().length
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // bound the harness's scratch (round-10: the 4000× decade filled
        // the disk — 12 GB of dead sink tables under the spill high-water
        // mark): the landed result is only ever a sink target, so delete
        // it once the wall is recorded. Deletion is outside the timed
        // section; the write itself stays in the honest wall.
        sinkWh.foreach { wh =>
          val dir = java.nio.file.Paths.get(wh.root, s"${name}_$run")
          if (java.nio.file.Files.exists(dir)) {
            java.nio.file.Files.walk(dir)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          }
        }
        val observed = {
          val direct = df.queryExecution.observedMetrics
          if (sinkWh.isEmpty || direct.nonEmpty) direct
          else {
            // listener delivery is async: give the bus a moment, but
            // don't stall metric-less queries for long
            val deadline = System.nanoTime() + 2000000000L
            while (seenMetrics.isEmpty && System.nanoTime() < deadline)
              Thread.sleep(50)
            import scala.jdk.CollectionConverters._
            seenMetrics.asScala.toMap
          }
        }
        val metrics = observed.toSeq
          .flatMap { case (mName, row) =>
            row.schema.fieldNames.map { f =>
              // numbers print raw; anything else is JSON-string-escaped so
              // a future non-numeric observed metric can't silently break
              // the stress-tooling's JSON parsing
              val v = row.getAs[Any](f) match {
                case n @ (_: Long | _: Int | _: Double | _: Float |
                          _: Short | _: Byte) => n.toString
                case other => "\"" + String.valueOf(other)
                  .replace("\\", "\\\\").replace("\"", "\\\"") + "\""
              }
              s""""$mName.$f": $v"""
            }
          }
        // the EXECUTED plan (adaptive final form — collect() above has
        // finalized AQE), not the initial one: skew splits and runtime
        // broadcast demotions only exist here
        val plan = df.queryExecution.executedPlan.toString
        (sec, rows, metrics, plan)
      }
      val (coldSec, rows, metrics, _) = runs.head
      val (warmSec, _, _, warmPlan) = runs.last
      sys.env.get("SPARK_GRAFT_PLAN_DIR").foreach { pd =>
        val dir = java.nio.file.Paths.get(pd)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"$name.plan.txt"),
          warmPlan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      println((Seq(
        s""""query": "$name"""",
        f""""cold_sec": $coldSec%.2f""",
        f""""warm_sec": $warmSec%.2f""",
        s""""rows": $rows""",
        s""""skew": ${warmPlan.contains("skew=true")}""") ++ metrics)
        .mkString("{", ", ", "}"))
    }
    spark.stop()
  }
}
