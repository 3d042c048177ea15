package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.LongAdder

import graft.functions.Kit

/** Evidence harness for the `similarity_topk_bigq` design claim
  * (`ops/Similarity.scala`): with q queries, P pair tasks and top-k=10,
  * the [[graft.functions.CosTopK]] heap aggregation shuffles ≤ P·q·k
  * primitive pairs (serialized map-side heaps), while the `row_number()`
  * window formulation of the SAME block product must move its candidate
  * stream through an exchange to co-locate each query's candidates
  * before ranking. This main runs BOTH formulations on one corpus and
  * prints one JSON line per form with wall seconds and the run's total
  * shuffle write/read bytes and records from task metrics — the measured
  * number behind the scaladoc's ≤P·q·k claim, recorded in STRESS_r08.md.
  *
  *   sbt 'runMain graft.ShuffleProbe /tmp/sf1_stress 5 [P]'
  *
  * arg 1 = fixture dir, arg 2 = query density modulus (vec_id % m == 0
  * selects queries; 5 → 1-in-5, the "query set grows with the corpus"
  * regime the bigq form exists for — at sf0.1 the registered query uses
  * 1-in-25). Optional arg 3 repartitions the corpus side to P partitions
  * before the block product — a single-file fixture coalesces to P≈2,
  * which understates the per-partition shuffle constant a real cluster
  * pays (P = corpus/split-size there); forcing P=32 shows both forms'
  * records scale with P (heap: P·q heaps, window: P·q·k rows), i.e. the
  * k-factor gap is per-partition. Spark's WindowGroupLimit partial
  * pushdown DOES pre-filter
  * the window form map-side (each pair task keeps its local top-k per
  * qid), so the honest comparison is not rows-into-exchange but bytes:
  * full candidate rows that survive the partial limit vs fixed-width
  * serialized heaps. Task metrics are drained with a bounded wait on the
  * listener queue (metrics arrive asynchronously after the action).
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1_stress")
    val qmod = if (args.length > 1) args(1).toInt else 5
    val baseParts = if (args.length > 2) args(2).toInt else 0
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
    import spark.implicits._

    val wBytes = new LongAdder; val wRecs = new LongAdder
    val rBytes = new LongAdder; val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          wBytes.add(m.shuffleWriteMetrics.bytesWritten)
          wRecs.add(m.shuffleWriteMetrics.recordsWritten)
          rBytes.add(m.shuffleReadMetrics.totalBytesRead)
          tasks.increment()
        }
      }
    })
    // metrics arrive on the listener bus after the action returns; wait
    // until the task count stops moving (bounded) before reading adders
    def drain(): Unit = {
      var last = -1L; var spins = 0
      while (tasks.sum != last && spins < 40) {
        last = tasks.sum; spins += 1; Thread.sleep(250)
      }
    }

    def quantized(): DataFrame = {
      val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      // the repartition shuffle runs during materialization, BEFORE the
      // metric adders are reset — only the pair/rank machinery is counted
      (if (baseParts > 0) raw.repartition(baseParts) else raw).select(
        $"vec_id",
        expr("transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
          .as("qe"))
        .withColumn("nrm", Kit.dotI64(col("qe"), col("qe")))
        .persist()
    }

    def pairs(base: DataFrame): DataFrame = {
      val qs = base.where($"vec_id" % qmod === 0)
        .select($"vec_id".as("qid"), $"qe".as("qqe"), $"nrm".as("qn"))
      base.crossJoin(qs.hint("shuffle_replicate_nl"))
        .where($"vec_id" =!= $"qid")
        .withColumn("dot", Kit.dotI64($"qe", $"qqe"))
        .select($"qid", $"vec_id".as("cid"),
          ($"dot".cast("double") /
            (sqrt($"qn".cast("double")) * sqrt($"nrm".cast("double"))))
            .as("cos"))
    }

    def heapForm(base: DataFrame): DataFrame =
      pairs(base)
        .groupBy($"qid")
        .agg(Kit.cosTopK($"cos", $"cid", 10).as("top"))
        .select($"qid", explode($"top").as("t"))
        .select($"qid", $"t.cid".as("cid"), Kit.quantize($"t.cos", 6).as("cos_q6"))

    def windowForm(base: DataFrame): DataFrame = {
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
      pairs(base)
        .withColumn("rk", row_number().over(w))
        .where($"rk" <= 10)
        .select($"qid", $"cid", Kit.quantize($"cos", 6).as("cos_q6"))
    }

    def measure(form: String, mk: DataFrame => DataFrame): Unit = {
      spark.catalog.clearCache()
      val base = quantized()
      base.count() // materialize the stage table OUTSIDE the measured window
      drain()
      wBytes.reset(); wRecs.reset(); rBytes.reset(); tasks.reset()
      val t0 = System.nanoTime()
      val df = mk(base)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      val rows = df.count()
      println(
        s"""{"form":"$form","dir":"$dir","qmod":$qmod,"base_parts":$baseParts,"sec":${f"$sec%.3f"},""" +
        s""""shuffle_write_bytes":${wBytes.sum},"shuffle_write_records":${wRecs.sum},""" +
        s""""shuffle_read_bytes":${rBytes.sum},"rows":$rows}""")
      sys.env.get("SPARK_GRAFT_PLAN_DIR").foreach { pd =>
        val d = java.nio.file.Paths.get(pd)
        java.nio.file.Files.createDirectories(d)
        java.nio.file.Files.writeString(d.resolve(s"bigq_$form.plan.txt"),
          mk(base).queryExecution.executedPlan.toString)
      }
      spark.catalog.clearCache()
    }

    measure("heap", heapForm)
    measure("window", windowForm)
    spark.stop()
  }
}
