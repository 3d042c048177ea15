package graft

import org.apache.spark.sql.functions._

import graft.ops.{Components, StageLevels, TextOps}

/** Evidence for the AMORTIZED pair+CC pass (round-10 verdict #7): a
  * production corpus pays MinHash pair detection and the components
  * closure once; the registered `neardup_clusters` and
  * `leakage_safe_split` queries each re-derive them standalone because
  * the oracle convention wants self-contained SQL. This harness times
  * the two standalone forms and the composed
  * [[Components.neardupClustersAndSplit]] over the same fixture — the
  * claim is composed ≈ half the combined standalone wall (one pair+CC
  * derivation instead of two, plus one cheap count/join layer).
  *
  * Every result is forced through the noop sink (count() would let
  * Catalyst prune the verdict columns — the Bench discipline).
  *
  *   sbt 'runMain graft.ComposedScale /tmp/sf1000_stress'
  */
object ComposedScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: ComposedScale <fixtureDir>"))
    val spark = HarnessSession.build()
    import spark.implicits._

    // by-name: connectedComponents runs its label loop EAGERLY at frame
    // construction (LoopState pins each round), so construction belongs
    // inside the timed section — a by-value parameter would evaluate it
    // before the clock starts and time only the final noop write
    def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"phase": "$label", "sec": $sec%.2f}""")
      sec
    }

    // FULL-COLUMN frame, exactly the registered queries' Tables.load
    // shape: pinnedFor sizes its stage tables from the frame's plan
    // stats, and a column-pruned frame under-reports the corpus (string
    // stats estimate by default width), flipping the level to memory —
    // the r8 §13 signature-aggregation starvation, reproduced by this
    // harness's first cut at 1000× (UNABLE_TO_ACQUIRE_MEMORY in the
    // shingle stage) and gone with the registered sizing convention.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val lvl = StageLevels.pinnedFor(docs)
    println(s"""{"phase": "config", "stage_level": "$lvl"}""")
    def pairs() = TextOps.minhashNeardupPairs(docs, lvl)
      .select($"doc_a", $"doc_b")

    // the two standalone registered-query shapes (their fn bodies less
    // the Tables indirection, so all three phases read the same frame)
    def standaloneClusters() = timed("standalone_clusters") {
      val cc = Components.connectedComponents(pairs())
        .withColumnRenamed("id", "doc_id")
      val sizes = cc.groupBy($"cluster_id").agg(count(lit(1)).as("n_members"))
      cc.join(sizes, "cluster_id")
        .select($"doc_id", $"cluster_id", $"n_members",
          when($"doc_id" === $"cluster_id", 1L).otherwise(0L).as("keep"))
    }
    def standaloneSplit() = timed("standalone_split")(
      Components.splitVerdicts(docs, pairs()))
    def composed() = timed("composed")(Components.neardupClustersAndSplit(docs))
    // order dial: the LAST phase rides warm page cache and compiled
    // codegen; "composedfirst" puts the composed pass in the cold slot
    // so its win is conservative, the default mirrors a pipeline that
    // already ran the standalone forms
    val (aSec, bSec, cSec) =
      if (args.contains("composedfirst")) {
        val c = composed(); val a = standaloneClusters(); val b = standaloneSplit()
        (a, b, c)
      } else {
        val a = standaloneClusters(); val b = standaloneSplit(); val c = composed()
        (a, b, c)
      }
    println(f"""{"phase": "summary", "standalone_combined": ${aSec + bSec}%.2f, """ +
      f""""composed": $cSec%.2f, "ratio": ${cSec / (aSec + bSec)}%.3f}""")
    spark.stop()
  }
}
