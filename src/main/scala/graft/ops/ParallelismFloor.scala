package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scan-bytes parallelism floor for compute-bound passes over a cached
  * corpus (round-8 pattern, first applied to `similarity_topk_bigq`,
  * STRESS_r08.md §2.1): a small or single-file corpus arrives as 1–2
  * splits, and any operator whose cost is dominated by per-row COMPUTE
  * over that corpus (block-product dot products, k-means' k-distance
  * assignment pass) then runs on 1–2 cores while the rest of the
  * executor idles — measured 12-of-13 task threads parked on the 100×
  * k-means run, and P=2 → P=32 took the ShuffleProbe heap form from
  * 95.8 s to 6.6 s.
  *
  * The floor is sized from the SCAN BYTES (`bytesPerTask` of corpus per
  * task) rather than jumping straight to `defaultParallelism`: a
  * full-width floor costs more in task scheduling than it buys back at
  * sf0.1, while the bytes rule reproduces the natural plan there and
  * still opens big fixtures to full width. A real 100 TB corpus is
  * already thousands of splits ≥ the floor — the repartition is a no-op
  * branch, never an extra shuffle.
  *
  * NOT `df.inputFiles`: persist() rewrites the plan leaf to an
  * InMemoryRelation where inputFiles is empty — stat the fixture path
  * itself (works for a file or a directory). */
object ParallelismFloor {

  /** Bytes of the table file/directory at `path` (0 when absent). */
  def scanBytes(s: SparkSession, path: String): Long = {
    val p0 = new org.apache.hadoop.fs.Path(path)
    val fs = p0.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p0)) fs.getContentSummary(p0).getLength else 0L
  }

  /** `df` repartitioned up to `ceil(bytes / bytesPerTask)` partitions
    * (capped at defaultParallelism) when it currently has fewer;
    * unchanged otherwise. Apply BEFORE persist() so the cache itself is
    * laid out at the floored width and every downstream pass inherits
    * it without re-shuffling. */
  def apply(df: DataFrame, path: String,
            bytesPerTask: Long = 256L << 10): DataFrame = {
    val s = df.sparkSession
    val bytes = scanBytes(s, path)
    val floor = math.min(s.sparkContext.defaultParallelism.toLong,
      math.max(1L, bytes / bytesPerTask)).toInt
    if (df.rdd.getNumPartitions < floor) df.repartition(floor) else df
  }
}
