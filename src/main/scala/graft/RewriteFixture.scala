package graft

/** Rewrite a parquet file/dir at WAREHOUSE file geometry (N writer
  * partitions → files whose row groups are bounded by the 128 MB
  * parquet block default — the shape `pipeline.Warehouse` landings
  * produce). Exists because `gen_stress.py` writes single-file fixtures
  * with ~282 MB row groups (pyarrow's 1M-row default), and the parquet
  * reader materializes WHOLE row groups: a handful of concurrent scan
  * tasks over such a file hold multi-GB of heap no matter how small
  * `spark.sql.files.maxPartitionBytes` is — an upstream-file defect the
  * production path (stage tables written by the warehouse) never
  * exhibits. See STRESS_r12.md §2.
  *
  *   sbt 'runMain graft.RewriteFixture <in.parquet> <outDir> <nParts>'
  */
object RewriteFixture {
  def main(args: Array[String]): Unit = {
    val Array(in, out, parts) = args
    val spark = HarnessSession.build()
    spark.read.parquet(in).repartition(parts.toInt)
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
