package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator registry in `graft.ops` into the
  * `queries`/`oracleSql` maps the Verify/Bench harness consumes.
  */
object SparkEntry {

  /** Every operator the engine exposes, in registration order. */
  def defs: Seq[QueryDef] =
    Relational.all ++ JoinsSetOps.all ++ Shaping.all ++ TextOps.all ++
      Similarity.all ++ Pq.all ++ AnnRouter.all ++ AnnIndex.all ++
      Windowed.all ++ Advanced.all ++ FuzzyBand.all ++ RangeJoin.all ++
      Clustering.all ++ Curation.all ++ Components.all ++ Analytics.all ++
      PageRank.all ++ graft.streaming.TextGate.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.flagshipMissingStats.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
