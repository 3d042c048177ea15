package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate table (a minimal materialized
  * view): keyed COUNT + SUMs folded forward from DELTAS, never by
  * rescanning the base table.
  *
  * The reason this exists at 100 TB: a daily "orders per customer"
  * rollup over a petabyte of history must not re-read the history to
  * absorb one day of new rows. Because COUNT and SUM are commutative
  * monoids, the delta's partial aggregate merges with the stored
  * aggregate by addition — so each refresh costs O(delta) scan +
  * O(affected keys) merge, independent of base-table size. (AVG and
  * friends derive from the stored (sum, count) pair at read time;
  * non-decomposable aggregates — MEDIAN, COUNT(DISTINCT) — need sketch
  * state instead: see the HLL rollup operator for that pattern.)
  *
  * Merge mechanics: the stored rows for AFFECTED keys are semi-joined
  * out (at scale this read prunes by zone map / bucket, never a full
  * scan), summed with the delta partials, and landed through
  * [[Warehouse.upsert]] — whole-row replacement per key under the
  * atomic manifest commit, txn-tagged so a crashed-and-replayed refresh
  * applies once. Unaffected keys' rows are untouched on disk
  * (file-granular copy-on-write inside upsert).
  */
object IncrementalAgg {

  /** Fold `delta` into aggregate table `aggTable` keyed by `keys`,
    * maintaining `n_rows` plus `sum_<c>` for every c in `sumCols`.
    * Creates the table on first refresh. `txnId` gives replay-safety
    * (same contract as [[Warehouse.upsert]]). */
  def refreshSumCount(wh: Warehouse, aggTable: String, delta: DataFrame,
                      keys: Seq[String], sumCols: Seq[String],
                      txnId: Option[String] = None): LoadResult = {
    val keyCols = keys.map(col)
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    val part = delta.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val merged =
      if (wh.catalog.tableExists(aggTable)) {
        val affected = part.select(keyCols: _*)
        val existing = wh.read(aggTable)
          .join(affected, keys, "left_semi")
        val folded = existing.unionByName(part)
        val sums = sum(col("n_rows")).as("n_rows") +:
          sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
        folded.groupBy(keyCols: _*).agg(sums.head, sums.tail: _*)
      } else part
    wh.upsert(aggTable, merged, keys, txnId)
  }
}
