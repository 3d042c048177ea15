package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Everything a source's `schedule`/`extract` may consult. */
final case class PipelineContext(
    spark: SparkSession,
    warehouse: Warehouse,
    clock: Clock,
    /** Manual re-land override: source name → business date to re-land
      * (`pipeline.py:34-41` + the `overwrite` flag, `datasources.py:29`). */
    overrides: Map[String, LocalDate] = Map.empty)

/** One unit of ingestion — the reference's `DataSource`
  * (`functions/utils/datasources.py:20-83`): a name, a target table, a
  * scheduling predicate, an extraction producing a DataFrame, and a sink
  * policy. Extraction is DECLARATIVE (returns a lazy DataFrame); the
  * pipeline decides when to execute it by landing it.
  */
trait Source {
  def name: String
  def table: String
  def policy: SinkPolicy
  def schedule(ctx: PipelineContext): Boolean
  def extract(ctx: PipelineContext): DataFrame
}

/** Per-source outcome of one pipeline run. */
final case class SourceRun(
    source: String, scheduled: Boolean, manual: Boolean, load: Option[LoadResult])

/** The orchestrator — `Pipeline` (`functions/utils/pipeline.py:9-59`):
  * for each source in declaration order, decide (manual override OR
  * `schedule()`), extract, land. Differences from the reference, all
  * deliberate (SURVEY §4.1):
  *
  *   - errors surface: an extract/load failure throws instead of being
  *     silently swallowed (the fire-and-forget DELETE quirk);
  *   - a manual override lands via delete-by-date re-land semantics ONLY
  *     when the source's policy is [[SinkPolicy.RelandByDate]] — a normal
  *     scheduled run can never fire the idempotency delete with an unset
  *     date (the `WHERE Date='None'` latent bug);
  *   - the manual path still calls `extract` with the override date in
  *     context, mirroring `manual_schedule()` forcing `scheduled=True`.
  */
final class Pipeline(sources: Seq[Source]) {

  def run(ctx: PipelineContext): Seq[SourceRun] =
    sources.map { src =>
      val manual = ctx.overrides.contains(src.name)
      val scheduled = manual || src.schedule(ctx)
      if (!scheduled) SourceRun(src.name, scheduled = false, manual, None)
      else {
        val batch = src.extract(ctx)
        val result = ctx.warehouse.load(src.table, batch, src.policy)
        SourceRun(src.name, scheduled = true, manual, Some(result))
      }
    }
}

object Pipeline {

  /** Incremental batch filter: keep only rows past the stored watermark
    * (the manual incremental-processing semantics every reference batch
    * pipeline implements — `MAX(Date)` then pull-beyond,
    * `datasources.py:140-143,197`). On a date-partitioned sink this prunes
    * partitions at scan time. */
  def beyondWatermark(warehouse: Warehouse, table: String, dateCol: String,
                      batch: DataFrame): DataFrame =
    if (!warehouse.catalog.tableExists(table)) batch
    else {
      val hi = warehouse.read(table).agg(max(col(dateCol))).collect()(0)
      if (hi.isNullAt(0)) batch
      else batch.where(col(dateCol) > lit(hi.get(0)))
    }
}
