package graft.pipeline

import java.time.{DayOfWeek, LocalDate}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scheduling predicates — the reference's `schedule()` bodies as pure,
  * clock-injected functions. Each returns "should this source pull now?".
  */
object Gates {

  /** Watermark gate (A1 + P6): pull iff the table's `MAX(dateCol)` is
    * before yesterday — i.e. we don't have yesterday's data yet
    * (`functions/utils/datasources.py:140-143,197`). A missing table
    * means never pulled → always pull. The scan is a single partial+final
    * MAX; on a date-partitioned table Catalyst reads only partition
    * metadata. */
  def watermarkBehind(existing: Option[DataFrame], dateCol: String,
                      clock: Clock): Boolean =
    existing match {
      case None => true
      case Some(df) =>
        val hi = df.agg(max(col(dateCol)).cast("date")).collect()(0)
        hi.isNullAt(0) ||
          hi.getDate(0).toLocalDate.isBefore(clock.today.minusDays(1))
    }

  /** Budget gate (A2): with a monthly quota, remaining = quota − requests
    * already made this calendar month − requests the pending pull needs
    * (`datasources.py:147-167`: `1_000_000 - cnt - len(zips)`). */
  def monthlyBudgetAllows(existing: Option[DataFrame], dateCol: String,
                          quota: Long, pending: Long, clock: Clock): Boolean = {
    val used = existing match {
      case None => 0L
      case Some(df) =>
        df.where(month(col(dateCol)) === clock.today.getMonthValue &&
          year(col(dateCol)) === clock.today.getYear).count()
    }
    quota - used - pending > 0
  }

  /** Calendar gate (F17): in-season Monday — month ∈ {8..12, 1} and
    * day-of-week = Monday (`datasources.py:480,608-609`). */
  def seasonMonday(clock: Clock): Boolean = {
    val d = clock.today
    Set(8, 9, 10, 11, 12, 1).contains(d.getMonthValue) &&
      d.getDayOfWeek == DayOfWeek.MONDAY
  }

  /** Annual-refresh gate (F17): a year or more since the last refresh
    * (`result.year + 1 <= today.year`, `datasources.py:316,397`). The
    * reference's GeoData variant is dead code (`schedule()` returns False
    * unconditionally, SURVEY §4.1) — this implements the documented
    * intent, as its reachable sibling does. */
  def annualRefreshDue(lastRefresh: Option[LocalDate], clock: Clock): Boolean =
    lastRefresh.forall(d => d.getYear + 1 <= clock.today.getYear)

  /** Row-shape assertion (P7): the reference rejects a scraped state
    * batch when its parallel column lists disagree in length
    * (`datasources.py:349-353`). Two failure modes are checked: the
    * static one (wrong columns) and the data-dependent one the reference
    * actually guards against — mis-paired parallel lists, which surface
    * as NULL-bearing rows after `arrays_zip` pads the shorter side (see
    * `ingest/Parsers.zipRows`). */
  def rowShapeOk(df: DataFrame, expectedCols: Seq[String]): Boolean =
    df.columns.toSeq == expectedCols &&
      df.where(expectedCols.map(col(_).isNull).reduce(_ || _)).isEmpty
}
