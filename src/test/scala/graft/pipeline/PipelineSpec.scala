package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** Sink semantics, catalog introspection, scheduling gates, and the
  * orchestrator — the M3 layer (SURVEY §7). Each test uses its own
  * warehouse directory, so suites are order-independent.
  */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def wh(): Warehouse = Warehouse(spark, tmpDir("graft-wh"))

  private def hits(d: String, n: Int): DataFrame =
    (1 to n).map(i => (s"u$i", d)).toDF("user", "event_date")
      .withColumn("event_date", $"event_date".cast("date"))

  // ---- catalog (S3/S4) ----

  test("tableExists is false before any land, true after") {
    val w = wh()
    assert(!w.catalog.tableExists("hits"))
    w.load("hits", hits("2026-01-01", 3), SinkPolicy.Append)
    assert(w.catalog.tableExists("hits"))
    assert(w.catalog.listTables() == Seq("hits"))
  }

  test("lastModifiedDate reflects the latest land") {
    val w = wh()
    assert(w.catalog.lastModifiedDate("hits").isEmpty)
    w.load("hits", hits("2026-01-01", 1), SinkPolicy.Append)
    assert(w.catalog.lastModifiedDate("hits")
      .contains(LocalDate.now(java.time.ZoneOffset.UTC)))
  }

  // ---- sinks (S11/S12/S13) ----

  test("append accumulates rows") {
    val w = wh()
    w.load("hits", hits("2026-01-01", 3), SinkPolicy.Append)
    w.load("hits", hits("2026-01-02", 2), SinkPolicy.Append)
    assert(w.read("hits").count() == 5)
  }

  test("append allows field addition; mergeSchema read sees old rows as null") {
    val w = wh()
    w.load("hits", hits("2026-01-01", 2), SinkPolicy.Append)
    val widened = hits("2026-01-02", 1).withColumn("ua",
      org.apache.spark.sql.functions.lit("firefox"))
    w.load("hits", widened, SinkPolicy.Append)
    val back = w.read("hits")
    assert(back.columns.toSet == Set("user", "event_date", "ua"))
    assert(back.where($"ua".isNull).count() == 2)
    assert(back.where($"ua" === "firefox").count() == 1)
  }

  test("overwrite truncate-replaces") {
    val w = wh()
    w.load("t", hits("2026-01-01", 5), SinkPolicy.Overwrite)
    w.load("t", hits("2026-01-02", 2), SinkPolicy.Overwrite)
    assert(w.read("t").count() == 2)
  }

  test("reland-by-date is idempotent and leaves other dates untouched") {
    val w = wh()
    val p = SinkPolicy.RelandByDate("event_date")
    w.load("t", hits("2026-01-01", 3), p)
    w.load("t", hits("2026-01-02", 4), p)
    assert(w.read("t").count() == 7)
    // re-land 01-02 (a corrected batch of 2 rows): 01-01 survives, 01-02
    // is replaced not duplicated
    w.load("t", hits("2026-01-02", 2), p)
    val back = w.read("t")
    assert(back.count() == 5)
    assert(back.where($"event_date" === "2026-01-01").count() == 3)
    assert(back.where($"event_date" === "2026-01-02").count() == 2)
  }

  test("empty batch is skipped, not landed") {
    val w = wh()
    val r = w.load("t", hits("2026-01-01", 1).limit(0), SinkPolicy.Append)
    assert(r.action == "skipped-empty" && r.rows == 0)
    assert(!w.catalog.tableExists("t"))
  }

  // ---- dedup-on-arrival (J2 intended semantics) ----

  test("newRowsOnly keeps only rows absent from the table") {
    val w = wh()
    w.load("t", hits("2026-01-01", 3), SinkPolicy.Append)
    val incoming = hits("2026-01-01", 4) // u1..u3 already present, u4 new
    val fresh = w.newRowsOnly("t", incoming)
    assert(fresh.select("user").as[String].collect().toSet == Set("u4"))
    w.load("t", fresh, SinkPolicy.Append)
    assert(w.read("t").count() == 4)
  }

  test("newRowsOnly is null-safe: NULL-bearing rows don't re-ingest forever") {
    val w = wh()
    val withNull = Seq(("u1", Some("2026-01-01")), ("u2", None))
      .toDF("user", "event_date")
      .withColumn("event_date", $"event_date".cast("date"))
    w.load("t", withNull, SinkPolicy.Append)
    // identical batch arrives again: nothing is new, including the NULL row
    assert(w.newRowsOnly("t", withNull).count() == 0)
  }

  test("newRowsOnly dedups a field-addition-widened batch on shared columns") {
    val w = wh()
    w.load("t", hits("2026-01-01", 2), SinkPolicy.Append)
    val widened = hits("2026-01-01", 3).withColumn("ua",
      org.apache.spark.sql.functions.lit("ff"))
    val fresh = w.newRowsOnly("t", widened)
    assert(fresh.select("user").as[String].collect().toSet == Set("u3"))
    assert(fresh.columns.contains("ua")) // new column survives the dedup
  }

  // ---- secrets (S2 lookup) ----

  test("secret returns the key for the requested table") {
    val w = wh()
    val keys = Seq(("weather", "k-123"), ("geo", "k-456"))
      .toDF("TBL_NM", "API_KEY")
    w.load("APIKEYS", keys, SinkPolicy.Overwrite)
    assert(w.secret("APIKEYS", "weather").contains("k-123"))
    assert(w.secret("APIKEYS", "nope").isEmpty)
    assert(w.secret("MISSING", "weather").isEmpty)
  }

  // ---- gates ----

  test("watermarkBehind: missing table pulls; fresh table doesn't; stale does") {
    val clock = Clock.Fixed(LocalDate.parse("2026-01-10"))
    assert(Gates.watermarkBehind(None, "event_date", clock))
    val fresh = hits("2026-01-09", 1) // yesterday present → caught up
    assert(!Gates.watermarkBehind(Some(fresh), "event_date", clock))
    val stale = hits("2026-01-07", 1)
    assert(Gates.watermarkBehind(Some(stale), "event_date", clock))
  }

  test("monthlyBudgetAllows counts only the current calendar month") {
    val clock = Clock.Fixed(LocalDate.parse("2026-01-10"))
    val used = hits("2026-01-05", 3).unionAll(hits("2025-12-31", 50))
    assert(Gates.monthlyBudgetAllows(Some(used), "event_date",
      quota = 10, pending = 6, clock)) // 10 - 3 - 6 = 1 > 0
    assert(!Gates.monthlyBudgetAllows(Some(used), "event_date",
      quota = 10, pending = 7, clock)) // 10 - 3 - 7 = 0
    assert(Gates.monthlyBudgetAllows(None, "event_date", 1, 0, clock))
  }

  test("seasonMonday: true only on Mondays in Aug-Jan") {
    assert(Gates.seasonMonday(Clock.Fixed(LocalDate.parse("2026-01-05")))) // Mon Jan
    assert(!Gates.seasonMonday(Clock.Fixed(LocalDate.parse("2026-01-06")))) // Tue Jan
    assert(!Gates.seasonMonday(Clock.Fixed(LocalDate.parse("2026-06-01")))) // Mon Jun
    assert(Gates.seasonMonday(Clock.Fixed(LocalDate.parse("2025-11-03")))) // Mon Nov
  }

  test("annualRefreshDue after a year (or never refreshed)") {
    val clock = Clock.Fixed(LocalDate.parse("2026-01-10"))
    assert(Gates.annualRefreshDue(None, clock))
    assert(Gates.annualRefreshDue(Some(LocalDate.parse("2025-03-01")), clock))
    assert(!Gates.annualRefreshDue(Some(LocalDate.parse("2026-01-01")), clock))
  }

  test("rowShapeOk checks extracted column shape and mis-paired (null) rows") {
    assert(Gates.rowShapeOk(hits("2026-01-01", 1), Seq("user", "event_date")))
    assert(!Gates.rowShapeOk(hits("2026-01-01", 1), Seq("user")))
    val misPaired = Seq(("u1", Some("x")), ("u2", None)).toDF("user", "county")
    assert(!Gates.rowShapeOk(misPaired, Seq("user", "county")))
  }

  // ---- orchestrator ----

  private class FakeSource(val name: String, val table: String,
                           val policy: SinkPolicy, sched: Boolean,
                           batch: () => DataFrame) extends Source {
    var extracted = 0
    def schedule(ctx: PipelineContext): Boolean = sched
    def extract(ctx: PipelineContext): DataFrame = { extracted += 1; batch() }
  }

  test("pipeline runs scheduled sources, skips unscheduled, honors manual override") {
    val w = wh()
    val ctx = PipelineContext(spark, w, Clock.Fixed(LocalDate.parse("2026-01-10")),
      overrides = Map("c" -> LocalDate.parse("2026-01-02")))
    val a = new FakeSource("a", "ta", SinkPolicy.Append, sched = true,
      () => hits("2026-01-09", 2))
    val b = new FakeSource("b", "tb", SinkPolicy.Append, sched = false,
      () => hits("2026-01-09", 2))
    val c = new FakeSource("c", "tc", SinkPolicy.RelandByDate("event_date"),
      sched = false, () => hits("2026-01-02", 3))
    val report = new Pipeline(Seq(a, b, c)).run(ctx)
    assert(report.map(r => (r.source, r.scheduled, r.manual)) ==
      Seq(("a", true, false), ("b", false, false), ("c", true, true)))
    assert(a.extracted == 1 && b.extracted == 0 && c.extracted == 1)
    assert(w.read("ta").count() == 2)
    assert(!w.catalog.tableExists("tb"))
    assert(w.read("tc").count() == 3)
  }

  test("beyondWatermark filters a batch to rows past the stored max date") {
    val w = wh()
    w.load("t", hits("2026-01-05", 2), SinkPolicy.Append)
    val batch = hits("2026-01-04", 1).unionAll(hits("2026-01-05", 1))
      .unionAll(hits("2026-01-06", 2))
    val inc = Pipeline.beyondWatermark(w, "t", "event_date", batch)
    assert(inc.count() == 2)
    assert(Pipeline.beyondWatermark(w, "missing", "event_date", batch)
      .count() == 4)
  }
}
