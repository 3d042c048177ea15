package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ingest.{Fetch, Fetcher, Parsers}

/** EP1 end-to-end (SURVEY §3): the watermark-gated API ingester composed
  * from the real parts — secret lookup, watermark + budget gates,
  * partition-parallel fetch against an injected fake HTTP layer, nested-
  * JSON parse, and the re-land sink — driven by the Pipeline orchestrator
  * across three simulated days. */
class WeatherPipelineSpec extends SparkTestBase {
  import spark.implicits._

  /** One fake forecast page per zip; body depends on (zip, date) so
    * re-fetches are detectable. */
  private object FakeWeatherApi extends Fetcher {
    def get(url: String): Either[String, String] = {
      val zip = url.split("q=")(1).split("&")(0)
      val date = url.split("dt=")(1)
      Right(s"""{"forecast":{"forecastday":[{"date":"$date",""" +
        s""""day":{"totalprecip_in":0.${zip.takeRight(2)},"avgtemp_f":50.0}}]}}""")
    }
  }

  private class WeatherSource(clockDate: () => LocalDate) extends Source {
    val name = "weather"
    val table = "WeatherData"
    val policy: SinkPolicy = SinkPolicy.RelandByDate("date")
    var lastScheduleReason = ""

    def schedule(ctx: PipelineContext): Boolean = {
      val existing =
        if (ctx.warehouse.catalog.tableExists(table))
          Some(ctx.warehouse.read(table))
        else None
      val behind = Gates.watermarkBehind(existing, "date", ctx.clock)
      val inBudget = Gates.monthlyBudgetAllows(existing, "date",
        quota = 1000000, pending = 2, ctx.clock)
      lastScheduleReason = s"behind=$behind budget=$inBudget"
      behind && inBudget
    }

    def extract(ctx: PipelineContext): DataFrame = {
      val key = ctx.warehouse.secret("APIKEYS", table).get
      val pullDate = ctx.overrides.getOrElse(name,
        ctx.clock.today.minusDays(1))
      val keys = ctx.warehouse.read("US_Zips")
        .where($"state" === "GA")
        .select($"zip".as("key"),
          concat(lit(s"http://api/?key=$key&q="), $"zip",
            lit(s"&dt=$pullDate")).as("url"))
      val fetched = Fetch.ok(
        Fetch.fetchPartitioned(keys, "key", "url", FakeWeatherApi))
      val parsed = Parsers.weatherRows(fetched)
      // scheduled runs dedup on arrival; a manual re-land is a correction
      // and must REPLACE its date wholesale (the RelandByDate sink), so
      // it skips the dedup
      if (ctx.overrides.contains(name)) parsed
      else ctx.warehouse.newRowsOnly(table, parsed)
    }
  }

  test("EP1 lifecycle: gated pull, watermark catch-up skip, manual re-land") {
    val w = Warehouse(spark, tmpDir("weather-wh"))
    w.load("APIKEYS", Seq(("WeatherData", "k-42")).toDF("TBL_NM", "API_KEY"),
      SinkPolicy.Overwrite)
    w.load("US_Zips", Seq(("30301", "GA"), ("30060", "GA"), ("10001", "NY"))
      .toDF("zip", "state"), SinkPolicy.Overwrite)

    val day1 = Clock.Fixed(LocalDate.parse("2026-01-10"))
    val src = new WeatherSource(() => day1.today)
    val pipe = new Pipeline(Seq(src))

    // day 1: no table yet → watermark behind → pull yesterday for 2 GA zips
    val r1 = pipe.run(PipelineContext(spark, w, day1))
    assert(r1.head.scheduled && r1.head.load.get.rows == 2)
    assert(w.read("WeatherData").select("date").distinct().count() == 1)

    // same day again: watermark caught up (max date = yesterday) → skip
    val r2 = pipe.run(PipelineContext(spark, w, day1))
    assert(!r2.head.scheduled, src.lastScheduleReason)

    // next day: behind again → pulls the new date, table accumulates
    val day2 = Clock.Fixed(LocalDate.parse("2026-01-11"))
    val r3 = pipe.run(PipelineContext(spark, w, day2))
    assert(r3.head.scheduled && r3.head.load.get.rows == 2)
    assert(w.read("WeatherData").count() == 4)

    // manual override re-lands 2026-01-09 idempotently: still 4 rows
    // total, not 6 (delete-by-date semantics), and the run is marked manual
    val r4 = pipe.run(PipelineContext(spark, w, day2,
      overrides = Map("weather" -> LocalDate.parse("2026-01-09"))))
    assert(r4.head.manual && r4.head.scheduled)
    assert(r4.head.load.get.rows == 2) // the corrected batch really landed
    assert(w.read("WeatherData").count() == 4) // replaced, not appended
    assert(w.read("WeatherData").where($"date" === "2026-01-09").count() == 2)
  }
}
