package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ingest.{Fetch, Fetcher, Parsers}

/** EP2 end-to-end (SURVEY §3): the query-richest path — the flagship
  * missing-stats query (grouped COUNT DISTINCT + left join + null-aware
  * filter) decides WHICH games to scrape, the fetch/parse/pivot shapes
  * produce the rows, and the calendar gate + sink policy land them. */
class GameStatsPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val fieldMap = Map("1st Downs" -> "first_downs",
    "Total Yards" -> "total_yards")

  private object FakeStatsSite extends Fetcher {
    def get(url: String): Either[String, String] = {
      val game = url.split("gameId/")(1)
      Right(s"<table><tr>1st Downs|1$game|2$game</tr>" +
        s"<tr>Total Yards|30$game|40$game</tr></table>")
    }
  }

  private class GameStatsSource extends Source {
    val name = "gamestats"
    val table = "Game_Team_Stats"
    val policy: SinkPolicy = SinkPolicy.Append

    def schedule(ctx: PipelineContext): Boolean =
      Gates.seasonMonday(ctx.clock)

    /** The flagship shape over warehouse tables: games with stats rows
      * for fewer than 2 teams (or none) still need scraping. */
    def missingGames(w: Warehouse): DataFrame = {
      val games = w.read("Power_5_Games")
      val stats =
        if (w.catalog.tableExists(table))
          w.read(table).groupBy($"game_id")
            .agg(countDistinct($"is_home").as("cntcheck"))
        else games.select($"game_id").limit(0)
          .withColumn("cntcheck", lit(0L))
      games.join(stats, Seq("game_id"), "left")
        .where($"cntcheck" < 2 || $"cntcheck".isNull)
        .select($"game_id")
    }

    def extract(ctx: PipelineContext): DataFrame = {
      val keys = missingGames(ctx.warehouse)
        .select($"game_id".as("key"),
          concat(lit("http://site/gameId/"), $"game_id").as("url"))
      val pages = Fetch.ok(
        Fetch.fetchPartitioned(keys, "key", "url", FakeStatsSite))
      Parsers.pivotStats(Parsers.matchupRows(pages), fieldMap)
    }
  }

  test("EP2 lifecycle: flagship query drives the scrape; only missing games fetched") {
    val w = Warehouse(spark, tmpDir("gs-wh"))
    w.load("Power_5_Games", Seq("G1", "G2", "G3").toDF("game_id"),
      SinkPolicy.Overwrite)
    // G1 already fully landed (both sides); G2 has one side; G3 nothing
    w.load("Game_Team_Stats", Seq(
      ("G1", true, "11", "301"), ("G1", false, "21", "401"),
      ("G2", true, "12", "302"))
      .toDF("game_id", "is_home", "first_downs", "total_yards"),
      SinkPolicy.Append)

    val src = new GameStatsSource
    val monday = Clock.Fixed(LocalDate.parse("2025-11-03"))
    val ctx = PipelineContext(spark, w, monday)

    assert(src.missingGames(w).as[String].collect().toSet == Set("G2", "G3"))

    val report = new Pipeline(Seq(src)).run(ctx)
    assert(report.head.scheduled)
    assert(report.head.load.get.rows == 4) // 2 games × home/away

    val back = w.read("Game_Team_Stats")
    assert(back.count() == 7) // 3 existing + 4 scraped
    // after the land, nothing is missing anymore
    assert(src.missingGames(w).isEmpty)
    // scraped values flowed through parse → pivot → sink intact
    assert(back.where($"game_id" === "G3" && $"is_home")
      .select("first_downs", "total_yards").as[(String, String)]
      .collect().toSeq == Seq(("1G3", "30G3")))

    // off-season Tuesday: the calendar gate holds the pipeline closed
    val tuesday = Clock.Fixed(LocalDate.parse("2026-06-02"))
    val r2 = new Pipeline(Seq(src)).run(PipelineContext(spark, w, tuesday))
    assert(!r2.head.scheduled)
  }
}
