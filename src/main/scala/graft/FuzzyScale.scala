package graft

import org.apache.spark.sql.functions._

import graft.ops.{BandJoin, FuzzyBand}

/** Scale evidence for the BANDED fuzzy-entity production form
  * (round-11 verdict #4): candidate volume must scale with the corpus
  * (∝ true-match density), never Σ(block²) — the property that retires
  * the nation-blocked O(n²/25) pair loop at 100× data. Fabricates the
  * registered query's planted-name corpus at N names (nm = md5(id), a
  * 1-char-substituted near-copy for every 10th id — identical
  * construction to `fuzzy_banded_entities`, just bigger), runs the band
  * stage + salted self-join, and prints candidates, verified matches,
  * and walls. Run at two decades; linear candidates means the ratio of
  * candidates tracks the ratio of N.
  *
  *   sbt 'runMain graft.FuzzyScale <nNames> [jwThreshold]'
  */
object FuzzyScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(
      sys.error("usage: FuzzyScale <nNames> [jwThreshold]"))
    val jw = args.lift(1).map(_.toDouble).getOrElse(0.95)
    val spark = HarnessSession.build()
    import spark.implicits._

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val ids = spark.range(1L, n + 1L).select($"id")
    val base = ids.select($"id".as("entity_id"),
      md5($"id".cast("string")).as("nm"))
    val plants = ids.where($"id" % 10 === 0)
      .select(($"id" + 10L * n).as("entity_id"),
        expr("""concat(
          substr(md5(CAST(id AS STRING)), 1, CAST(id % 27 + 3 AS INT)),
          'z',
          substr(md5(CAST(id AS STRING)), CAST(id % 27 + 5 AS INT)))""")
          .as("nm"))
    val names = base.unionByName(plants).persist()
    val total = names.count()

    // the honest recall denominator: plants whose JW actually clears
    // the threshold. Hex names carry ~2x duplicate chars, so a single
    // substitution sets off greedy-match transposition cascades in
    // Jaro — ~16% of planted copies sit BELOW 0.95 by construction
    // (measured round 12); banding recall must be judged against the
    // true matches, not the raw plant count
    val truePairs = base.select($"entity_id", $"nm".as("nm_a"))
      .join(plants.select(($"entity_id" - 10L * n).as("entity_id"),
        $"nm".as("nm_b")), Seq("entity_id"))
      .where(graft.functions.Kit.jaroWinkler($"nm_a", $"nm_b") >= jw)
      .count()

    val (bandSec, bands) = timed {
      val b = FuzzyBand.nameBands(names)
        .persist(graft.ops.StageLevels.pinnedFor(names))
      b.count()
      b
    }
    val (candSec, nCand) =
      timed(BandJoin.selfCandidates(bands).count())
    val (verifySec, nMatch) = timed(
      FuzzyBand.fuzzyBandedPairs(names, jw).count())
    println(f"""{"n_names": $total, "plants": ${total - n}, """ +
      f""""band_sec": $bandSec%.2f, "cand_sec": $candSec%.2f, """ +
      f""""candidates": $nCand, "cand_per_name": ${nCand.toDouble / total}%.4f, """ +
      f""""verify_sec": $verifySec%.2f, "matches": $nMatch, """ +
      f""""true_matches": $truePairs, """ +
      f""""recall_vs_plants": ${nMatch.toDouble / (total - n)}%.3f, """ +
      f""""recall_vs_true": ${nMatch.toDouble / truePairs}%.3f}""")
    spark.stop()
  }
}
