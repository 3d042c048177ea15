package graft.pipeline

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Model-based property check of the delta-manifest protocol: for ANY
  * sequence of append / remove-subset / replace-all commits, resolving
  * every version through the snapshot+delta chain must equal naive
  * full-list bookkeeping — files, order, and zone-map stats. This is
  * the strongest guard on the round-5 TxnLog format change: the fold
  * in `readVersion` and the delta encoding in `tryCommit` are checked
  * against each other across snapshot boundaries, empty commits,
  * stats churn, and every cadence position. No Spark session. */
class ManifestLawsSpec extends AnyFunSuite {

  private sealed trait Op
  private case class Append(n: Int, withStats: Boolean) extends Op
  private case class RemoveEveryKth(k: Int) extends Op
  private case class ReplaceAll(n: Int) extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    6 -> Gen.zip(Gen.choose(1, 4), Gen.oneOf(true, false))
      .map { case (n, s) => Append(n, s) },
    2 -> Gen.choose(2, 4).map(RemoveEveryKth(_)),
    1 -> Gen.choose(1, 3).map(ReplaceAll(_)))

  // enough ops to cross at least two SnapshotEvery boundaries
  private val genOps: Gen[List[Op]] =
    Gen.choose(5, 28).flatMap(n => Gen.listOfN(n, genOp))

  private def check(name: String)(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("chain resolution equals naive full-list bookkeeping for any commit sequence") {
    check("manifest-fold")(Prop.forAll(genOps) { ops =>
      val dir = Files.createTempDirectory("mlaw")
      var serial = 0
      // the model: full (files, stats) state after every commit
      var model = Vector.empty[(Seq[String], Map[String, Seq[(String, String)]])]
      ops.foreach { op =>
        TxnLog.commit(dir) { cur =>
          val curFiles = cur.map(_.files).getOrElse(Seq.empty)
          val curStats = cur.map(_.fileStats).getOrElse(Map.empty)
          val (files, stats) = op match {
            case Append(n, withStats) =>
              val added = (1 to n).map { _ =>
                serial += 1; f"data/f$serial%04d.parquet"
              }
              (curFiles ++ added,
                if (withStats)
                  curStats ++ added.map(f =>
                    // two pairs per file: the multi-column encoding
                    f -> Seq((f.length.toString, f), ("0", f)))
                else curStats)
            case RemoveEveryKth(k) =>
              val kept = curFiles.zipWithIndex
                .collect { case (f, i) if i % k != 0 => f }
              (kept, curStats.filter(kv => kept.contains(kv._1)))
            case ReplaceAll(n) =>
              val fresh = (1 to n).map { _ =>
                serial += 1; f"data/f$serial%04d.parquet"
              }
              (fresh, fresh.map(f => f -> Seq(("0", f))).toMap)
          }
          model = model :+ ((files, stats))
          ManifestData(Seq.empty, files, Seq.empty, stats)
        }
      }
      val versions = TxnLog.versions(dir)
      val ok = versions.size == model.size && versions.zipWithIndex.forall {
        case (v, i) =>
          val m = TxnLog.readVersion(dir, v)
          m.files == model(i)._1 && m.fileStats == model(i)._2
      }
      // cadence sanity: chains never exceed SnapshotEvery manifests
      val boundedChains = versions.forall(v =>
        TxnLog.chainVersions(dir, v).size <= TxnLog.SnapshotEvery)
      ok && boundedChains
    })
  }

  test("changing a kept file's stats delta-encodes as remove+re-add (sets preserved)") {
    // the one writer path the law above can't hit with ordered equality:
    // a kept file whose zone-map stats change is re-appended, which may
    // reorder it — documented; every consumer uses sets
    check("stats-churn")(Prop.forAll(Gen.choose(2, 12)) { nCommits =>
      val dir = Files.createTempDirectory("mlaw2")
      val files = (1 to 6).map(i => f"data/f$i%02d.parquet")
      var model = Vector.empty[Map[String, Seq[(String, String)]]]
      (1 to nCommits).foreach { c =>
        TxnLog.commit(dir) { _ =>
          // every commit keeps the same file SET but re-stats a rotating
          // subset — exercises the statsChanged remove+re-add encoding
          val stats = files.zipWithIndex.map { case (f, i) =>
            f -> (if (i % 3 == c % 3) Seq((s"v$c", f)) else Seq((s"v0", f)))
          }.toMap
          model = model :+ stats
          ManifestData(Seq.empty, files, Seq.empty, stats)
        }
      }
      TxnLog.versions(dir).zipWithIndex.forall { case (v, i) =>
        val m = TxnLog.readVersion(dir, v)
        m.files.sorted == files.sorted && m.files.distinct == m.files &&
          m.fileStats == model(i)
      }
    })
  }
}
