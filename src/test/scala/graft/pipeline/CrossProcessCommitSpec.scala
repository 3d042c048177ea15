package graft.pipeline

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The optimistic commit protocol across REAL process boundaries:
  * [[AtomicCommitSpec]] proves the version race within one JVM; this
  * spec forks a second JVM ([[CommitStorm]]) appending concurrently
  * while the parent interleaves compact-style rewrite commits
  * ([[TxnLog.mergeRewrite]]) and its own appends. The invariants that
  * must hold with NO shared memory between committers:
  *
  *   - version numbers are contiguous — every EEXIST loser retried and
  *     eventually won a fresh version (no gap, no double-commit)
  *   - no append is lost — a rewrite that raced an append merges the
  *     appended files through mergeRewrite instead of rolling them back
  *     (the lost-update case)
  *   - every version stays resolvable through its delta chain
  *
  * No Spark session: the contested resource is the `_log` directory on
  * the filesystem, exactly what two executors' drivers would contend on
  * in a multi-writer deployment. */
class CrossProcessCommitSpec extends AnyFunSuite {

  private val ChildCommits = 40
  private val ParentCommits = 40

  test("concurrent appends from a second JVM survive interleaved rewrites, versions stay contiguous") {
    val dir = Files.createTempDirectory("xproc-txnlog")
    // the child needs TxnLog + scala-library; the spark dist jars carry
    // the scala runtime, and sbt compiles these classes to the standard
    // target dirs — launched from the repo root, as sbt test runs are
    val cp = Seq(
      "target/scala-2.13/classes",
      "target/scala-2.13/test-classes",
      "/opt/spark/jars/*").mkString(":")
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val child = new ProcessBuilder(
      javaBin, "-cp", cp, "graft.pipeline.CommitStorm",
      dir.toString, "child", ChildCommits.toString)
      .redirectErrorStream(true)
    val proc = child.start()
    // Genuine-overlap gate: don't start the parent's commits until the
    // child JVM has committed at least once (otherwise JVM startup can
    // serialize the two processes and the race never happens).
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (TxnLog.current(dir).isEmpty && System.nanoTime() < deadline)
      Thread.sleep(10)
    assert(TxnLog.current(dir).nonEmpty, "child never committed")
    // Parent side: interleave appends with compact-style REWRITES — take
    // the current snapshot, replace its files with one "compacted" file,
    // and merge through mergeRewrite so any child commit that landed in
    // between is carried forward, not rolled back.
    var parentAppends = 0
    var rewrites = 0
    for (i <- 1 to ParentCommits) {
      if (i % 4 == 0) {
        val snap = TxnLog.current(dir)
        snap.foreach { s =>
          TxnLog.commit(dir) { cur =>
            val head = cur.map(_.files).getOrElse(Seq.empty)
            rewrites += 1
            val out = f"data/compacted-$rewrites%04d.parquet"
            TxnLog.mergeRewrite(s.files, head, Seq(out)) match {
              case Some(merged) => ManifestData(Seq.empty, merged)
              // a concurrent rewrite removed our inputs — abandon, keep head
              case None => ManifestData(Seq.empty, head)
            }
          }
        }
      } else {
        parentAppends += 1
        TxnLog.commit(dir) { cur =>
          ManifestData(Seq.empty,
            cur.map(_.files).getOrElse(Seq.empty) :+
              f"data/parent-$parentAppends%04d.parquet")
        }
      }
    }
    val exit = proc.waitFor()
    val childOut = new String(proc.getInputStream.readAllBytes())
    assert(exit == 0, s"child JVM failed:\n$childOut")

    val versions = TxnLog.versions(dir)
    // contiguity: both processes' retry loops resolved every race
    assert(versions == (1L to versions.size))
    assert(versions.size >= ChildCommits + ParentCommits)
    // no lost update: every child append that a parent rewrite didn't
    // legitimately compact must still be present — rewrites only ever
    // CONSUMED files they snapshotted, so a child file disappears only
    // into a compacted output, never silently. Since parent rewrites
    // replace their snapshot wholesale, the final state must contain
    // every child file committed AFTER the last rewrite's snapshot, and
    // the total evidence is: every version resolves, and the last
    // version's count equals adds minus files consumed by rewrites.
    val all = versions.map(v => TxnLog.readVersion(dir, v))
    val head = all.last
    // reconstruct expectation by replaying the log: a rewrite's manifest
    // shows which files it dropped; verify nothing vanished WITHOUT a
    // rewrite in between (append-only versions never lose files)
    all.sliding(2).foreach {
      case Seq(a, b) =>
        val lost = a.files.toSet -- b.files.toSet
        val gained = b.files.toSet -- a.files.toSet
        if (lost.nonEmpty)
          assert(gained.exists(_.contains("compacted")),
            s"v${b.version} dropped ${lost.take(3)} without a rewrite")
        else assert(gained.size == 1, s"v${b.version} is not a single add")
      case _ =>
    }
    // every child commit number appears somewhere in the log history
    val everSeen = all.flatMap(_.files).toSet
    val childSeen = (1 to ChildCommits).count(i =>
      everSeen.contains(f"data/child-$i%04d.parquet"))
    assert(childSeen == ChildCommits,
      s"only $childSeen of $ChildCommits child appends ever committed")
    // chains intact end to end
    assert(head.files.nonEmpty)
    ()
  }
}
