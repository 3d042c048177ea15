package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI smoke for spill-safe execution (the full evidence run is
  * `scripts/verify_constrained.sh`, recorded in BENCH_NOTES.md): fork a
  * 1 GB JVM with Spark's unified pool squeezed to ~36 MB and run the
  * heaviest-spilling queries at sf0.1 — INCLUDING the iterative
  * operators, at the DEFAULT `spark.memory.storageFraction=0.5` (their
  * pinned loop state is DISK_ONLY by construction since round 6, so the
  * protected storage region no longer starves hash aggregates; the
  * round-5 history is in BENCH_NOTES.md). Concurrency is 4 tasks, not
  * 8: a brand-new hash-aggregate map's first page (256 KB) cannot spill
  * other TASKS' consumers, so at full saturation the first-page grab is
  * a cross-task race — 4 × 9 MB shares make the pass deterministic
  * while the per-task squeeze (and the spill assert below) stays real.
  * Asserts the run completes (no OOM — `-XX:+ExitOnOutOfMemoryError`
  * turns a heap OOM into a nonzero exit), actually spilled (the squeeze
  * is real, not vacuously green), and wrote every query's result.
  * Correctness of constrained output is the full script's job; this
  * pins the degrade-to-disk property per commit. */
class ConstrainedRunSpec extends AnyFunSuite {

  test("heavy queries complete and spill under a squeezed memory pool") {
    val out = java.nio.file.Files.createTempDirectory("vc-smoke").toString
    val queries = Seq("table_checksum", "grouped_count_distinct",
      "embedding_neardup_auto", "q1_pricing_summary", "window_running_sum",
      "neardup_clusters", "pagerank_transitions", "kmeans_histogram")
    val javaBin = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "java").toString
    val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic",
      "jdk.internal.ref", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq(s"--add-opens=java.base/$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin, "-Xmx1g", "-XX:+ExitOnOutOfMemoryError") ++
      opens ++ Seq(
      "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
      "graft.Verify", "/root/testdata/sf0.1", out)
    // log to a file so a wedged child can't block us on pipe EOF; bound
    // the wait — a memory-squeezed JVM that deadlocks instead of OOMing
    // must fail the test, not hang CI
    val logFile = java.nio.file.Files.createTempFile("vc-smoke", ".log")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(logFile.toFile)
    pb.environment().put("SPARK_GRAFT_ONLY", queries.mkString(","))
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.environment().put("SPARK_GRAFT_EXTRA_CONF",
      "spark.memory.fraction=0.05;" +
        "spark.sql.autoBroadcastJoinThreshold=1048576")
    val proc = pb.start()
    val finished = proc.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) proc.destroyForcibly()
    val log = java.nio.file.Files.readString(logFile)
    val tail = log.linesIterator.toSeq.takeRight(40).mkString("\n")
    assert(finished, s"constrained JVM wedged (killed after 10 min):\n$tail")
    assert(proc.exitValue() == 0,
      s"constrained JVM failed (exit ${proc.exitValue()}):\n$tail")
    assert(!log.contains("failed:"), s"a query failed under pressure:\n$tail")
    val total = log.linesIterator.find(_.contains("spill TOTAL"))
    assert(total.isDefined,
      s"no 'spill TOTAL' line — smoke can't prove the squeeze ran:\n$tail")
    assert(!total.get.contains("mem=0 "),
      s"squeeze did not force any spill — smoke is vacuous:\n${total.get}")
    queries.foreach { q =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, q)),
        s"$q wrote no result")
    }
  }
}
