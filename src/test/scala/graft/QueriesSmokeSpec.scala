package graft

/** Every registered query must plan and execute at sf0.001 — the in-repo
  * mirror of the driver's smoke gate, so `sbt test` catches a runtime
  * break in any operator without waiting for the harness. */
class QueriesSmokeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.defs.foreach { d =>
    test(s"${d.name} executes at sf0.001") {
      val out = d.fn(spark, sfDir)
      assert(out.columns.nonEmpty)
      assert(out.count() >= 0)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
