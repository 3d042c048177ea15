package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** MERGE (keyed upsert) semantics: latest-wins per key, file-granular
  * copy-on-write, null-safe key match, batch-dup refusal, atomic
  * publish with time travel intact. */
class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  test("upsert updates matched keys, inserts new ones, bumps one version") {
    val w = Warehouse(spark, tmpDir("up-wh"))
    w.load("dim", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      SinkPolicy.Append)
    val v1 = TxnLog.current(java.nio.file.Paths.get(w.root, "dim")).get.version
    val r = w.upsert("dim", Seq((2L, "B2"), (9L, "new")).toDF("k", "v"),
      Seq("k"))
    assert(r.action.startsWith("upserted"))
    val now = w.read("dim").as[(Long, String)].collect().toMap
    assert(now === Map(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "new"))
    // exactly one commit; pre-merge snapshot still readable
    val v2 = TxnLog.current(java.nio.file.Paths.get(w.root, "dim")).get.version
    assert(v2 === v1 + 1)
    val before = w.readVersion("dim", v1).as[(Long, String)].collect().toMap
    assert(before === Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("only files containing matched keys are rewritten") {
    val w = Warehouse(spark, tmpDir("up2-wh"))
    // two appends -> two disjoint file sets
    w.load("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1),
      SinkPolicy.Append)
    val filesA = w.currentFiles("t").toSet
    w.load("t", Seq((3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1),
      SinkPolicy.Append)
    val filesB = w.currentFiles("t").toSet -- filesA
    assert(filesA.nonEmpty && filesB.nonEmpty)
    // upsert touches only key 1 -> batch A's file rewritten, B's kept
    val r = w.upsert("t", Seq((1L, "A!")).toDF("k", "v"), Seq("k"))
    assert(r.action === s"upserted(rewrote=${filesA.size} files)")
    val after = w.currentFiles("t").toSet
    assert(filesB.subsetOf(after), "untouched file must carry over by reference")
    assert((filesA & after).isEmpty, "affected file must be replaced")
    assert(w.read("t").as[(Long, String)].collect().toMap ===
      Map(1L -> "A!", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("rows reports the batch rows merged, not the copy-on-write volume") {
    val w = Warehouse(spark, tmpDir("up7-wh"))
    // one 5-row file; a 2-row batch matching 1 key rewrites the file
    // carrying 4 survivors + 2 batch rows = 6 written — but the CALLER
    // landed 2, same contract as load's landed-row count
    w.load("t", (1L to 5L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1),
      SinkPolicy.Append)
    val r = w.upsert("t", Seq((3L, "V3"), (9L, "v9")).toDF("k", "v"), Seq("k"))
    assert(r.rows === 2L)
    assert(w.read("t").count() === 6)
  }

  test("upsert on a missing table is a plain append") {
    val w = Warehouse(spark, tmpDir("up3-wh"))
    w.upsert("fresh", Seq((1L, "x")).toDF("k", "v"), Seq("k"))
    assert(w.read("fresh").count() === 1)
  }

  test("NULL keys match null-safely (no duplicate accumulation)") {
    val w = Warehouse(spark, tmpDir("up4-wh"))
    val init = Seq((Some(1L), "a"), (None, "null-row"))
      .toDF("k", "v")
    w.load("n", init, SinkPolicy.Append)
    w.upsert("n", Seq((Option.empty[Long], "null-row-2")).toDF("k", "v"),
      Seq("k"))
    val rows = w.read("n").as[(Option[Long], String)].collect().toSet
    assert(rows === Set((Some(1L), "a"), (None, "null-row-2")))
  }

  test("duplicate keys within the batch are refused") {
    val w = Warehouse(spark, tmpDir("up5-wh"))
    w.load("d", Seq((1L, "a")).toDF("k", "v"), SinkPolicy.Append)
    val err = intercept[IllegalArgumentException] {
      w.upsert("d", Seq((2L, "x"), (2L, "y")).toDF("k", "v"), Seq("k"))
    }
    assert(err.getMessage.contains("duplicate keys"))
    // and the failed merge committed nothing
    assert(w.read("d").count() === 1)
  }

  test("schema-evolving batch upserts: new column lands, survivors null-fill") {
    val w = Warehouse(spark, tmpDir("up6-wh"))
    w.load("e", Seq((1L, "a"), (2L, "b")).toDF("k", "v"), SinkPolicy.Append)
    w.upsert("e", Seq((2L, "B", 7L)).toDF("k", "v", "extra"), Seq("k"))
    val out = w.read("e").select("k", "v", "extra")
      .as[(Long, String, Option[Long])].collect().toSet
    assert(out === Set((1L, "a", None), (2L, "B", Some(7L))))
  }

  test("a merge wider than maxRewriteFiles is refused before rewriting the table") {
    val w = Warehouse(spark, tmpDir("up8-wh"))
    // 12 single-row files: a batch matching every key would rewrite all
    // of them — with the ceiling at 5 the probe must stop (its collect is
    // limit-bounded to the cap + 1) and refuse with guidance, leaving the
    // table untouched
    (1L to 12L).foreach(k =>
      w.load("big", Seq((k, s"v$k")).toDF("k", "v").coalesce(1),
        SinkPolicy.Append))
    assert(w.currentFiles("big").size === 12)
    val v = TxnLog.current(java.nio.file.Paths.get(w.root, "big")).get.version
    val err = intercept[IllegalStateException] {
      w.upsert("big", (1L to 12L).map(k => (k, s"V$k")).toDF("k", "v"),
        Seq("k"), maxRewriteFiles = 5)
    }
    assert(err.getMessage.contains("more than 5 data files"))
    assert(TxnLog.current(java.nio.file.Paths.get(w.root, "big")).get.version === v,
      "refused merge must not commit")
    // the same batch under a sufficient ceiling merges normally
    val r = w.upsert("big", (1L to 12L).map(k => (k, s"V$k")).toDF("k", "v"),
      Seq("k"), maxRewriteFiles = 100)
    assert(r.action === "upserted(rewrote=12 files)")
    assert(w.read("big").as[(Long, String)].collect().toMap ===
      (1L to 12L).map(k => k -> s"V$k").toMap)
  }

  test("empty batch is skipped without a commit") {
    val w = Warehouse(spark, tmpDir("up7-wh"))
    w.load("s", Seq((1L, "a")).toDF("k", "v"), SinkPolicy.Append)
    val v = TxnLog.current(java.nio.file.Paths.get(w.root, "s")).get.version
    val r = w.upsert("s", Seq.empty[(Long, String)].toDF("k", "v"), Seq("k"))
    assert(r.action === "skipped-empty")
    assert(TxnLog.current(java.nio.file.Paths.get(w.root, "s")).get.version === v)
  }
}
