package graft.pipeline

import java.nio.file.Paths

import graft.SparkTestBase

/** Zone maps (per-file min/max in the manifest): a range read on a
  * NON-partition column opens only the files whose recorded range can
  * intersect the query's — with identical rows to a full scan+filter. */
class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._

  private def batch(lo: Long, n: Int) =
    (lo until lo + n).map(i => (i, s"r$i")).toDF("k", "payload")

  test("range read prunes files by min/max and matches the full scan") {
    val w = Warehouse(spark, tmpDir("zm-wh"))
    // four appends with disjoint, append-ordered key ranges — the natural
    // shape of a monotonic column accumulating over time
    Seq(0L, 100L, 200L, 300L).foreach(lo =>
      w.load("t", batch(lo, 100).coalesce(1), SinkPolicy.Append,
        statsCol = Some("k")))
    val m = TxnLog.current(Paths.get(w.root, "t")).get
    assert(m.statsCols == Seq("k"))
    assert(m.fileStats.size == m.files.size) // every file carries stats

    // a range inside one batch touches exactly one file
    assert(w.prunedFiles(m, "t", "k", "120", "180").size == 1)
    // a range spanning a boundary touches exactly two
    assert(w.prunedFiles(m, "t", "k", "190", "210").size == 2)

    val pruned = w.readBetween("t", "k", "190", "210")
      .select("k").as[Long].collect().sorted.toSeq
    val full = w.read("t").where($"k" >= 190 && $"k" <= 210)
      .select("k").as[Long].collect().sorted.toSeq
    assert(pruned == full && full.size == 21)
  }

  test("appends inherit the stats column; pre-stats files are never pruned") {
    val w = Warehouse(spark, tmpDir("zm2-wh"))
    // first land predates the zone map — its file has no stats entry
    w.load("t", batch(0, 50).coalesce(1), SinkPolicy.Append)
    w.load("t", batch(100, 50).coalesce(1), SinkPolicy.Append,
      statsCol = Some("k"))
    w.load("t", batch(200, 50).coalesce(1), SinkPolicy.Append) // inherits
    val m = TxnLog.current(Paths.get(w.root, "t")).get
    assert(m.statsCols == Seq("k"))
    // query far outside the stats-less file's range: it must still be
    // scanned (no stats → unprunable), plus the one matching file
    val files = w.prunedFiles(m, "t", "k", "210", "220")
    assert(files.size == 2, s"expected stats-less + matching file: $files")
    assert(w.readBetween("t", "k", "210", "220").count() == 11)
  }

  test("switching the stats column drops the old column's per-file stats") {
    val w = Warehouse(spark, tmpDir("zm4-wh"))
    val data = (0 until 50).map(i => (i.toLong, (1000L - i))).toDF("k", "v")
    w.load("t", data.coalesce(1), SinkPolicy.Append, statsCol = Some("k"))
    // new loads declare a DIFFERENT stats column: the first file's k-stats
    // must not masquerade as v-stats (k and v order oppositely here, so
    // stale stats would prune the wrong files)
    w.load("t", (50 until 100).map(i => (i.toLong, (1000L - i)))
      .toDF("k", "v").coalesce(1), SinkPolicy.Append, statsCol = Some("v"))
    val m = TxnLog.current(Paths.get(w.root, "t")).get
    assert(m.statsCols == Seq("v"))
    assert(m.fileStats.size == 1) // only the v-stats file carries stats
    // the stats-less first file is always scanned, so rows with v in
    // range from BOTH files are found
    assert(w.readBetween("t", "v", "940", "960").count() == 21)
  }

  test("a range outside every file's stats is an empty result, not an error") {
    val w = Warehouse(spark, tmpDir("zm7-wh"))
    Seq(0L, 100L).foreach(lo =>
      w.load("t", batch(lo, 100).coalesce(1), SinkPolicy.Append,
        statsCol = Some("k")))
    val m = TxnLog.current(Paths.get(w.root, "t")).get
    assert(w.prunedFiles(m, "t", "k", "5000", "6000").isEmpty)
    val out = w.readBetween("t", "k", "5000", "6000")
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("k", "payload")) // schema survives
  }

  test("zone map stays usable when the stats column was added by evolution") {
    val w = Warehouse(spark, tmpDir("zm8-wh"))
    // oldest file PREDATES the k2 column entirely — colType must not
    // probe it (m.files is sorted, so a naive take(1) would)
    w.load("t", (0 until 50).map(i => (i.toLong, s"r$i")).toDF("k", "payload")
      .coalesce(1), SinkPolicy.Append)
    w.load("t", (0 until 50).map(i => (i.toLong, s"s$i", i * 10L))
      .toDF("k", "payload", "k2").coalesce(1), SinkPolicy.Append,
      statsCol = Some("k2"))
    assert(w.readBetween("t", "k2", "100", "200").count() == 11)
    // and pruning still fires: a range outside the evolved file's stats
    // opens only the stats-less legacy file
    val m = TxnLog.current(Paths.get(w.root, "t")).get
    assert(w.prunedFiles(m, "t", "k2", "90000", "99999").size == 1)
  }

  test("multi-column zone maps: a box query opens the INTERSECTION of per-column survivors") {
    val w = Warehouse(spark, tmpDir("zm9-wh"))
    // k is append-ordered; ts cycles so k-pruning and ts-pruning select
    // DIFFERENT file subsets — the intersection is the box query's win
    (0 until 4).foreach { i =>
      val rows = (0 until 100)
        .map(j => (i * 100L + j, (i % 2) * 1000L + j))
        .toDF("k", "ts")
      w.load("t", rows.coalesce(1), SinkPolicy.Append,
        statsCols = Seq("k", "ts"))
    }
    val m = TxnLog.current(Paths.get(w.root, "t")).get
    assert(m.statsCols == Seq("k", "ts"))
    assert(m.fileStats.size == 4)
    assert(m.fileStats.values.forall(_.size == 2)) // one pair per column
    // per-column pruning: k range hits 1 file, ts range hits 2 (files 0,2)
    assert(w.prunedFiles(m, "t", "k", "120", "180").size == 1)
    assert(w.prunedFiles(m, "t", "ts", "0", "50").size == 2)
    // the BOX opens only their intersection: file 1 (k 100-199, ts 1000+)
    // fails the ts range, files 0/2 fail the k range except file 1...
    // k ∈ [120,180] selects file 1; ts ∈ [1000,1050] keeps odd files —
    // intersection is exactly file 1
    val box = w.readBox("t", Seq(("k", "120", "180"), ("ts", "1000", "1050")))
    val full = w.read("t")
      .where($"k" >= 120 && $"k" <= 180 && $"ts" >= 1000 && $"ts" <= 1050)
    assert(box.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
    assert(box.count() == 31) // file 1: j ∈ [20,80] ∩ [0,50] = [20,50]
    // and a box whose column ranges are individually satisfiable but
    // jointly not opens NOTHING
    val empty = w.readBox("t", Seq(("k", "0", "50"), ("ts", "1000", "1050")))
    assert(empty.count() == 0)
  }

  test("appends inherit the multi-column stats declaration") {
    val w = Warehouse(spark, tmpDir("zm12-wh"))
    w.load("t", (0 until 20).map(i => (i.toLong, i * 10L)).toDF("k", "ts")
      .coalesce(1), SinkPolicy.Append, statsCols = Seq("k", "ts"))
    // second load declares nothing — the table's column list carries
    w.load("t", (20 until 40).map(i => (i.toLong, i * 10L)).toDF("k", "ts")
      .coalesce(1), SinkPolicy.Append)
    val m = TxnLog.current(Paths.get(w.root, "t")).get
    assert(m.statsCols == Seq("k", "ts"))
    assert(m.fileStats.size == 2)
    assert(m.fileStats.values.forall(_.size == 2))
  }

  test("multi-column stats survive compaction and delta encoding") {
    val w = Warehouse(spark, tmpDir("zm10-wh"))
    (0 until 3).foreach { i =>
      val rows = (0 until 50).map(j => (i * 50L + j, i * 500L + j))
        .toDF("k", "ts")
      w.load("t", rows.coalesce(1), SinkPolicy.Append,
        statsCols = Seq("k", "ts"))
    }
    w.compact("t", targetBytesPerFile = 1L << 40)
    val m = TxnLog.current(Paths.get(w.root, "t")).get
    assert(m.statsCols == Seq("k", "ts"))
    assert(m.files.size == 1)
    val Seq((kMn, kMx), (tsMn, tsMx)) = m.fileStats(m.files.head)
    assert(kMn.toLong == 0L && kMx.toLong == 149L)
    assert(tsMn.toLong == 0L && tsMx.toLong == 1049L)
    assert(w.readBetween("t", "ts", "500", "540").count() == 41)
  }

  test("z-order compaction makes 2-D box queries prune where 1-D clustering cannot") {
    val w = Warehouse(spark, tmpDir("zm11-wh"))
    // k and ts are independent pseudo-random — every appended file spans
    // BOTH full ranges, so zone maps prune nothing before the rewrite
    def rows(lo: Int) = (lo until lo + 1000)
      .map(r => ((r * 48271L) % 4000, (r * 16807L) % 4000, s"p$r"))
      .toDF("k", "ts", "payload")
    (0 until 4).foreach(i =>
      w.load("t", rows(i * 1000).coalesce(1), SinkPolicy.Append,
        statsCols = Seq("k", "ts")))
    val dir = Paths.get(w.root, "t")
    val before = TxnLog.current(dir).get
    def boxFiles(m: Manifest): Set[String] =
      Set(("k", "100", "500"), ("ts", "100", "500"))
        .map { case (c, lo, hi) => w.prunedFiles(m, "t", c, lo, hi).toSet }
        .reduce(_ intersect _)
    assert(boxFiles(before).size == before.files.size,
      "interleaved appends must be unprunable — else the test is vacuous")
    // z-order into ~16 files
    val bytes = before.files
      .map(f => java.nio.file.Files.size(dir.resolve(f))).sum
    w.compactZOrder("t", Seq("k", "ts"), targetBytesPerFile = bytes / 16)
    val after = TxnLog.current(dir).get
    assert(after.files.size >= 8, s"want many files, got ${after.files.size}")
    assert(after.fileStats.size == after.files.size)
    // a ~1/10 × 1/10 box now opens a small fraction of the files: each
    // z-ordered file covers a compact box in (k, ts) space
    val opened = boxFiles(after)
    assert(opened.size <= after.files.size / 2,
      s"z-order failed to localize: ${opened.size} of ${after.files.size}")
    // and rows are exactly the full-scan answer
    val box = w.readBox("t", Seq(("k", "100", "500"), ("ts", "100", "500")))
      .select("payload").collect().map(_.getString(0)).toSet
    val full = w.read("t")
      .where($"k".between(100, 500) && $"ts".between(100, 500))
      .select("payload").collect().map(_.getString(0)).toSet
    assert(box == full && full.nonEmpty)
  }

  test("non-orderable stats column types are refused up front") {
    val w = Warehouse(spark, tmpDir("zm5-wh"))
    val data = (0 until 5).map(i => (i.toLong, s"s$i")).toDF("k", "payload")
    intercept[IllegalArgumentException] {
      w.load("t", data, SinkPolicy.Append, statsCol = Some("payload"))
    }
  }

  test("compaction recomputes stats for the rewritten files") {
    val w = Warehouse(spark, tmpDir("zm3-wh"))
    Seq(0L, 100L, 200L, 300L).foreach(lo =>
      w.load("t", batch(lo, 100).coalesce(1), SinkPolicy.Append,
        statsCol = Some("k")))
    w.compact("t", targetBytesPerFile = 1L << 40) // collapse to one file
    val m = TxnLog.current(Paths.get(w.root, "t")).get
    assert(m.files.size == 1 && m.fileStats.size == 1)
    val Seq((mn, mx)) = m.fileStats(m.files.head)
    assert(mn.toLong == 0L && mx.toLong == 399L)
    assert(w.readBetween("t", "k", "10", "20").count() == 11)
  }

  test("clustered compaction turns interleaved appends into prunable files") {
    val w = Warehouse(spark, tmpDir("zm6-wh"))
    // interleaved appends: every file spans nearly the FULL key range, so
    // zone maps can prune nothing — the shape hash-distributed or
    // arrival-ordered data naturally has
    (0 until 4).foreach { i =>
      val rows = (0 until 100).map(j => (j * 4L + i, s"r$i-$j"))
        .toDF("k", "payload")
      w.load("t", rows.coalesce(1), SinkPolicy.Append, statsCol = Some("k"))
    }
    val dir = Paths.get(w.root, "t")
    val before = TxnLog.current(dir).get
    assert(w.prunedFiles(before, "t", "k", "10", "20").size ==
      before.files.size) // narrow range still opens every file
    // compact with range clustering (clusterBy defaults to the stats col)
    val bytes = before.files
      .map(f => java.nio.file.Files.size(dir.resolve(f))).sum
    w.compact("t", targetBytesPerFile = bytes / 4)
    val after = TxnLog.current(dir).get
    assert(after.files.size >= 2, "need multiple files to show pruning")
    assert(after.fileStats.size == after.files.size)
    // disjoint per-file ranges: the same narrow read now skips most files
    assert(w.prunedFiles(after, "t", "k", "10", "20").size <= 2)
    val pruned = w.readBetween("t", "k", "10", "20")
      .select("k").as[Long].collect().toSet
    val full = w.read("t").where($"k" >= 10 && $"k" <= 20)
      .select("k").as[Long].collect().toSet
    assert(pruned == full && full.size == 11)
  }

  test("set-membership read opens only files whose range holds a probed value") {
    val w = Warehouse(spark, tmpDir("zm5-wh"))
    Seq(0L, 100L, 200L, 300L).foreach(lo =>
      w.load("t", batch(lo, 100).coalesce(1), SinkPolicy.Append,
        statsCol = Some("k")))
    val m = TxnLog.current(Paths.get(w.root, "t")).get

    // a point disjunction spanning files 1 and 3 — a covering RANGE
    // [50, 250] would open file 2 as well; the set form skips it
    assert(w.prunedFilesInSet(m, "t", "k", Seq(50L, 250L)).size == 2)
    assert(w.prunedFiles(m, "t", "k", "50", "250").size == 3)
    val got = w.readInSet("t", "k", Seq(50L, 250L))
      .select("k").as[Long].collect()
    assert(got.length == 200 && got.contains(50L) && got.contains(250L)
      && !got.contains(150L))

    // boundary values prune exactly (min and max are inclusive)
    assert(w.prunedFilesInSet(m, "t", "k", Seq(99L, 100L)).size == 2)
    // values in no file: zero files, an empty frame with the schema
    assert(w.prunedFilesInSet(m, "t", "k", Seq(5000L)).isEmpty)
    val empty = w.readInSet("t", "k", Seq(5000L))
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("k", "payload"))
    // an empty probe set reads nothing rather than everything
    assert(w.readInSet("t", "k", Seq.empty).count() == 0)

    // a stats-less file is never pruned (conservative, as in range reads)
    w.load("t", batch(400, 10).coalesce(1), SinkPolicy.Append) // inherits k
    val w2 = Warehouse(spark, tmpDir("zm5b-wh"))
    w2.load("t", batch(0, 10).coalesce(1), SinkPolicy.Append)
    w2.load("t", batch(100, 10).coalesce(1), SinkPolicy.Append,
      statsCol = Some("k"))
    val m2 = TxnLog.current(Paths.get(w2.root, "t")).get
    val kept = w2.prunedFilesInSet(m2, "t", "k", Seq(105L))
    assert(kept.size == 2, s"stats-less file must survive: $kept")
  }
}
