package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{SinkPolicy, TxnLog, Warehouse}

/** Z-order pruning evidence harness: land `rows` of INDEPENDENT
  * pseudo-random (k, ts) as interleaved appends (the worst case — every
  * file spans both full value ranges, zone maps prune nothing), then
  * `compactZOrder` and report how many files a box query opens before
  * vs after, plus wall times. One JSON line to stdout.
  *
  *   sbt 'runMain graft.ZOrderDemo /tmp/zorder-demo 1000000 32'
  */
object ZOrderDemo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/zorder-demo")
    val rows = args.lift(1).map(_.toInt).getOrElse(1000000)
    val nFiles = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // CosTopK-family aggregations hold 10^3-10^5 groups per task; the
      // 128-row default falls back to sort-based aggregation (and its
      // spill cascade) on every such query - see CosTopK scaladoc
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 1 << 20
    val w = Warehouse(spark, root)
    val nAppends = 8
    (0 until nAppends).foreach { i =>
      // splitmix-style mixes -> k and ts independent and full-range in
      // EVERY append: the provably-unprunable starting layout
      val df = spark.range(i * rows / nAppends, (i + 1) * rows / nAppends)
        .select(
          abs(hash($"id".cast("string")).cast("long") % dim).as("k"),
          abs(hash(concat(lit("ts"), $"id".cast("string"))).cast("long") % dim)
            .as("ts"),
          $"id".as("payload"))
      w.load("t", df.coalesce(1), SinkPolicy.Append,
        statsCols = Seq("k", "ts"))
    }
    val dir = java.nio.file.Paths.get(root, "t")
    val before = TxnLog.current(dir).get
    // a 1/16 x 1/16 box
    val box = Seq(("k", "1000", (1000 + dim / 16).toString),
      ("ts", "2000", (2000 + dim / 16).toString))
    def opened(m: pipeline.Manifest): Int = box
      .map { case (c, lo, hi) => w.prunedFiles(m, "t", c, lo, hi).toSet }
      .reduce(_ intersect _).size
    val openedBefore = opened(before)
    val bytes = before.files
      .map(f => java.nio.file.Files.size(dir.resolve(f))).sum
    val t0 = System.nanoTime()
    w.compactZOrder("t", Seq("k", "ts"),
      targetBytesPerFile = math.max(1, bytes / nFiles))
    val zSec = (System.nanoTime() - t0) / 1e9
    val after = TxnLog.current(dir).get
    val openedAfter = opened(after)
    val t1 = System.nanoTime()
    val n = w.readBox("t", box).count()
    val readSec = (System.nanoTime() - t1) / 1e9
    println(f"""{"rows": $rows, "files_before": ${before.files.size}, """ +
      f""""opened_before": $openedBefore, "files_after": ${after.files.size}, """ +
      f""""opened_after": $openedAfter, "box_rows": $n, """ +
      f""""zorder_sec": $zSec%.1f, "box_read_sec": $readSec%.2f}""")
    spark.stop()
  }
}
