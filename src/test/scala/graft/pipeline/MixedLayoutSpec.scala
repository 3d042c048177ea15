package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkTestBase

/** Partition-evolution transition: a table whose manifest lists BOTH
  * flat (pre-partitioning) files and `col=value` files. One basePath
  * read over the mix fails Spark partition discovery ("conflicting
  * directory structures"), so [[Warehouse]] reads each layout
  * separately and aligns by name — this spec pins the promise the
  * readBox scaladoc makes: flat files are never partition-pruned, and
  * the residual predicate filters their rows by the DATA column value
  * they carry. */
class MixedLayoutSpec extends SparkTestBase {
  import spark.implicits._

  /** Land a flat table, then graft a partitioned file into the same
    * manifest by hand (the manifest format permits partition evolution
    * even though the load() policies don't produce it yet). */
  private def mixedTable(): (Warehouse, String) = {
    val w = Warehouse(spark, tmpDir("mixed-wh"))
    // flat era: d is an ordinary DATA column inside the files
    w.load("t", Seq(("a", 1L), ("b", 2L), ("b", 3L)).toDF("d", "v")
      .coalesce(1), SinkPolicy.Append)
    // partitioned era: one d=b file written by partitionBy, moved in
    val staging = Paths.get(tmpDir("mixed-stage"))
    Seq(("b", 10L), ("b", 11L)).toDF("d", "v").coalesce(1)
      .write.mode("overwrite").partitionBy("d").parquet(staging.toString)
    val dir = Paths.get(w.root, "t")
    val part = Files.walk(staging).filter(p =>
      p.toString.endsWith(".parquet")).findFirst().get()
    val rel = "d=b/" + part.getFileName.toString
    Files.createDirectories(dir.resolve("d=b"))
    Files.move(part, dir.resolve(rel), StandardCopyOption.ATOMIC_MOVE)
    TxnLog.commit(dir) { cur =>
      ManifestData(Seq("d"), cur.get.files :+ rel)
    }
    (w, "t")
  }

  test("mixed flat + partitioned snapshot reads; flat d comes from data") {
    val (w, t) = mixedTable()
    val rows = w.read(t).select("d", "v").as[(String, Long)]
      .collect().sorted.toSeq
    assert(rows == Seq(("a", 1L), ("b", 2L), ("b", 3L), ("b", 10L), ("b", 11L)),
      s"got $rows")
  }

  test("partition-identity readBox admits flat files; residual filters their rows") {
    val (w, t) = mixedTable()
    // d=b: the flat file has no d= segment, so pruning must ADMIT it,
    // and the residual predicate keeps only its d='b' rows
    val vb = w.readBox(t, Nil, Seq(("d", "b")))
      .select("v").as[Long].collect().sorted.toSeq
    assert(vb == Seq(2L, 3L, 10L, 11L), s"got $vb")
    // d=a: only the flat file's d='a' row survives; the d=b file is
    // pruned by its partition segment
    val va = w.readBox(t, Nil, Seq(("d", "a")))
      .select("v").as[Long].collect().sorted.toSeq
    assert(va == Seq(1L), s"got $va")
  }
}
