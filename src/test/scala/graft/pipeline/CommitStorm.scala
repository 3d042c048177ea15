package graft.pipeline

import java.nio.file.Paths

/** Child-process half of [[CrossProcessCommitSpec]]: hammer `n` append
  * commits (one synthetic file each) into the table dir, racing whatever
  * the parent JVM is committing at the same time. Exits 0 only if every
  * commit eventually won a version. No Spark involved — [[TxnLog]] is
  * pure java.nio, which is the point: the race is on the filesystem's
  * link(2)/EEXIST semantics, not on anything in-process. */
object CommitStorm {
  def main(args: Array[String]): Unit = {
    val Array(dir, tag, nStr) = args
    val table = Paths.get(dir)
    val n = nStr.toInt
    for (i <- 1 to n) {
      TxnLog.commit(table) { cur =>
        val files = cur.map(_.files).getOrElse(Seq.empty)
        ManifestData(Seq.empty, files :+ f"data/$tag-$i%04d.parquet")
      }
      ()
    }
  }
}
