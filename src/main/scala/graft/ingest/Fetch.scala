package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Pluggable page/API fetcher — the engine seam for the reference's
  * `requests.get` calls (`functions/utils/datasources.py:66-73,224`).
  * Serializable so it ships into executor tasks; tests inject fakes, a
  * deployment injects an HTTP client. Returns Left(error) instead of
  * throwing — the skip-and-continue ladder is data, not control flow. */
trait Fetcher extends Serializable {
  def get(url: String): Either[String, String]
}

/** One fetch outcome row. */
final case class Fetched(key: String, url: String, body: String,
                         error: String, attempts: Int)

/** Partition-parallel fetch over a keys DataFrame — the Spark shape of
  * the reference's driver-side fetch loops (S5 `datasources.py:218-261`,
  * S8 `:494-545`): each partition walks its keys sequentially (natural
  * per-partition rate limiting), retries once after a backoff on failure
  * (`:236-245` — 30 s there, injectable here), and records failures as
  * rows instead of aborting the batch (`:226-235` skip-and-continue).
  *
  * At 100 TB-scale ingestion the parallelism knob is the keys frame's
  * partition count (`repartition(n)` upstream = n concurrent fetchers);
  * results are ordinary rows, so everything downstream is declarative.
  */
object Fetch {

  def fetchPartitioned(keys: DataFrame, keyCol: String, urlCol: String,
                       fetcher: Fetcher, retries: Int = 1,
                       backoffMs: Long = 0L): Dataset[Fetched] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.select(keyCol, urlCol).as[(String, String)].mapPartitions { it =>
      it.map { case (key, url) =>
        var attempt = 0
        var out: Either[String, String] = Left("not attempted")
        while (attempt <= retries &&
          (attempt == 0 || out.isLeft)) {
          if (attempt > 0 && backoffMs > 0) Thread.sleep(backoffMs)
          out = fetcher.get(url)
          attempt += 1
        }
        out match {
          case Right(body) => Fetched(key, url, body, null, attempt)
          case Left(err)   => Fetched(key, url, null, err, attempt)
        }
      }
    }
  }

  /** Successful bodies only — failures stay queryable for monitoring. */
  def ok(fetched: Dataset[Fetched]): DataFrame =
    fetched.filter(_.error == null).toDF()
}
