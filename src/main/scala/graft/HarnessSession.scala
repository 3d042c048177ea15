package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession builder for the scale-harness mains (GateScale,
  * TextGateScale, …) — one place for the repo's measurement protocol
  * (32 shuffle partitions, the ObjectHashAggregate fallback threshold,
  * UTC, nanos-as-long) plus the two env dials the evidence runs need:
  *
  *   - `SPARK_GRAFT_MASTER` — e.g. `local-cluster[2,4,2048]` for the
  *     process-separated executor sweeps (round-8 discipline: custom
  *     expressions, stage tables, and gate state must cross a real JVM
  *     boundary at least once per round);
  *   - `SPARK_GRAFT_EXTRA_CONF` — `k=v;k=v`, used by the local-cluster
  *     runs to ship the packaged jar (`spark.jars=…`) to executors.
  */
object HarnessSession {
  def build(defaultMaster: String = "local[32]"): SparkSession = {
    val b0 = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", defaultMaster))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val b = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .foldLeft(b0) { (acc, kv) =>
        kv.split("=", 2) match {
          case Array(k, v) => acc.config(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_EXTRA_CONF entry is not key=value: '$kv'")
        }
      }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
