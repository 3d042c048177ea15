package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment — the third join shape of §2.8 (after
  * stream-stream [[StreamJoin]] and batch as-of): an unbounded fact
  * stream LEFT-joined per micro-batch against a bounded dimension.
  *
  * Semantics that matter in deployment:
  *   - LEFT join: facts with no dimension row flow through with nulls
  *     (an inner join would silently drop unknown keys — data loss in an
  *     enrichment stage).
  *   - The static side re-executes every micro-batch, but a path-based
  *     parquet frame PINS its file listing at plan time — an overwritten
  *     snapshot makes the old plan read deleted files. A dimension
  *     refresh therefore requires re-resolving the static side (re-read
  *     the path, or read through a catalog/warehouse version) before the
  *     next drain — which `Trigger.AvailableNow` deployments do
  *     naturally, rebuilding the plan per run.
  *   - Stateless: no watermark needed, state store untouched — this
  *     scales with batch size, not stream history. The dimension is
  *     broadcast when small (hinted here); a 100 TB-scale dimension
  *     would instead be bucketed to co-locate with the stream's shuffle.
  */
object StreamEnrich {

  /** Enrich a stream with dimension attributes by equi-key. */
  def enrich(facts: DataFrame, dim: DataFrame,
             key: String): DataFrame =
    facts.join(broadcast(dim), Seq(key), "left")
}
