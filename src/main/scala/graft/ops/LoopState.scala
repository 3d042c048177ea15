package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Round-state pinning for the iterative operators ([[Components]],
  * [[PageRank]]) — every loop round ends by pinning its O(V) state frame
  * so the logical plan restarts from the pinned blocks instead of
  * growing with the round count.
  *
  * RESILIENCE CONTRACT. The default pin is `localCheckpoint`: lineage is
  * TRUNCATED and the blocks live only on the executors that computed
  * them — fast (no replication, no filesystem round-trip), but ANY
  * executor loss mid-loop makes the loop state unrecoverable (truncated
  * lineage means Spark cannot recompute the lost blocks) and the job
  * fails. That is the right trade in `local[N]` and on short loops; on a
  * 100 TB cluster where executor churn is routine, set
  * [[LoopState.CheckpointDirConf]] (`spark.graft.checkpointDir`) to a
  * fault-tolerant path (HDFS/object store) and every pin becomes a
  * RELIABLE `checkpoint()`: round state is written to that directory,
  * and losing an executor costs re-reading checkpoint files, not the
  * job. Same eager semantics in both modes (the pin IS the round's
  * action); results are bit-identical (CheckpointModeSpec runs both
  * loops in both modes on the same input and compares).
  *
  * Reliable-mode cost note: Spark writes reliable checkpoint files by
  * RE-EXECUTING the checkpointed RDD at the end of the materializing
  * job, so `pin` persists the frame (at the caller's pool-adaptive
  * level, [[StageLevels.pinned]]) before checkpointing — the write then
  * reads cached blocks instead of recomputing the round's joins — and
  * unpersists once the files exist. Net: one extra cache scan per round,
  * never a second round computation.
  */
object LoopState {

  /** When set, loop pins write reliable checkpoints here (HDFS/object
    * store on a cluster); when unset (default), pins are
    * `localCheckpoint` — see the resilience contract above. */
  val CheckpointDirConf = "spark.graft.checkpointDir"

  /** Eagerly pin `ds` as this round's loop state: reliable
    * `checkpoint()` when `spark.graft.checkpointDir` is set, else
    * `localCheckpoint` at `lvl`.
    *
    * The checkpoint dir lives on the (process-global) `SparkContext`, so
    * it is LAST-WRITER-WINS across every session in the JVM: two
    * sessions pinning with different `spark.graft.checkpointDir` values
    * will repoint each other's context dir between rounds. That is safe
    * for the loops here (each `checkpoint()` call resolves the dir at
    * write time and keeps its own file paths) but means checkpoint files
    * from interleaved sessions land under whichever dir was set last.
    * The dir is re-checked against the LIVE context on every pin — not a
    * JVM-cached value — so a restarted `SparkContext` (fresh context,
    * same conf) is re-pointed instead of failing with "Checkpoint
    * directory has not been set". */
  def pin[T](ds: Dataset[T], lvl: StorageLevel): Dataset[T] = {
    val s = ds.sparkSession
    val dir = s.conf.get(CheckpointDirConf, "")
    if (dir.isEmpty) ds.localCheckpoint(true, lvl)
    else {
      LoopState.synchronized {
        // setCheckpointDir stores <dir>/<uuid>; match on the parent path.
        val want = new Path(dir).toUri.getPath
        val applied = s.sparkContext.getCheckpointDir
          .map(p => new Path(p).getParent.toUri.getPath)
        if (!applied.contains(want)) s.sparkContext.setCheckpointDir(dir)
      }
      val cached = ds.persist(lvl)
      val pinned = cached.checkpoint(eager = true)
      cached.unpersist()
      pinned
    }
  }
}
