package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage barriers for multi-read and fixpoint frames.
  *
  * Spark expression trees are not DAG-shared, and lineage grows per
  * iteration, so operators that read one frame many times (inverted
  * posting lists, label-propagation rounds, funnel stage chains)
  * materialize it once behind a checkpoint. [[cut]] picks the strongest
  * barrier the session offers:
  *
  *  - a checkpoint directory is set (`sc.setCheckpointDir`) → reliable
  *    `checkpoint()`: blocks land in the executor-independent checkpoint
  *    store, so on a real cluster a lost executor mid-job recomputes
  *    nothing — the durability a multi-hour 100 TB dedup needs (with
  *    `localCheckpoint` the truncated lineage cannot rebuild that
  *    executor's blocks and the job dies);
  *  - otherwise `localCheckpoint()`: executor-local blocks, no shared-
  *    store I/O — the fast path for local / interactive sessions.
  *
  * Both modes are EAGER — the frame materializes at the call — and
  * result-identical (DedupSpec pins equality of the two modes on the
  * clustering fixpoint).
  */
object Barrier {

  /** Materialize `df` and cut its lineage (see object doc for the
    * reliable-vs-local mode choice). */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
