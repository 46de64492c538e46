package org.apache.spark

/** Test-only accessor for `SparkContext.checkpointDir` (a `private[spark]`
  * var): specs that exercise [[graft.ops.Barrier]]'s reliable-checkpoint
  * mode must RESTORE the session-global checkpoint directory afterwards —
  * there is no public unset, and leaking it would silently flip every
  * sibling suite's barriers to the reliable path. */
object GraftCheckpointBridge {
  def get(sc: SparkContext): Option[String] = sc.checkpointDir
  def set(sc: SparkContext, dir: Option[String]): Unit = sc.checkpointDir = dir
}
