package graft.operators

import org.apache.spark.sql.DataFrame

/** Block hygiene for iterative localCheckpoint loops (CC, PageRank, BPE):
  * each round materializes a new checkpoint and the previous round's blocks
  * become garbage the ContextCleaner only reclaims after a driver GC — a
  * long-lived session running many iterative queries otherwise accumulates
  * dead blocks in the storage pool until eviction pressure hits the
  * executors. The loops free superseded rounds eagerly through
  * [[dropCheckpoint]].
  */
object Checkpoints {

  /** The cached RDD behind an (eagerly) `localCheckpoint`ed Dataset, if the
    * plan is the LogicalRDD a checkpoint produces; None for any other plan
    * (callers may pass un-checkpointed seeds — the drop then no-ops).
    */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Free a superseded checkpoint's blocks immediately (async unpersist).
    *
    * HAZARD: this frees the ONE AND ONLY copy of a localCheckpoint — a
    * checkpointed plan has no lineage to recompute from, so any later use
    * of the dropped DataFrame fails hard with "Checkpoint block not found"
    * rather than silently recomputing. Call it only when every reference
    * to the DataFrame is provably dead (the loop has materialized its
    * successor AND every derived action — counts, joins against it — has
    * already run); never reorder a use after the drop.
    */
  def dropCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))
}
