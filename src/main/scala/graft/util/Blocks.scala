package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage-block bookkeeping for eagerly-checkpointed intermediates.
  *
  * `Dataset.unpersist` is a cache-manager lookup: it frees frames that were
  * `persist()`ed, but silently NO-OPS on a `localCheckpoint`ed frame — the
  * checkpoint plan is a [[LogicalRDD]] leaf that is never registered with
  * the cache manager, so the blocks stay pinned until the RDD object is
  * garbage-collected (if ever: driver-side references — memo tables, loop
  * vars captured in plans — keep them alive). Every operator that
  * "unpersists" a checkpointed intermediate must free the leaf RDD itself. */
object Blocks {

  /** Free `df`'s pinned blocks whether it was persisted or checkpointed.
    * A localCheckpoint's blocks ARE its data (lineage is truncated at
    * materialization), so after this call `df` — and any plan built on it —
    * is INVALID, not lazily recomputable. Only call on frames you own whose
    * consumers are done. */
  def freeCheckpoint(df: DataFrame): Unit = {
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
    df.unpersist()
  }
}
