package graft.ml

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Deterministic release for the caches the ml operators pin internally
  * (LSH band tables, simhash/hyperplane signatures, k-means codebooks,
  * the connected-components label checkpoint).
  *
  * Those operators return LAZY frames whose plans depend on an internal
  * `persist()` — both legs of a candidate self-join read the same
  * signature table, so the cache is what keeps the expensive pass from
  * running twice inside ONE action. The operator never sees the moment
  * the caller materializes the result, so it cannot unpersist without
  * breaking laziness; the blocks are MEMORY_AND_DISK and LRU-evictable,
  * so leaving them is SAFE — but a long session running many passes can
  * reclaim executor memory deterministically by calling `releaseAll()`
  * once a pass's output is written.
  *
  * Contract: call `releaseAll()` only AFTER consuming (write/collect)
  * the frames a pass returned. persist()-backed results stay usable
  * afterwards (they recompute on next use); CHECKPOINT-backed results
  * (`Dedup.components` labels) do not — `localCheckpoint` truncated
  * their lineage, so their released blocks cannot be rebuilt.
  */
object CacheLifecycle {
  private val pins =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Persist (if not already) and register `df` for `releaseAll`. */
  def pin[T](df: Dataset[T]): Dataset[T] = {
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    pins.add(() => df.unpersist(blocking = false))
    df
  }

  /** Register an eagerly-`localCheckpoint`ed frame. `Dataset.unpersist()`
    * is a no-op for checkpoint blocks (they are not in the cache
    * manager): the persisted RDD sits inside the checkpointed plan's
    * LogicalRDD and must be unpersisted directly, or every round's
    * blocks survive until RDD GC. Releasing makes the frame UNUSABLE
    * (truncated lineage cannot recompute).
    */
  def pinCheckpointed[T](df: Dataset[T]): Dataset[T] = {
    pins.add(() => releaseCheckpoint(df))
    df
  }

  /** Immediate direct release of a checkpointed frame's blocks (used by
    * the components loop for rounds that are definitely dead).
    */
  private[ml] def releaseCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Drop every cache registered since the last call; returns how many
    * pins were released. Idempotent per pin (unpersist on an already-
    * evicted frame is a no-op).
    */
  def releaseAll(): Int = {
    var n = 0
    var f = pins.poll()
    while (f != null) { f(); n += 1; f = pins.poll() }
    n
  }
}
