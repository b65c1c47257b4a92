package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Scoped cache lifecycle for multi-stage operators: an operator that
 * persists intermediate stages must not leak them into the session's block
 * manager for its caller to discover. The pattern:
 *
 *   withStages(stage1, stage2) { pin(result) }
 *
 * persists and MATERIALIZES each stage up front (so downstream fan-out —
 * self-join sides, bucket-count filters, verify fetches — reads warm blocks
 * instead of recomputing parents per reference), builds and pins the
 * operator's result, then releases the stages in a finally. The caller owns
 * exactly one cached artifact — the returned result, small by construction
 * (near-dup pairs, curated survivors) — and releases it with
 * `df.unpersist()`. If a pinned result's blocks are ever evicted, lineage
 * recomputes them without the stage caches: the slow path, never a wrong
 * one.
 *
 * At 100 TB this is the difference between a block manager holding one
 * bounded result per live query and one accumulating every query's
 * signature stages for the session lifetime (eviction thrash, then OOM).
 */
object CacheScope {

  /** Persist + materialize `stages` for the duration of `body`, releasing
    * them afterwards. Stages materialize in argument order — pass parents
    * before children so a child's fill pass reads warm parent blocks. */
  def withStages[A](stages: DataFrame*)(body: => A): A = {
    stages.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    try {
      stages.foreach(_.count())
      body
    } finally stages.foreach(_.unpersist(blocking = false))
  }

  /** Persist + materialize an operator result so it outlives the stage
    * scope it was computed in. Caller owns the `unpersist()`. */
  def pin(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }
}
