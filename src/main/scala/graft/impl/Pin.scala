package graft.impl

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage-cut / pinning policy for iterative and shared intermediates
  * (the materialization the reference's InsertCachingOperators performs with
  * `cache()`, okapi-relational/.../RelationalOptimizer.scala:42-93).
  *
  * Local master (tests, bench, single-JVM): lazy `localCheckpoint` — the
  * truncated plan re-reads executor-local blocks, and the blocks are dropped
  * by the ContextCleaner as soon as the DataFrame becomes unreachable, so a
  * long-lived session running many queries does not accumulate cache-manager
  * entries.
  *
  * Cluster master: `persist(MEMORY_AND_DISK)` — localCheckpoint blocks live
  * ONLY on the executors that computed them, so losing a single executor
  * (dynamic allocation scale-down, spot preemption, OOM kill) makes the data
  * unrecoverable and fails the whole job. persist keeps lineage, so lost
  * blocks are silently recomputed — the right trade at 1000 executors even
  * though entries sit in the cache manager until evicted.
  *
  * Override per session with `spark.graft.pin = localCheckpoint | persist`.
  */
object Pin {
  def apply(df: DataFrame): DataFrame =
    mode(df) match {
      case "persist" => df.persist(StorageLevel.MEMORY_AND_DISK)
      case _         => df.localCheckpoint(eager = false)
    }

  /** Eager variant for per-iteration loop state that the caller unpersists
    * once the next round is materialized. */
  def eager(df: DataFrame): DataFrame =
    mode(df) match {
      case "persist" =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK); p.count(); p
      case _ => df.localCheckpoint(eager = true)
    }

  private def mode(df: DataFrame): String = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.pin").getOrElse {
      if (spark.sparkContext.isLocal) "localCheckpoint" else "persist"
    }
  }
}
