package graft.operators

import org.apache.spark.sql.Dataset

/** Caller-owned lifetime for intermediates persisted inside operator
  * builds (e.g. [[Dedup.minhashLsh]]'s per-doc shingle/signature cache,
  * consumed by both self-join sides).
  *
  * Spark offers no "unpersist when the first action on this derived
  * Dataset completes" hook, so a persist buried inside a returned lazy
  * plan would otherwise outlive the query and accumulate storage-memory
  * pressure in a long-lived session. Operators register what they
  * persist; the caller that materializes the returned plan releases it
  * (mirrors the explicit persist ownership of
  * [[graft.queries.PipelineQueries.sessionized]]). `Verify` and `Bench`
  * release after every query.
  */
object CacheRegistry {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Register a persisted intermediate; returns it unchanged. */
  def track[T <: Dataset[_]](ds: T): T = synchronized { frames += ds; ds }

  /** Unpersist (non-blocking) everything registered since the last
    * release. Safe to call while no registered plan is executing. */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist(false))
    frames.clear()
  }
}
