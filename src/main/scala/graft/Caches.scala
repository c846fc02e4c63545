package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-neutral registry for frames persisted inside operators, so
  * entry points that own the session lifecycle (Verify, Bench, a service
  * loop) can release every operator-cached block after materializing a
  * query — without knowing which module cached what.
  *
  * Operators persist when their plan references the same expensive
  * subplan from multiple branches (Spark has no cross-branch subplan
  * reuse, so without the persist the subplan executes once per branch).
  * The cache pays off only within the single action that materializes
  * the query; in a long-lived session the blocks would otherwise linger
  * until LRU eviction.
  */
object Caches {

  private val persistedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private val trackedBroadcasts =
    new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.broadcast.Broadcast[_]]()

  /** Thread-scoped registries for the parallel Verify sweep: while a
    * [[scoped]] block is open on the current thread, registrations
    * land here and the block's close releases ONLY this thread's
    * frames — a concurrent worker's global clear() would otherwise
    * strip another query's persisted subplan mid-job (correctness-safe
    * but a recompute storm: q76's fp projection is 50× without its
    * persist). Registrations from threads with no open scope (e.g.
    * foreachBatch micro-batch threads inside a streaming replay) fall
    * through to the global queues, released by the entry point's final
    * clear() — the pre-r20 lifecycle.
    */
  private val localFrames =
    new ThreadLocal[java.util.ArrayDeque[DataFrame]]()
  private val localBcasts =
    new ThreadLocal[java.util.ArrayDeque[
      org.apache.spark.broadcast.Broadcast[_]]]()

  /** Run `body` with this thread's registrations scoped; release them
    * on exit. Nesting is not supported (the outer scope's deque is
    * simply reused). Single-threaded entry points keep calling
    * [[clear]] and never open a scope — behavior unchanged.
    */
  def scoped[A](body: => A): A = {
    val hadFrames = localFrames.get() != null
    if (!hadFrames) {
      localFrames.set(new java.util.ArrayDeque[DataFrame]())
      localBcasts.set(new java.util.ArrayDeque[
        org.apache.spark.broadcast.Broadcast[_]]())
    }
    try body
    finally if (!hadFrames) {
      val fs = localFrames.get(); val bs = localBcasts.get()
      localFrames.remove(); localBcasts.remove()
      fs.forEach(_.unpersist(blocking = false))
      bs.forEach(_.unpersist(blocking = false))
    }
  }

  /** Register a SparkContext broadcast (bloom filter, CMS, …) under the
    * [[clear]] lifecycle: executor copies are released at the next
    * clear, and dropping the registry reference lets the ContextCleaner
    * reclaim the driver side. `unpersist` (not `destroy`) so a plan
    * re-executed after clear just re-ships the value — same
    * recompute-on-reuse posture as the persisted frames. Without this,
    * repeated invocations (bench min-of-3, probes, suites sharing one
    * session) accumulate broadcast state.
    */
  private[graft] def trackBroadcast[T](
      b: org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] = {
    val local = localBcasts.get()
    if (local != null) local.add(b) else trackedBroadcasts.add(b)
    b
  }

  /** Persist a frame under the [[clear]] lifecycle. MEMORY_AND_DISK: at
    * corpus scale the blocks spill instead of OOMing, and if executors
    * are storage-tight they just recompute (the pre-cache behavior).
    */
  private[graft] def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    val local = localFrames.get()
    if (local != null) local.add(p) else persistedFrames.add(p)
    p
  }

  /** Register an already-materialized frame (e.g. a localCheckpoint)
    * for [[clear]] WITHOUT re-persisting it — persisting on top of a
    * checkpoint would stack a second storage copy. Checkpoint blocks
    * are not covered by `Dataset.unpersist` (they live outside the
    * CacheManager); for them the registry's job is to hold the LAST
    * long-lived reference, so [[clear]]'s dequeue makes the RDD
    * unreachable and the ContextCleaner reclaims the blocks.
    */
  private[graft] def trackOnly(df: DataFrame): DataFrame = {
    val local = localFrames.get()
    if (local != null) local.add(df) else persistedFrames.add(df)
    df
  }

  /** Release every frame registered since the last call: persisted
    * frames are unpersisted immediately; checkpointed frames are
    * dereferenced for the ContextCleaner (see [[trackOnly]]). Safe to
    * call while downstream frames are still referenced — they recompute.
    *
    * SCOPE-AWARE (r20 review fix): when the calling thread has a
    * [[scoped]] block open, clear() drains THAT thread's registry, not
    * the global one — operators with internal clear() calls between
    * phases (RankIndex bootstrap/refresh, ReplayParity per-batch)
    * keep freeing their own checkpoint chains inside a parallel-Verify
    * worker, and never strip a concurrent worker's (or a streaming
    * batch thread's) globally-registered frames mid-job. Callers with
    * no open scope (every single-threaded entry point) drain the
    * global queues exactly as before.
    */
  def clear(): Unit = {
    val lf = localFrames.get()
    if (lf != null) {
      val lb = localBcasts.get()
      while (!lf.isEmpty) lf.poll().unpersist(blocking = false)
      while (!lb.isEmpty) lb.poll().unpersist(blocking = false)
    } else {
      var d = persistedFrames.poll()
      while (d != null) { d.unpersist(blocking = false); d = persistedFrames.poll() }
      var b = trackedBroadcasts.poll()
      while (b != null) { b.unpersist(blocking = false); b = trackedBroadcasts.poll() }
    }
  }
}
