package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry for operator-local cached/checkpointed intermediates.
  *
  * Operators return LAZY DataFrames, so they cannot unpersist their own
  * multi-consumer intermediates before the caller has executed the
  * result — the cache would be gone before it was ever read. Instead
  * every operator-local `.cache()` / `localCheckpoint` registers a
  * release thunk here, and the HARNESS frees them at the right moment:
  *
  *  - [[graft.Verify]] calls [[releaseAll]] after each query's output
  *    is written, so a 92-query correctness pass has no net cache
  *    growth (each query's scratch frames live only while that query
  *    runs);
  *  - [[graft.Bench]] deliberately does NOT release between reps: its
  *    documented warm-cache contract (see Bench.scala) measures
  *    steady-state execution, and Spark's plan-canonical CacheManager
  *    re-matches each rep's identical plan to the already-built cache;
  *  - long-lived sessions (notebooks) call [[releaseAll]] whenever they
  *    want scratch memory back — table-level caches
  *    ([[graft.Tables]]) are NOT registered here and survive.
  *
  * Thread-safe; releasing is idempotent (Spark ignores unpersist of an
  * already-unpersisted plan, and RDD release thunks guard themselves).
  */
object ScratchCache {
  private val live =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]

  /** Cache `df` and register it for the next [[releaseAll]]. */
  def cache(df: DataFrame): DataFrame = {
    df.cache()
    live.add(() => df.unpersist(false))
    df
  }

  /** Register an arbitrary release action (e.g. freeing a
    * localCheckpoint's RDD blocks via
    * [[GraphOps.unpersistCheckpoint]]). */
  def defer(release: () => Unit): Unit = live.add(release)

  /** Free every registered scratch frame. Safe to call at any time:
    * anything still needed will lazily recompute (correctness is never
    * cache-dependent, only speed). */
  def releaseAll(): Unit = {
    var r = live.poll()
    while (r != null) {
      try r() catch { case _: Throwable => () }
      r = live.poll()
    }
  }
}
