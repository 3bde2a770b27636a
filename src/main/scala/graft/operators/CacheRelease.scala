package graft.operators

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Deterministic release of operator-internal `cache()` barriers.
  *
  * Several operators persist an intermediate that their returned plan
  * references more than once (the extents histogram, the LSH shingle
  * arrays) — without the barrier Catalyst re-executes the expensive
  * upstream per reference. The barrier must ALSO be released, or a
  * long-lived session accumulates one orphaned cache entry per call.
  * This helper releases the cached frames as soon as the first action
  * consuming `out` (or any plan built on top of it) completes: the
  * returned plan stays fully lazy (plan audits see the real operator
  * tree, not a cache scan), and nothing leaks.
  *
  * The listener is SELF-EXPIRING: if [[MaxUnmatchedExecutions]] other
  * queries complete without the target ever running (an explain-only /
  * plan-audit call, an abandoned DataFrame), it releases and
  * unregisters anyway — otherwise each abandoned call would leave a
  * live listener walking `sameResult` over every subsequent query's
  * analyzed plan forever. Expiring is safe in both states: an
  * un-executed persist() materialized nothing, and a later execution
  * of the plan merely recomputes.
  *
  * Accepted caveats (all correct-but-recompute, never wrong results):
  *  - two concurrent calls over sameResult inputs share cache entries,
  *    so the first completed action releases them for both;
  *  - an expiring stale listener unpersists the shared entry even if a
  *    LATER identical call is mid-action on it (the alternative —
  *    expiry without unpersist — permanently leaks the CacheManager
  *    entry, which any later identical plan would silently materialize
  *    and retain forever: the worse failure mode);
  *  - release fires after the FIRST action, so a caller running
  *    multiple actions over the returned frame recomputes from the
  *    second action on — multi-action consumers should persist the
  *    (small) RESULT themselves.
  */
private[graft] object CacheRelease {

  /** Expiry is (count AND age): a busy shared session completes many
    * UNRELATED queries (other operators' internal actions, concurrent
    * callers) between a registration and its first consuming action, so
    * a small count alone can expire the barrier before the caller ever
    * runs — silently reintroducing the N× recompute the cache exists to
    * prevent (observed with the previous count-only threshold of 64).
    * Requiring a minimum AGE as well means a burst of unrelated
    * completions can never expire a just-registered listener; the count
    * floor keeps an idle session (few queries, long gaps) from holding
    * the cache forever. Both are generous: expiry is a leak backstop
    * for abandoned plans, not a lifecycle mechanism.
    */
  private[operators] val MaxUnmatchedExecutions = 4096
  private[operators] val MinLingerNanos = 10L * 60 * 1000 * 1000 * 1000

  def afterUse(cached: Seq[DataFrame], out: DataFrame): DataFrame = {
    val spark = out.sparkSession
    val target = out.queryExecution.analyzed
    val registeredAt = System.nanoTime()
    val listener = new QueryExecutionListener {
      private val released = new AtomicBoolean(false)
      private val unmatched = new AtomicInteger(0)
      private def maybeRelease(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.exists(_.sameResult(target))
          catch { case _: Exception => false }
        val expired = !hit &&
          unmatched.incrementAndGet() >= MaxUnmatchedExecutions &&
          System.nanoTime() - registeredAt >= MinLingerNanos
        if ((hit || expired) && released.compareAndSet(false, true)) {
          cached.foreach(_.unpersist(blocking = false))
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    out
  }
}
