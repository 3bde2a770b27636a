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

  private[operators] val MaxUnmatchedExecutions = 64

  def afterUse(cached: Seq[DataFrame], out: DataFrame): DataFrame = {
    val spark = out.sparkSession
    val target = out.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private val released = new AtomicBoolean(false)
      private val unmatched = new AtomicInteger(0)
      private def maybeRelease(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.exists(_.sameResult(target))
          catch { case _: Exception => false }
        val expired = !hit &&
          unmatched.incrementAndGet() >= MaxUnmatchedExecutions
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
