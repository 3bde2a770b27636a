package graft

import org.apache.spark.sql.SparkSession

/** Per-query deadline for the bench harness.
  *
  * r17's killed bench could not even say whether the timeout was
  * protocol length or a single hung plan — `run(name)` could block
  * forever with nothing in the artifact pointing at the culprit. Every
  * bench query now executes under a job-group cancel deadline: when
  * the body is still running at `timeoutS`, its Spark job group is
  * cancelled (`interruptOnCancel = true`, so straggler tasks get
  * thread interrupts too), the query reports as FAILED with a
  * watchdog reason, and the suite continues.
  *
  * Scope: this bounds time spent INSIDE Spark jobs — the right bound
  * for this engine, where every registered query is a DataFrame
  * program whose wall cost is its jobs. Driver-side infinite loops are
  * out of scope (none exist in the catalog; plans are built lazily in
  * milliseconds).
  */
object Watchdog {

  // daemon timer: must never keep the bench JVM alive
  private lazy val timer = new java.util.Timer("graft-watchdog", true)

  /** Run `body` under a `timeoutS` job-group deadline.
    *
    * @return None on success; Some(reason) when the body failed —
    *         "watchdog &lt;N&gt;s" if the deadline fired, the exception
    *         message otherwise. Never throws: the caller's suite loop
    *         must survive any single query.
    */
  def runWatched(spark: SparkSession, group: String, timeoutS: Double)
                (body: => Unit): Option[String] = {
    val sc = spark.sparkContext
    sc.setJobGroup(group, group, interruptOnCancel = true)
    @volatile var timedOut = false
    val deadline = new java.util.TimerTask {
      def run(): Unit = { timedOut = true; sc.cancelJobGroup(group) }
    }
    timer.schedule(deadline, math.max(1L, (timeoutS * 1000).toLong))
    try { body; None }
    catch { case e: Throwable =>
      Some(if (timedOut) s"watchdog ${timeoutS.toInt}s"
        else String.valueOf(e.getMessage))
    } finally {
      deadline.cancel()
      sc.clearJobGroup()
    }
  }
}
