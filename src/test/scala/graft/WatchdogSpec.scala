package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bench's per-query deadline ([[Watchdog]]): a deliberately-hung
  * query yields a watchdog reason well before its natural runtime and
  * the suite continues — the r17 verdict's "Done =" for the bench
  * watchdog ask.
  */
class WatchdogSpec extends AnyFunSuite with SharedSpark {

  test("a hung query is cancelled at the deadline, not at its natural end") {
    // 8 tasks that each sleep 60 s — an uncancelled run needs >120 s on
    // the 4-core test session; the 2 s deadline must cut it to seconds
    val slow = udf((x: Long) => { Thread.sleep(60000L); x })
    val df = spark.range(8).repartition(8).select(slow(col("id")).as("v"))
    val t0 = System.nanoTime()
    val r = Watchdog.runWatched(spark, "wd-hang", 2.0) {
      df.write.format("noop").mode("overwrite").save()
    }
    val dt = (System.nanoTime() - t0) / 1e9
    assert(r.exists(_.startsWith("watchdog 2")), s"got $r")
    assert(dt < 30, f"cancel took $dt%.1f s — deadline did not bite")
  }

  test("the suite survives: a healthy query right after a cancelled one") {
    val r = Watchdog.runWatched(spark, "wd-ok", 120.0) {
      spark.range(10).write.format("noop").mode("overwrite").save()
    }
    assert(r.isEmpty)
  }

  test("a failing query reports its own exception, not the watchdog") {
    val r = Watchdog.runWatched(spark, "wd-fail", 120.0) {
      throw new RuntimeException("boom")
    }
    assert(r.contains("boom"))
  }
}
