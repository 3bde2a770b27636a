package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Host-speed calibration probes for the bench tail.
  *
  * Cross-round per-query comparisons have one confound the suite itself
  * cannot observe: the wall speed of the host window the driver happened
  * to run in (r9→r10 showed a uniform 1.35× shift on queries whose code
  * did not change — almost certainly ambient drift, but the bench
  * carried no instrument to prove it). These three probes are
  * FIXED-WORK, SEED-CONSTANT and PARQUET-FREE, so their only variable
  * across rounds is the host itself:
  *
  *  - `cpu`: a single-threaded 64-bit mix loop (xorshift/multiply —
  *    constant instruction stream, no allocation, no memory traffic
  *    beyond registers) — pure scalar CPU speed;
  *  - `sort`: `java.util.Arrays.sort` over a constant-seed xorshift
  *    array of 2^22 longs — cache/memory-bandwidth-bound single-thread
  *    work, the profile of in-partition sorts;
  *  - `shuf`: a `spark.range` → hash-key groupBy-count through the noop
  *    sink — one real exchange over 2^22 synthetic rows, exercising the
  *    task-scheduling + shuffle-write/read path with zero file IO.
  *
  * Protocol: one untimed warm run (JIT + codegen land outside the
  * samples, same policy as the suite warm-up), then a timed sample
  * BEFORE pass 1 and another AFTER pass 2, min of the two — the
  * canaries bracket the same host window the per-query timings live in.
  * A round-over-round per-query ratio should be read DEFLATED by the
  * matching canary ratio (cpu for compute-bound queries, shuf for
  * shuffle-bound ones); SURVEY §6 records the per-round values.
  */
object Canary {

  val names: Seq[String] = Seq("cpu", "sort", "shuf")

  // JIT blackhole: the probes' results fold in here so dead-code
  // elimination can't hollow out the measured loops
  @volatile private var sink: Long = 0L

  private def time(f: => Long): Double = {
    val t0 = System.nanoTime()
    sink ^= f
    (System.nanoTime() - t0) / 1e9
  }

  private def cpuProbe(): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < (1 << 26)) {
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 29
      i += 1
    }
    x
  }

  private def sortProbe(): Long = {
    val a = new Array[Long](1 << 22)
    var s = 88172645463325252L
    var i = 0
    while (i < a.length) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      a(i) = s
      i += 1
    }
    java.util.Arrays.sort(a)
    a(a.length / 2)
  }

  private def shufProbe(spark: SparkSession): Long = {
    spark.range(0, 1L << 22)
      .select(pmod(hash(col("id")), lit(4096)).as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))
      .write.format("noop").mode("overwrite").save()
    0L
  }

  /** One untimed warm run of every probe. */
  def warm(spark: SparkSession): Unit = {
    sink ^= cpuProbe(); sink ^= sortProbe(); sink ^= shufProbe(spark)
  }

  /** One timed sample of every probe, in declaration order. */
  def sample(spark: SparkSession): Map[String, Double] = Map(
    "cpu" -> time(cpuProbe()),
    "sort" -> time(sortProbe()),
    "shuf" -> time(shufProbe(spark)))
}
