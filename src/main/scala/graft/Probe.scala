package graft

import org.apache.spark.sql.SparkSession

/** One-shot host-window probe: prints the [[Canary]] sample and exits
  * 0 iff the window is clean (mcpu/cpu ≤ the threshold, default 1.2 —
  * the r17 verdict's bar for anchor-grade absolute measurements).
  * Used to CHOOSE the window before launching a long measurement run
  * (`MultiRegion`, `PipeScale`, the drift-family re-measures) instead
  * of discovering the throttle in the run's own brackets afterwards.
  *
  * `lite` as the second arg (or `SPARK_GRAFT_PROBE_LITE=1`) skips the
  * SparkSession and the shuf probe entirely: the gating signal is the
  * pure-JVM mcpu/cpu ratio, and a lite sample costs ~2 s instead of
  * ~15 s of session startup — the difference between polling a window
  * every 30 s and perturbing the very host load being measured
  * (tools/anchor.sh is the poll loop).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val threshold = args.lift(0).map(_.toDouble).getOrElse(1.2)
    val lite = args.lift(1).contains("lite") ||
      sys.env.get("SPARK_GRAFT_PROBE_LITE").contains("1")
    val s: Map[String, Double] =
      if (lite) Canary.sampleLite()
      else {
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
        val spark = SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        Canary.warm(spark)
        val m = Canary.sample(spark)
        spark.stop()
        m
      }
    val ratio = s("mcpu") / s("cpu")
    val entries = s.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""\"$k\":${f"$v%.3f"}""" }.mkString(",")
    println(f"""{"metric":"probe","ratio":$ratio%.3f,"clean":${
      ratio <= threshold},$entries}""")
    sys.exit(if (ratio <= threshold) 0 else 1)
  }
}
