package graft

import org.apache.spark.sql.SparkSession

/** One-shot host-window probe: prints the [[Canary]] sample and exits
  * 0 iff the window is clean (mcpu/cpu ≤ the threshold, default 1.2 —
  * the r17 verdict's bar for anchor-grade absolute measurements).
  * Used to CHOOSE the window before launching a long measurement run
  * (`MultiRegion`, `PipeScale`, the drift-family re-measures) instead
  * of discovering the throttle in the run's own brackets afterwards.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val threshold = args.lift(0).map(_.toDouble).getOrElse(1.2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Canary.warm(spark)
    val s = Canary.sample(spark)
    val ratio = s("mcpu") / s("cpu")
    val entries = s.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""\"$k\":${f"$v%.3f"}""" }.mkString(",")
    println(f"""{"metric":"probe","ratio":$ratio%.3f,"clean":${
      ratio <= threshold},$entries}""")
    spark.stop()
    sys.exit(if (ratio <= threshold) 0 else 1)
  }
}
