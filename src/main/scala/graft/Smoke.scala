package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: fresh session (no special confs), run
  * `SparkEntry.entry`, require rows > 0. Run with
  * `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", 100000)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(3, truncate = false)
    println(s"[smoke] entry rows=$n cols=${df.columns.length}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
