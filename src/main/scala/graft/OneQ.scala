package graft
import org.apache.spark.sql.SparkSession
object OneQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", 100000)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the whole run self-reports its host window (stderr bracket line)
    // so a OneQ absolute is never published without throttle context
    Canary.bracketed(spark, "oneq") {
      for (q <- args) {
        val t0 = System.nanoTime()
        // same full-evaluation consumer as Bench (count() lets Catalyst
        // prune the very projections being timed)
        SparkEntry.queries(q)(spark, d).write.format("noop")
          .mode("overwrite").save()
        println(f"[oneq] $q t=${(System.nanoTime()-t0)/1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
