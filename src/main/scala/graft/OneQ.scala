package graft
import org.apache.spark.sql.SparkSession

/** Re-measure individual catalog queries outside the full bench.
  *
  * Comparability contract with the per-round bench artifact
  * (`BENCH_r*.json` per_query_cs): set `SPARK_GRAFT_CPUS=32` — the
  * driver benches at local[32]; OneQ's default stays 4 for cheap
  * plan-shape checks — and read the `min` line, which is min over
  * `SPARK_GRAFT_ONEQ_PASSES` (default 2) timed passes taken AFTER one
  * untimed warm pass, the same estimator Bench uses (warm pass absorbs
  * janino/codegen compilation and parquet footer reads; min over
  * suite-separated passes sheds transient contention).
  */
object OneQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_ONEQ_PASSES", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", 100000)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the whole run self-reports its host window (stderr bracket line)
    // so a OneQ absolute is never published without throttle context
    Canary.bracketed(spark, "oneq") {
      for (q <- args) {
        // same full-evaluation consumer as Bench (a count() would let
        // Catalyst prune the very projections being timed)
        def once(): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, d).write.format("noop")
            .mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          dt
        }
        val warm = once() // untimed-in-spirit: printed but never kept
        val timed = (1 to passes).map(_ => once())
        println((f"[oneq] $q warm=$warm%.2f " +
          timed.zipWithIndex.map { case (t, i) => f"p${i + 1}=$t%.2f" }
            .mkString(" ") +
          f" min=${timed.min}%.2f s cpus=$cpus"))
      }
    }
    spark.stop()
  }
}
