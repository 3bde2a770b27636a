package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of registered queries (the same
  * session shape as [[OneQ]]) — `runMain graft.Explain q121_pagerank`.
  * Iteration aid for the plan-shape work PlanAuditSpec pins.
  *
  * `SPARK_GRAFT_EXPLAIN_MODE=formatted` switches to
  * `explain("formatted")` output (numbered operators + per-operator
  * details: PushedFilters, ReadSchema, join build side) — the mode the
  * r19 plan-evidence files under plans/ are captured in.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", 100000)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "executed")
    for (q <- args) {
      println(s"==== $q ====")
      val qe = SparkEntry.queries(q)(spark, d).queryExecution
      if (mode == "formatted") println(qe.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      else println(qe.executedPlan)
    }
    spark.stop()
  }
}
