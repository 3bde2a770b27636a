package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Writes a `factor`× key-shifted union of an existing SF dir's tables
  * to `outDir` — the local stand-in for a larger scale factor
  * (TESTDATA.md ships nothing above sf0.1), used for the SURVEY §6
  * linear-scaling spot-checks of the structurally heavy queries.
  * Key shifting (not plain replication) matters: derived geometry and
  * hash keys are functions of the key, so shifted copies produce NEW
  * features/groups instead of `factor` exact duplicates of each row.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> <factor> [tables...]
  * (default tables: customer, lineitem — the q48/q44 inputs)
  *
  * A table spec may carry the `:const` suffix (`events:const`): the
  * ENTITY key shifts alongside the row key, so entity count scales
  * with the data and per-entity density stays CONSTANT — the
  * realistic growth regime (more users, not denser users). The bare
  * `events` spec keeps the r13 density-multiplied worst case (same
  * users, `factor`× the events each) for adversarial window-family
  * measurements.
  */
object ScaleUp {
  private val keyCols = Map(
    "customer" -> "c_custkey", "lineitem" -> "l_orderkey",
    "orders" -> "o_orderkey", "documents" -> "doc_id",
    "embeddings" -> "vec_id", "events" -> "event_id")

  /** Entity keys shifted only under `:const` — per-entity density
    * stays flat as the table grows.
    */
  private val entityCols = Map("events" -> Seq("user_id"))

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS, rest @ _*) = args
    val factor = factorS.toInt
    val tables = if (rest.nonEmpty) rest else Seq("customer", "lineitem")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // older testdata generations store events.ts as INT64
      // TIMESTAMP(NANOS): copy through as raw longs in that case
      // (Tables.events adapts to whichever type it reads back)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (spec <- tables) {
      val (t, const) = spec.split(':') match {
        case Array(n, "const") => (n, true)
        case Array(n) => (n, false)
        case _ => sys.error(s"bad table spec: $spec")
      }
      if (const)
        require(entityCols.contains(t),
          s"':const' has no entity-key mapping for '$t' — it would " +
            "silently behave like the plain spec; add the table to " +
            "entityCols or drop the suffix")
      val df = spark.read.parquet(s"$src/$t.parquet")
      val shiftCols = keyCols.get(t).toSeq ++
        (if (const) entityCols.getOrElse(t, Nil) else Nil)
      val shifted = (0 until factor).map { i =>
        shiftCols.foldLeft(df)((acc, k) =>
          acc.withColumn(k, col(k) + lit(i * 100000000L)))
      }.reduce(_ unionByName _)
      shifted.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t x$factor${if (const) " (const-density)" else ""}" +
        s" -> $out/$t.parquet")
    }
    spark.stop()
  }
}
