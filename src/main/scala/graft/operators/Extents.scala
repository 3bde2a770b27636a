package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Per-column extents (min / max / 1st / 99th percentile), used by the
  * reference front end to build choropleth scales.
  *
  * Reference semantics (`/root/reference/scripts/extract-extents.js`):
  *  - every cell is kept only if non-empty and numeric
  *    (`extract-extents.js:23-29`);
  *  - per metric column: d3 `min`, `max`, `quantile(0.01)`,
  *    `quantile(0.99)` over the surviving values
  *    (`extract-extents.js:44-50`). d3.quantile is R-7 linear
  *    interpolation — the same estimator as Spark's exact `percentile`
  *    and DuckDB's `quantile_cont`.
  *
  * Spark-first design notes (100 TB scale):
  *  - the reference materializes the whole file in memory
  *    (`extract-extents.js:14,34`); here the wide table is unpivoted with
  *    `stack` into (metric, value) pairs and aggregated in ONE shuffle
  *    keyed by metric — constant memory per partition, spills externally.
  *  - exact `percentile` is used for oracle parity. At true 100 TB scale,
  *    swap `percentileApprox` in via `approximate = true` (documented
  *    tolerance; the choropleth scale use-case only needs ~1% accuracy).
  */
object Extents {

  /** P7: numeric-or-null cell filter (`extract-extents.js:23-29`).
    * `try_cast` (not `cast`) so non-numeric junk becomes null instead of
    * an ANSI cast error — the reference drops such cells silently.
    */
  def numericOrNull(c: Column): Column = {
    val d = c.try_cast(DoubleType)
    when(d.isNotNull && !isnan(d), d)
  }

  /** A2+G1-G4: unpivot `metricCols` and compute per-metric extents.
    * Output: one row per metric — (id, vmin, vmax, q1, q99), ordered by id.
    */
  def extents(df: DataFrame, metricCols: Seq[String],
              lo: Double = 0.01, hi: Double = 0.99,
              approximate: Boolean = false): DataFrame = {
    val stackExpr = explodeToLong(metricCols)
    val long = df.select(stackExpr: _*)
      .select(col("id"), numericOrNull(col("value")).as("value"))
      .filter(col("value").isNotNull)
    val (q1, q99) =
      if (approximate)
        (percentile_approx(col("value"), lit(lo), lit(10000)),
         percentile_approx(col("value"), lit(hi), lit(10000)))
      else
        (percentile(col("value"), lit(lo)), percentile(col("value"), lit(hi)))
    long.groupBy("id")
      .agg(min("value").as("vmin"), max("value").as("vmax"),
           q1.as("q1"), q99.as("q99"))
      .orderBy("id")
  }

  /** Grouped extents: per (group, metric) min/max/q1/q99 — the
    * reference's per-region extents files (`build.sh:69,84-88` — one
    * extents CSV per region table) generalized to a grouping column in
    * one shuffle.
    *
    * Memory ceiling: exact `percentile` buffers EVERY value of a
    * (group, metric) cell in one aggregation buffer — at 100 TB a hot
    * group OOMs the executor. Pass `approximate = true` to switch to
    * `percentile_approx` (KLL-style sketch, constant memory, ~1e-4
    * relative accuracy at 10k buckets — ample for choropleth scales).
    * The exact path stays the default because it is the oracle-parity
    * (R-7 / d3.quantile) estimator.
    */
  def extentsBy(df: DataFrame, groupCol: String, metricCols: Seq[String],
                lo: Double = 0.01, hi: Double = 0.99,
                approximate: Boolean = false): DataFrame = {
    val stackExpr = explodeToLong(metricCols)
    val long = df.select(col(groupCol) +: stackExpr: _*)
      .select(col(groupCol), col("id"), numericOrNull(col("value")).as("value"))
      .filter(col("value").isNotNull)
    val (q1, q99) =
      if (approximate)
        (percentile_approx(col("value"), lit(lo), lit(10000)),
         percentile_approx(col("value"), lit(hi), lit(10000)))
      else
        (percentile(col("value"), lit(lo)), percentile(col("value"), lit(hi)))
    long.groupBy(groupCol, "id")
      .agg(min("value").as("vmin"), max("value").as("vmax"),
        q1.as("q1"), q99.as("q99"))
      .orderBy(groupCol, "id")
  }

  /** A2: wide→long unpivot via `stack` (one pass, no per-column scans). */
  private def explodeToLong(metricCols: Seq[String]): Seq[Column] = {
    val pairs = metricCols
      .map(c => s"'$c', try_cast(`$c` as double)")
      .mkString(", ")
    Seq(expr(s"stack(${metricCols.size}, $pairs) as (id, value)"))
  }
}
