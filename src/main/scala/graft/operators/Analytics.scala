package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical monitoring over aggregated fact frames: robust outlier
  * scoring and two-sample testing. The reference pipeline stops at
  * extents; these are the drift/regression checks a production corpus
  * pipeline runs on every ingest (flag a broken scraper day, compare a
  * data-mix experiment) — part of the large-scale training-data
  * extension.
  */
object Analytics {

  /** Robust per-group outlier scores: `rscore = (x − median) /
    * (1.4826 · MAD)` — the median/MAD z-score, which a single broken
    * day cannot poison the way a mean/stddev score can (the breakdown
    * point argument for monitoring: the anomaly itself drags a mean
    * gate toward accepting it).
    *
    * Input is a per-(group, point) FACT frame — the output of an
    * upstream aggregation (daily counts, hourly volumes), orders of
    * magnitude smaller than the corpus that produced it; the corpus
    * itself is scanned exactly once by that upstream groupBy. Here the
    * exact medians are two aggregate passes over the fact frame
    * (median, then median absolute deviation — MAD needs the median
    * first, it cannot be one pass), each broadcast-joined back: facts
    * shuffle on the group key, the per-group stats rows move to the
    * facts, never the reverse. `mad == 0` (over half the points
    * identical) yields a null score — the caller decides whether
    * "no spread" means clean or suspicious.
    *
    * Both medians are exact interpolated percentiles (R-7, `percentile`
    * here = `quantile_cont` in the oracle): monitoring thresholds sit
    * ON these numbers, and at fact-frame sizes exactness costs nothing.
    *
    * The incoming fact frame is localCheckpointed FIRST: it feeds four
    * plan branches (median input, both joins, MAD input), and without
    * materialization each branch would re-run the upstream corpus
    * aggregation — four 100 TB scans for one monitoring readout. With
    * it, the corpus is scanned exactly once and every branch reads the
    * tiny materialized facts.
    */
  def robustOutlierScores(facts0: DataFrame, groupCol: String,
      valueCol: String, scale: Double = 1.4826): DataFrame = {
    val facts = facts0.localCheckpoint(eager = true)
    val med = facts.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = facts.join(broadcast(med), Seq(groupCol))
    val mad = withMed.groupBy(groupCol)
      .agg(expr(s"percentile(abs($valueCol - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("rscore",
        when(col("mad") === 0, lit(null).cast("double"))
          .otherwise((col(valueCol) - col("med")) /
            (lit(scale) * col("mad"))))
  }

  /** Welch's unequal-variance t statistic and Welch–Satterthwaite
    * degrees of freedom from per-arm sufficient statistics
    * `(n, mean, var_samp)` — pure column math, so the caller computes
    * the six inputs in ONE conditional-aggregate pass over the corpus
    * (count/avg/var_samp FILTERed per arm: map-side partials, no
    * per-arm shuffle, no join) and this just assembles the test.
    * Returns (t, df); t is null when either arm has n < 2 or both
    * variances are 0.
    */
  def welchT(nA: Column, meanA: Column, varA: Column,
      nB: Column, meanB: Column, varB: Column): (Column, Column) = {
    val sa = varA / nA
    val sb = varB / nB
    val t = when(nA < 2 || nB < 2 || (sa + sb) === 0,
        lit(null).cast("double"))
      .otherwise((meanA - meanB) / sqrt(sa + sb))
    val df = when(t.isNull, lit(null).cast("double"))
      .otherwise(pow(sa + sb, 2) /
        (pow(sa, 2) / (nA - 1) + pow(sb, 2) / (nB - 1)))
    (t, df)
  }
}
