package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WeightedPercentileApprox

/** The weighted GK sketch must agree with Spark's own
  * `percentile_approx` run over the weight-EXPANDED rows — same
  * summaries machinery, same ε contract — and obey the skip rules
  * (null / NaN values, non-positive weights).
  */
class WeightedPercentileApproxSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val ps = Seq(0.01, 0.5, 0.99)

  test("weighted over histogram ≈ percentile_approx over expanded rows") {
    // skewed weights: value v appears (v % 37 + 1) times
    val hist = (1 to 5000)
      .map(v => (v.toDouble, (v % 37 + 1).toLong)).toDF("v", "w")
    val expanded = hist
      .select(explode(expr("sequence(1, w)")).as("i"), col("v"))
    val got = hist.agg(
        WeightedPercentileApprox.wpa(col("v"), col("w"), ps, 10000).as("q"))
      .select(explode(col("q"))).as[Double].collect()
    val want = expanded.agg(
        percentile_approx(col("v"), array(ps.map(lit): _*), lit(10000))
          .as("q"))
      .select(explode(col("q"))).as[Double].collect()
    val n = (1 to 5000).map(v => v % 37 + 1).sum
    got.zip(want).zip(ps).foreach { case ((g, w), p) =>
      // both are ε-rank-accurate; allow 2ε·n rank slack converted to
      // the value grid (values are 1..5000 with skewed multiplicity)
      assert(math.abs(g - w) <= 6.0,
        s"p=$p weighted=$g expanded=$w")
    }
  }

  test("small skewed case matches percentile_approx over expanded rows") {
    // 100 points: ranks for p=0.5 / p=0.99 land inside the 97-weight
    // run of value 4 — boundary semantics must be percentile_approx's,
    // not an independent convention
    val hist = Seq((1.0, 1L), (2.0, 1L), (3.0, 1L), (4.0, 97L))
      .toDF("v", "w")
    val q = hist.agg(WeightedPercentileApprox.wpa(
        col("v"), col("w"), Seq(0.5, 0.99), 10000).as("q"))
      .select(explode(col("q"))).as[Double].collect()
    val want = hist.select(explode(expr("sequence(1, w)")).as("i"), col("v"))
      .agg(percentile_approx(col("v"), array(lit(0.5), lit(0.99)),
        lit(10000)).as("q"))
      .select(explode(col("q"))).as[Double].collect()
    assert(q.sameElements(want), s"${q.toSeq} vs ${want.toSeq}")
  }

  test("null values, NaN values and non-positive weights are skipped") {
    val df = Seq(
      (Some(1.0), 5L), (None, 100L), (Some(Double.NaN), 100L),
      (Some(2.0), 0L), (Some(3.0), -4L), (Some(9.0), 5L)
    ).toDF("v", "w")
    val q = df.agg(WeightedPercentileApprox.wpa(
        col("v"), col("w"), Seq(0.0, 1.0), 10000).as("q"))
      .select(explode(col("q"))).as[Double].collect()
    assert(q.sameElements(Array(1.0, 9.0)))
  }

  test("partition merge: result independent of partitioning") {
    val hist = (1 to 2000)
      .map(v => (v.toDouble, (v % 11 + 1).toLong)).toDF("v", "w")
    def run(df: org.apache.spark.sql.DataFrame): Array[Double] =
      df.agg(WeightedPercentileApprox.wpa(col("v"), col("w"), ps, 10000)
          .as("q"))
        .select(explode(col("q"))).as[Double].collect()
    val one = run(hist.coalesce(1))
    val many = run(hist.repartition(13))
    one.zip(many).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 2.0, s"partitioning moved estimate $a -> $b")
    }
  }

  test("empty input → null") {
    val df = Seq.empty[(Double, Long)].toDF("v", "w")
    val r = df.agg(WeightedPercentileApprox.wpa(
      col("v"), col("w"), ps, 10000).as("q")).collect()(0)
    assert(r.isNullAt(0))
  }
}
