package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SqAdcExpr
import graft.operators.{Pq, Sq}

/** Native SQ8 ADC expression: bit-parity with the composed HOF
  * baseline (`l2sqExact` over `reconstruct`), whole-stage codegen
  * participation, and the float/double query faces.
  */
class SqAdcExprSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select($"vec_id", $"embedding")

  private def realRanges: Sq.Ranges = Sq.learnRanges(emb, "embedding")

  test("sqAdc matches l2sqExact(reconstruct) bit-for-bit on real codes") {
    val r = realRanges
    val codes = emb.select($"vec_id".as("id"),
      Sq.encodeCodes($"embedding", r).as("codes"))
    val pairs = emb.limit(20).crossJoin(codes.limit(50))
    val diff = pairs.select(
        (SqAdcExpr.sqAdc($"embedding", $"codes", r.mins, r.spans) -
          Pq.l2sqExact($"embedding", Sq.reconstruct($"codes", r))).as("d"))
      .agg(max(abs($"d"))).as[Double].collect()(0)
    assert(diff == 0.0,
      "fused loop must share the HOF's association and fold order exactly")
  }

  test("sqAdc accepts a double query vector (the refine/residual face)") {
    val r = Sq.Ranges(Seq(0.0, 0.0), Seq(1.0, 2.0))
    val df = spark.range(1).select(
      array(lit(0.5), lit(1.0)).as("q"), // array<double>
      array(lit(255), lit(0)).as("c"))
    val got = df.select(
      SqAdcExpr.sqAdc($"q", $"c", r.mins, r.spans).as("d")).as[Double].head()
    // recon = (1.0, 0.0); d2 = (0.5-1)^2 + (1-0)^2 = 1.25
    assert(got == 1.25)
  }

  test("l2sqFast matches the aggregate(zip_with) baseline bit-for-bit") {
    import graft.functions.L2SqExpr
    val pairs = emb.limit(30).crossJoin(
      emb.select($"embedding".as("e2")).limit(30))
    val diff = pairs.select(
        (L2SqExpr.l2sqFast($"embedding", $"e2") -
          Pq.l2sqExact($"embedding", $"e2")).as("d"))
      .agg(max(abs($"d"))).as[Double].collect()(0)
    assert(diff == 0.0, "same left-to-right fold must be bit-identical")
    // mixed float/double faces: recon arrays are double, queries float
    val r = realRanges
    val mixed = emb.limit(10).select(
      (L2SqExpr.l2sqFast($"embedding",
          Sq.reconstruct(Sq.encodeCodes($"embedding", r), r)) -
        Pq.l2sqExact($"embedding",
          Sq.reconstruct(Sq.encodeCodes($"embedding", r), r))).as("d"))
      .agg(max(abs($"d"))).as[Double].collect()(0)
    assert(mixed == 0.0)
  }

  test("sqAdc runs inside WholeStageCodegen; several instances coexist") {
    val r = realRanges
    val codes = Sq.encodeCodes($"embedding", r)
    val plan = emb.select(
        (SqAdcExpr.sqAdc($"embedding", codes, r.mins, r.spans) +
          SqAdcExpr.sqAdc($"embedding", codes, r.mins, r.spans)).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen stage marker in:\n$plan")
    // self-ADC is the pure quantization loss: small but non-negative
    val v = emb.limit(5).select(
      SqAdcExpr.sqAdc($"embedding", codes, r.mins, r.spans).as("d"))
      .as[Double].collect()
    assert(v.forall(x => x >= 0.0 && x < 0.01))
  }
}
