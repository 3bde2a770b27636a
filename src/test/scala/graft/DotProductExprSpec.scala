package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DotProductExpr
import graft.operators.Similarity

/** Native Catalyst expression tests: bit-parity with the HOF baseline,
  * whole-stage codegen participation, SQL registration via
  * SparkSessionExtensions.
  */
class DotProductExprSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("dotp matches the aggregate(zip_with) baseline bit-for-bit") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50).select($"vec_id", $"embedding")
    val pairs = emb.as("a").crossJoin(emb.as("b")).limit(500)
    val diff = pairs.select(
        (DotProductExpr.dotp($"a.embedding", $"b.embedding") -
          Similarity.dot($"a.embedding", $"b.embedding")).as("d"))
      .agg(max(abs($"d"))).as[Double].collect()(0)
    assert(diff == 0.0, "same left-to-right fold must be bit-identical")
  }

  test("dotp runs inside WholeStageCodegen") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = emb.select(DotProductExpr.dotp($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected codegen stage marker in:\n$plan")
  }

  test("several dotp instances share one codegen scope without collisions") {
    // non-nullable array children (array literal) exercise the unbraced
    // nullSafeCodeGen path where local names must be fresh per instance
    val df = spark.range(1).select(
      array(lit(1f), lit(2f)).as("a"), array(lit(3f), lit(4f)).as("b"))
    val r = df.select(
      (DotProductExpr.dotp($"a", $"b") + DotProductExpr.dotp($"a", $"a")
        + DotProductExpr.dotp($"b", $"b")).as("s")).as[Double].collect()(0)
    assert(r == 11.0 + 5.0 + 25.0)
  }

  test("cosineFast self-similarity is ~1") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(10)
    val vals = emb.select(
      DotProductExpr.cosineFast($"embedding", $"embedding")).as[Double].collect()
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-6))
  }

  test("graft_dotp is SQL-callable via GraftExtensions (SharedSpark installs it)") {
    val r = spark.sql(
      "SELECT graft_dotp(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }

  test("graft_dotp with wrong arity raises AnalysisException, not IndexOutOfBounds") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dotp(array(cast(1.0 as float)))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("parameter") ||
      e.getMessage.toLowerCase.contains("argument"))
  }
}
