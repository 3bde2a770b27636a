package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

/** Native PQ encode expression: element-parity with the composed HOF
  * argmin baseline on real vectors, tie-break and short-vector
  * contracts.
  */
class PqEncodeExprSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select($"vec_id", $"embedding")

  test("native encodeCodes equals the HOF argmin on real embeddings") {
    val cb = Pq.learnCodebooks(emb, "vec_id", "embedding", m = 8, k = 16, iters = 3)
    val mism = emb.select(
        Pq.encodeCodes($"embedding", cb).as("nat"),
        Pq.encodeCodesHof($"embedding", cb).as("hof"))
      .filter(not($"nat" <=> $"hof")).count()
    assert(mism == 0, "native and HOF assignments must be element-identical")
  }

  test("native encodeCodes equals the HOF argmin for an m=1 coarse codebook") {
    val cb = Pq.coarseQuantizer(emb, "vec_id", "embedding", k = 7, iters = 3)
    val mism = emb.select(
        Pq.encodeCodes($"embedding", cb).as("nat"),
        Pq.encodeCodesHof($"embedding", cb).as("hof"))
      .filter(not($"nat" <=> $"hof")).count()
    assert(mism == 0)
  }

  test("equidistant centroids tie-break to the lowest cid") {
    // centroids at +1 and -1 per dim; the zero vector is equidistant
    val cb = Seq((0, 0, Array(1.0, 1.0)), (0, 1, Array(-1.0, -1.0)))
    val out = Seq((1L, Seq(0f, 0f))).toDF("id", "v")
      .select(Pq.encodeCodes($"v", cb).as("codes"))
      .as[Seq[Int]].head()
    assert(out == Seq(0))
  }

  test("a vector shorter than m*subDim yields null codes") {
    val cb = Seq((0, 0, Array(0.0, 0.0)), (1, 0, Array(0.0, 0.0)))
    val out = Seq((1L, Seq(0.5f))).toDF("id", "v")
      .select(Pq.encodeCodes($"v", cb).as("codes"))
      .collect().head
    assert(out.isNullAt(0))
  }
}
