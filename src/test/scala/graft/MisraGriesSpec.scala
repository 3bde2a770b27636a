package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesCandidates

/** MG candidate guarantee: every item with true frequency ≥ N/(k+1)
  * must be in the candidate array, whatever the partitioning — the
  * property the exact confirm pass of q110 relies on.
  */
class MisraGriesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("θ-frequent items always survive, k smaller than the vocabulary") {
    // vocabulary of 500 rare items (1 occurrence each) + 3 heavy items
    // far above N/(k+1); k = 20 ≪ vocab
    val rare = (1 to 500).map(i => s"rare$i")
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(200)("gamma")
    val items = new scala.util.Random(42).shuffle((rare ++ heavy).toVector)
    for (parts <- Seq(1, 7)) {
      val cands = items.toDF("w").repartition(parts)
        .agg(MisraGriesCandidates.mg(col("w"), lit(1L), 20).as("c"))
        .select(explode(col("c"))).as[String].collect().toSet
      assert(cands.size <= 20, s"capacity bound violated: ${cands.size}")
      assert(Set("alpha", "beta", "gamma").subsetOf(cands),
        s"heavy items must survive MG at $parts partitions, got $cands")
    }
  }

  test("weighted feed composes: histogram input ≡ expanded input") {
    val hist = Seq(("a", 50L), ("b", 30L), ("c", 1L), ("d", 1L), ("e", 1L))
    val viaHist = hist.toDF("w", "n")
      .agg(MisraGriesCandidates.mg(col("w"), col("n"), 3).as("c"))
      .select(explode(col("c"))).as[String].collect().toSet
    assert(Set("a", "b").subsetOf(viaHist))
    assert(viaHist.size <= 3)
  }

  test("null items and non-positive weights are skipped") {
    val df = Seq((Some("x"), 5L), (None, 100L), (Some("y"), 0L))
      .toDF("w", "n")
    val cands = df
      .agg(MisraGriesCandidates.mg(col("w"), col("n"), 4).as("c"))
      .select(explode(col("c"))).as[String].collect().toSet
    assert(cands == Set("x"))
  }
}
