package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank: closed-form fixtures, mass conservation, the no-dangling
  * contract, and the bounded-lineage discipline.
  */
class GraphSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String, Double)], iters: Int,
      d: Double = 0.85): Map[String, Double] =
    Graph.pageRank(edges.toDF("src", "dst", "weight"), iters, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("regular graph fixes to the uniform vector immediately") {
    // 3-cycle with equal weights: uniform is the exact fixpoint of
    // every iteration, so 1 round or 7 rounds both give exactly 1/3
    val cyc = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0))
    for (it <- Seq(1, 7)) {
      val r = ranksOf(cyc, it)
      r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-15, s"$it: $r"))
    }
  }

  test("star graph: hub out-ranks leaves, matches the hand-rolled iteration") {
    // hub h ↔ leaves l1..l4 (symmetric, unit weights)
    val leaves = (1 to 4).map(i => s"l$i")
    val edges = leaves.flatMap(l => Seq(("h", l, 1.0), (l, "h", 1.0)))
    val got = ranksOf(edges, 5)
    // reference: dense power iteration in plain Scala, same arithmetic
    val n = 5
    var r = Map[String, Double](("h" +: leaves).map(_ -> 1.0 / n): _*)
    for (_ <- 1 to 5) {
      val inflowH = leaves.map(l => r(l) * 1.0).sum // each leaf sends all to h
      val teleport = (1.0 - 0.85) / n
      val hubShare = r("h") / 4.0 // hub splits evenly across 4 leaves
      r = Map("h" -> (teleport + 0.85 * inflowH)) ++
        leaves.map(l => l -> (teleport + 0.85 * hubShare))
    }
    got.foreach { case (k, v) =>
      assert(math.abs(v - r(k)) < 1e-12, s"$k: got $v want ${r(k)}")
    }
    assert(got("h") > got("l1"), "hub must out-rank a leaf")
  }

  test("rank mass is conserved (no dangling ⇒ sums to 1)") {
    val rnd = new scala.util.Random(7)
    val e0 = Seq.fill(200)((s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}",
      1.0 + rnd.nextInt(5)))
    // symmetrize so the contract holds
    val edges = e0 ++ e0.map { case (a, b, w) => (b, a, w) }
    val total = ranksOf(edges, 6).values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass leaked: $total")
  }

  test("dangling sink is rejected by the contract check") {
    val bad = Seq(("a", "b", 1.0)) // b never appears as src
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(bad.toDF("src", "dst", "weight"), 2, 0.85)
    }
    assert(ex.getMessage.contains("dangling"))
  }

  test("lineage is linear in rounds (constant exchanges per extra round)") {
    val edges = Seq(("a", "b", 1.0), ("b", "a", 1.0), ("b", "c", 2.0),
      ("c", "b", 2.0)).toDF("src", "dst", "weight")
    def exchanges(rounds: Int): Int = {
      val p = Graph.pageRank(edges, rounds, 0.85)
        .queryExecution.executedPlan.toString
      "Exchange".r.findAllIn(p).size
    }
    val (e2, e3, e4) = (exchanges(2), exchanges(3), exchanges(4))
    assert(e3 - e2 == e4 - e3,
      s"exchange growth must be constant per round: $e2, $e3, $e4")
  }

  test("q121 graph at sf0.001: suppliers with more trade rank higher on average") {
    val out = QueriesRel.q121PageRank(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.nonEmpty)
    assert(math.abs(out.values.sum - 1.0) < 1e-6, "q121 mass")
    // suppliers aggregate far more edges than any single customer in
    // the TPC-H shape — the top-ranked node must be a supplier
    val top = out.maxBy(_._2)._1
    assert(top.startsWith("s"), s"expected a supplier on top, got $top")
  }
}
