package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomAnyExpr
import graft.operators.Dedup

/** Bloom prefilter: native-expression parity with the local model,
  * the no-false-negative contract, and operator-level output identity
  * between the Bloom deployment path and the broadcast-set baseline
  * (including under a deliberately tiny filter that forces false
  * positives through the exact confirm stage).
  */
class BloomAnyExprSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val MBits = 1 << 10
  private val Probes = 5

  private def randomFilter(seed: Long, nKeys: Int): (Array[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val keys = Seq.fill(nKeys)(rnd.nextLong() & ((1L << 60) - 1))
    val bits = new Array[Long](MBits / 64)
    keys.foreach(BloomAnyExpr.insertModel(_, bits, MBits, Probes))
    (bits, keys)
  }

  test("native expr matches the local model on random hash arrays") {
    val (bits, _) = randomFilter(seed = 7, nKeys = 40)
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)(
      Seq.fill(1 + rnd.nextInt(6))(rnd.nextLong() & ((1L << 60) - 1)))
    val got = rows.toDF("hs")
      .select(BloomAnyExpr.bloomAny($"hs", bits, MBits, Probes).as("b"))
      .as[Boolean].collect()
    val want = rows.map(_.exists(
      BloomAnyExpr.containsModel(_, bits, MBits, Probes)))
    assert(got.toSeq == want,
      "codegen loop must agree with the interpreted model element-wise")
  }

  test("no false negatives: every inserted key tests true") {
    val (bits, keys) = randomFilter(seed = 13, nKeys = 120)
    val hits = keys.map(Seq(_)).toDF("hs")
      .select(BloomAnyExpr.bloomAny($"hs", bits, MBits, Probes).as("b"))
      .as[Boolean].collect()
    assert(hits.forall(identity))
  }

  test("empty array and empty filter are both definite misses") {
    val zero = new Array[Long](MBits / 64)
    val df = Seq(Seq.empty[Long], Seq(42L)).toDF("hs")
    val got = df.select(BloomAnyExpr.bloomAny($"hs", zero, MBits, Probes))
      .as[Boolean].collect()
    assert(got.toSeq == Seq(false, false))
  }

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two three four five six seven"),
    (3L, "unrelated text with no shared grams here"),
    (4L, "prefix alpha beta gamma delta epsilon suffix"),
    (5L, "totally different content again entirely")
  ).toDF("doc_id", "text")
  private val evalSet = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "one two three four five")
  ).toDF("doc_id", "text")

  test("contaminatedIdsBloom ≡ contaminatedIds (default sizing)") {
    val base = Dedup.contaminatedIds(docs, evalSet, "text", "doc_id", 5)
      .as[Long].collect().sorted.toSeq
    val bloom = Dedup.contaminatedIdsBloom(docs, evalSet, "text", "doc_id", 5)
      .as[Long].collect().sorted.toSeq
    assert(base.nonEmpty, "fixture must actually contaminate")
    assert(bloom == base)
  }

  test("tiny filter forces false positives; confirm join removes them") {
    // 64 bits for ~10 keys ⇒ the prefilter passes nearly everything;
    // output must STILL equal the exact baseline.
    val base = Dedup.contaminatedIds(docs, evalSet, "text", "doc_id", 5)
      .as[Long].collect().sorted.toSeq
    val bloom = Dedup.contaminatedIdsBloom(docs, evalSet, "text", "doc_id", 5,
        mBitsOverride = Some(64))
      .as[Long].collect().sorted.toSeq
    assert(bloom == base)
  }

  test("relational build reproduces the model arithmetic (q55 fixture)") {
    // End-to-end on real testdata: the Bloom path and the broadcast-set
    // path must produce identical drop-lists at sf0.001.
    val d = "/root/testdata/sf0.001"
    val a = QueriesCorpus.all("q55_decontaminate")(spark, d)
      .as[Long].collect().toSeq
    val b = QueriesCorpus.all("q103_decontaminate_bloom")(spark, d)
      .as[Long].collect().toSeq
    assert(a.nonEmpty)
    assert(b == a)
  }
}
