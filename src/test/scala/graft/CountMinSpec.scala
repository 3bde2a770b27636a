package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMinSketchAgg

/** Count–Min sketch properties the q147 audit relies on: the one-sided
  * error guarantee (estimate ≥ exact, always — not probabilistically),
  * partition invariance of the cell array (integer vector addition
  * commutes, so the sketch itself is hash-checkable), mergeability of
  * per-group sketches into the global one, and bucket parity between
  * the native update path and the SQL formulation the DuckDB oracle
  * transcribes.
  */
class CountMinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val D = 4
  private val W = 1021

  // zipf-ish stream: item i appears ceil(600/i) times, i = 1..80
  private def zipf: Seq[String] =
    (1 to 80).flatMap(i => Seq.fill(math.ceil(600.0 / i).toInt)(s"item$i"))
  private def exact: Map[String, Long] =
    zipf.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def sketchOf(parts: Int): Array[Long] =
    zipf.toDF("w").repartition(parts)
      .agg(CountMinSketchAgg.cm(col("w"), lit(1L), D, W).as("c"))
      .select(col("c")).as[Seq[Long]].head().toArray

  test("estimate >= exact for every key; each row's cells sum to N") {
    val cells = sketchOf(8)
    val n = zipf.size.toLong
    (0 until D).foreach { r =>
      assert(cells.slice(r * W, (r + 1) * W).sum == n,
        s"row $r must conserve total mass")
    }
    exact.foreach { case (item, cnt) =>
      val (h1, h2) = CountMinSketchAgg.hashPair(item.getBytes("UTF-8"))
      val est = (0 until D)
        .map(r => cells(r * W + CountMinSketchAgg.bucket(h1, h2, r, W))).min
      assert(est >= cnt, s"$item: CM may never underestimate ($est < $cnt)")
    }
  }

  test("cell array is partition-invariant (serde + merge path exercised)") {
    assert(sketchOf(1).toSeq == sketchOf(8).toSeq)
  }

  test("per-group sketches merge by vector add into the global sketch") {
    val grouped = zipf.zipWithIndex
      .map { case (w, i) => (w, s"g${i % 3}") }.toDF("w", "g")
      .groupBy("g")
      .agg(CountMinSketchAgg.cm(col("w"), lit(1L), D, W).as("c"))
      .select(col("c")).as[Seq[Long]].collect()
    val summed = grouped.reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    assert(summed == sketchOf(4).toSeq,
      "sum of per-group sketches must equal the whole-corpus sketch")
  }

  test("native buckets match the oracle SQL arithmetic") {
    // non-circular parity pin: recompute h1/h2/bucket through Spark's own
    // md5-hex + conv path (the exact expression the DuckDB twin uses) and
    // compare against the digest-byte fast path
    val items = Seq("alpha", "beta", "", "çédille ünïcode", "a b  c\td")
    val viaSql = items.toDF("w").select(col("w"),
      conv(substring(md5(col("w").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("h1"),
      conv(substring(md5(col("w").cast("binary")), 16, 15), 16, 10)
        .cast("long").as("h2"))
      .as[(String, Long, Long)].collect()
    viaSql.foreach { case (w, h1s, h2s) =>
      val (h1, h2) = CountMinSketchAgg.hashPair(w.getBytes("UTF-8"))
      assert((h1, h2) == (h1s, h2s), s"hash pair mismatch for '$w'")
      (0 until D).foreach { r =>
        val sqlBucket = ((h1s + r * (2 * (h2s % CountMinSketchAgg.StepMod) + 1))
          % W).toInt
        assert(CountMinSketchAgg.bucket(h1, h2, r, W) == sqlBucket)
      }
    }
  }

  test("estimate column reads the same values the buffer arithmetic gives") {
    val sketch = zipf.toDF("w")
      .agg(CountMinSketchAgg.cm(col("w"), lit(1L), D, W).as("c"))
    val probes = Seq("item1", "item2", "item40").toDF("w")
    val got = probes.crossJoin(broadcast(sketch))
      .select(col("w"),
        CountMinSketchAgg.estimate(col("c"), col("w"), D, W).as("est"))
      .as[(String, Long)].collect().toMap
    val cells = sketchOf(1)
    Seq("item1", "item2", "item40").foreach { item =>
      val (h1, h2) = CountMinSketchAgg.hashPair(item.getBytes("UTF-8"))
      val want = (0 until D)
        .map(r => cells(r * W + CountMinSketchAgg.bucket(h1, h2, r, W))).min
      assert(got(item) == want, s"estimate() disagrees with buffer for $item")
      assert(got(item) >= exact(item))
    }
  }

  test("estimate reads the xx-mode buffer layout (deployment-hash twin)") {
    // the xx twin of the md5 estimate-parity case above: q152 has no
    // DuckDB oracle by design, so THIS pin is what catches a drift
    // between estimate(engineXx = true) and the native update path's
    // hashPairXx/bucket arithmetic
    val sketch = zipf.toDF("w")
      .agg(CountMinSketchAgg.cm(col("w"), lit(1L), D, W, engineXx = true)
        .as("c"))
    val cells = zipf.toDF("w")
      .agg(CountMinSketchAgg.cm(col("w"), lit(1L), D, W, engineXx = true)
        .as("c"))
      .select(col("c")).as[Seq[Long]].head().toArray
    val probes = Seq("item1", "item2", "item40").toDF("w")
    val got = probes.crossJoin(broadcast(sketch))
      .select(col("w"),
        CountMinSketchAgg.estimate(col("c"), col("w"), D, W, engineXx = true)
          .as("est"))
      .as[(String, Long)].collect().toMap
    Seq("item1", "item2", "item40").foreach { item =>
      val (h1, h2) = CountMinSketchAgg.hashPairXx(item.getBytes("UTF-8"))
      val want = (0 until D)
        .map(r => cells(r * W + CountMinSketchAgg.bucket(h1, h2, r, W))).min
      assert(got(item) == want,
        s"xx-mode estimate() disagrees with the buffer layout for $item")
      assert(got(item) >= exact(item))
    }
  }

  test("null d/w/hash-mode literals fail analysis, not NPE") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BooleanType, IntegerType}
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val item = Literal.create("x", org.apache.spark.sql.types.StringType)
    val weight = Literal(1L, org.apache.spark.sql.types.LongType)
    val nullD = CountMinSketchAgg(item, weight,
      Literal(null, IntegerType), Literal(W, IntegerType))
    val nullW = CountMinSketchAgg(item, weight,
      Literal(D, IntegerType), Literal(null, IntegerType))
    val nullXx = CountMinSketchAgg(item, weight,
      Literal(D, IntegerType), Literal(W, IntegerType),
      Literal(null, BooleanType))
    Seq(nullD, nullW, nullXx).foreach { agg =>
      agg.checkInputDataTypes() match {
        case TypeCheckResult.TypeCheckFailure(msg) =>
          assert(msg.contains("non-null"), s"wrong failure: $msg")
        case other => fail(s"expected analysis failure, got $other")
      }
    }
  }

  test("cmKnobs derives d/w from the published guarantees") {
    import CountMinSketchAgg.cmKnobs
    val k = cmKnobs(vocabEstimate = 4096, eps = 0.0025, delta = 0.02)
    assert(k.d == 4, "d = ceil(ln(1/0.02)) = 4")
    assert(k.w == 1091, "w = next prime >= ceil(e/0.0025) = 1088")
    assert(k.cells == 4 * 1091)
    // the vocab cap: a tiny key space never allocates a huge width
    val small = cmKnobs(vocabEstimate = 100, eps = 0.0001, delta = 0.02)
    assert(small.w == 211, "capped at 2*vocab = 200, next prime 211")
    def isPrime(n: Int) = (2 to math.sqrt(n.toDouble).toInt)
      .forall(n % _ != 0)
    assert(isPrime(k.w) && isPrime(small.w), "widths must be prime")
    // extreme eps/vocab derives the largest legal sketch, never an
    // Int overflow or an analysis-time rejection downstream
    val extreme = cmKnobs(vocabEstimate = 2_000_000_000L,
      eps = 1e-9, delta = 0.02)
    assert(extreme.d.toLong * extreme.w <= (1L << 24),
      s"derived knobs must always pass the aggregate's cell-cap guard: $extreme")
    assert(extreme.w > (1 << 21), "the clamp must still be a LARGE sketch")
    assert(isPrime(extreme.w), "the clamped width must stay prime")
    intercept[IllegalArgumentException](cmKnobs(0, 0.01, 0.01))
    intercept[IllegalArgumentException](cmKnobs(10, 1.5, 0.01))
    intercept[IllegalArgumentException](cmKnobs(10, 0.01, 0.0))
  }

  test("null items and non-positive weights are skipped") {
    val cells = Seq((Some("x"), 5L), (None, 100L), (Some("y"), 0L), (Some("y"), -3L))
      .toDF("w", "n")
      .agg(CountMinSketchAgg.cm(col("w"), col("n"), D, W).as("c"))
      .select(col("c")).as[Seq[Long]].head()
    assert(cells.sum == 5L * D, "only the (x, 5) row may contribute")
  }
}
