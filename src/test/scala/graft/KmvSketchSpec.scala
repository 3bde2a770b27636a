package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kmv

/** KMV (bottom-k) distinct sketch: exactness-under-k contract (the
  * oracle hook q120 rides), saturated-regime estimator accuracy, and
  * merge/partitioning invariance.
  */
class KmvSketchSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("unsaturated sketch IS the sorted distinct hash set; estimators exact") {
    val rnd = new scala.util.Random(42)
    // 5k rows over 700 distinct ids, duplicated and shuffled
    val ids = Seq.fill(5000)(rnd.nextInt(700).toLong)
    val df = ids.toDF("id").repartition(7)
    val k = 4096
    val sk = df.agg(Kmv.sketch(xxhash64(col("id")), k).as("sk"))
      .select(col("sk"),
        Kmv.estimateDistinct(col("sk"), k).as("est"))
      .head()
    val got = sk.getSeq[Long](0)
    val expect = ids.distinct
      .map(i => spark.range(1).select(xxhash64(lit(i))).head().getLong(0))
    assert(got.sorted == got, "sketch must be ascending")
    assert(got.toSet == expect.toSet,
      "unsaturated sketch must hold every distinct hash")
    assert(sk.getDouble(1) == ids.distinct.size.toDouble,
      "unsaturated estimate must be exact")
  }

  test("saturated estimator: (k-1)/theta within 4 sigma at n=50k, k=1024") {
    val n = 50000
    val k = 1024
    val est = spark.range(n.toLong)
      .agg(Kmv.sketch(xxhash64(col("id")), k).as("sk"))
      .select(Kmv.estimateDistinct(col("sk"), k))
      .head().getDouble(0)
    // relative stderr ~ 1/sqrt(k-2) ≈ 3.1%; 4 sigma ≈ 12.5%
    assert(math.abs(est / n - 1.0) < 0.125,
      s"saturated estimate $est vs true $n out of tolerance")
  }

  test("saturated union/intersection estimators track planted overlap") {
    val k = 1024
    // A = [0, 30k), B = [20k, 50k): |A|=|B|=30k, |A∩B|=10k, |A∪B|=50k
    val a = spark.range(0, 30000)
      .agg(Kmv.sketch(xxhash64(col("id")), k).as("ska"))
    val b = spark.range(20000, 50000)
      .agg(Kmv.sketch(xxhash64(col("id")), k).as("skb"))
    val r = a.crossJoin(b).select(
      Kmv.unionEstimate(col("ska"), col("skb"), k).as("u"),
      Kmv.intersectEstimate(col("ska"), col("skb"), k).as("i"),
      Kmv.jaccardEstimate(col("ska"), col("skb"), k).as("j")).head()
    val (u, i, j) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(math.abs(u / 50000.0 - 1.0) < 0.125, s"union est $u")
    // intersection inherits union noise plus binomial rho noise — loose 4-sigma-ish bound
    assert(math.abs(i / 10000.0 - 1.0) < 0.25, s"intersect est $i")
    assert(math.abs(j / 0.2 - 1.0) < 0.25, s"jaccard est $j")
  }

  test("sketch is partitioning-invariant (merge path ≡ single partition)") {
    val df = spark.range(100000).select(xxhash64(col("id")).as("h"))
    val k = 512
    val one = df.coalesce(1).agg(Kmv.sketch(col("h"), k)).head().getSeq[Long](0)
    val many = df.repartition(13).agg(Kmv.sketch(col("h"), k)).head().getSeq[Long](0)
    assert(one == many, "merge tree must not change the bottom-k set")
    assert(one.size == k, "saturated sketch must hold exactly k values")
  }

  test("null hashes are skipped; empty input yields an empty sketch") {
    val df = Seq(Some(1L), None, Some(2L), None, Some(1L)).toDF("id")
    val sk = df.agg(Kmv.sketch(
        when(col("id").isNotNull, xxhash64(col("id"))), 64))
      .head().getSeq[Long](0)
    assert(sk.size == 2)
    val empty = spark.range(0)
      .agg(Kmv.sketch(xxhash64(col("id")), 64)).head().getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("q120 panel: sketch-estimated overlap equals the exact panel at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val got = QueriesStream.q120AudienceOverlap(spark, d).collect()
    assert(got.nonEmpty, "panel must cover the type pairs")
    // exact recomputation straight from the raw table
    val ev = spark.read.parquet(s"$d/events.parquet")
      .filter(col("value") > 150)
      .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
    val exact = ev.as("x").join(ev.as("y"),
        col("x.u") === col("y.u") && col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("ta"), col("y.t").as("tb"))
      .agg(count(lit(1)).as("ni"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val sizes = ev.groupBy("t").agg(countDistinct("u").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val ni = exact.getOrElse((ta, tb), 0L).toDouble
      val uni = sizes(ta) + sizes(tb) - ni
      assert(r.getDouble(2) == sizes(ta).toDouble, s"users_a $ta")
      assert(r.getDouble(3) == sizes(tb).toDouble, s"users_b $tb")
      assert(r.getDouble(4) == ni, s"inter $ta/$tb")
      assert(r.getDouble(5) == uni, s"union $ta/$tb")
      assert(math.abs(r.getDouble(6) - ni / uni) < 1e-6, s"jaccard $ta/$tb")
    }
  }
}
