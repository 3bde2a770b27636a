package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Curation}

/** Event-analytics and weighted-sampling fixtures: q123's funnel
  * ordering/window semantics and Curation.weightedSample's E-S
  * contract.
  */
class AnalyticsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val H = 3600L * 1000 // ms

  private def writeEventsFixture(rows: Seq[(Long, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("funnel_fx").toString
    rows.zipWithIndex.map { case ((u, t, offMs), i) =>
      (i.toLong, new Timestamp(1700000000000L + offMs), u, t, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q123 funnel: ordering + 24h windows, first-match anchoring") {
    val d = writeEventsFixture(Seq(
      // A: clean full funnel inside the windows
      (1L, "view", 0L), (1L, "click", 2 * H), (1L, "purchase", 4 * H),
      // B: click BEFORE the first view only → stage 1 only
      (2L, "click", 0L), (2L, "view", 1 * H),
      // C: click outside the 24h window → stage 1 only
      (3L, "view", 0L), (3L, "click", 30 * H),
      // D: purchase outside click's 24h window → stage 2
      (4L, "view", 0L), (4L, "click", 1 * H), (4L, "purchase", 27 * H),
      // E: purchase only, never viewed → not even stage 1
      (5L, "purchase", 0L),
      // G: purchase 25h after view but within 24h of the FIRST click —
      // windows anchor on the previous stage, not the funnel start
      (6L, "view", 0L), (6L, "click", 20 * H), (6L, "purchase", 25 * H)))
    val r = QueriesStream.q123Funnel(spark, d).head()
    assert(r.getLong(0) == 5, "n_view: A,B,C,D,G")
    assert(r.getLong(1) == 3, "n_view_click: A,D,G")
    assert(r.getLong(2) == 2, "n_full_funnel: A,G")
  }

  test("q123 first-match: a second, later click does not re-open the window") {
    val d = writeEventsFixture(Seq(
      // first click at 1h; purchase 26h later is outside ITS window,
      // and the 30h click must not re-anchor (first-match semantics)
      (1L, "view", 0L), (1L, "click", 1 * H), (1L, "click", 30 * H),
      (1L, "purchase", 40 * H)))
    val r = QueriesStream.q123Funnel(spark, d).head()
    assert(r.getLong(1) == 1 && r.getLong(2) == 0,
      "purchase must measure from the FIRST qualifying click only")
  }

  private def sampleDf(n: Int, heavyEvery: Int, heavyW: Long) =
    (1 to n).map(i =>
      (s"k$i", if (i % heavyEvery == 0) heavyW else 1L, "s")).toDF(
      "key", "w", "grp")

  test("weightedSample: k per stratum, partitioning-invariant, seed-sensitive") {
    val df = (1 to 300).map(i => (s"k$i", (i % 7 + 1).toLong,
      if (i % 2 == 0) "a" else "b")).toDF("key", "w", "grp")
    def ids(d: org.apache.spark.sql.DataFrame, seed: String) =
      Curation.weightedSample(d, "key", "w", "grp", 10, seed)
        .select("grp", "key").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val one = ids(df.coalesce(1), "s1")
    val many = ids(df.repartition(11), "s1")
    assert(one == many, "sample must be a pure function of (seed, key)")
    assert(one.count(_._1 == "a") == 10 && one.count(_._1 == "b") == 10)
    val reseeded = ids(df, "s2")
    assert(reseeded != one, "a new seed must redraw the sample")
  }

  test("weightedSample: heavy weights are overrepresented ∝ weight") {
    // 270 light (w=1) + 30 heavy (w=50): heavy carries ~85% of the
    // total weight, so an E-S draw of 30 should be mostly heavy; a
    // uniform sampler would pick ~3 heavy
    val df = sampleDf(300, 10, 50L)
    val got = Curation.weightedSample(df, "key", "w", "grp", 30, "hv")
      .filter(col("w") === 50L).count()
    assert(got >= 15, s"heavy picked only $got of 30 — weights ignored?")
  }

  test("weightedSample: non-positive weights are never drawn") {
    val df = Seq(("a", 5L, "s"), ("b", 0L, "s"), ("c", -3L, "s"),
      ("d", 2L, "s")).toDF("key", "w", "grp")
    val keys = Curation.weightedSample(df, "key", "w", "grp", 4, "z")
      .select("key").as[String].collect().toSet
    assert(keys == Set("a", "d"))
  }

  test("robustOutlierScores: planted spike scores past 3, median is unmoved") {
    // 20 quiet days around 100 ± 2, one broken-scraper day at 500.
    // mean/stddev would let the spike drag the gate; median/MAD doesn't.
    val rows = (1 to 20).map(i => ("ingest", 100.0 + (i % 5) - 2)) :+
      (("ingest", 500.0))
    val out = Analytics.robustOutlierScores(
        rows.toDF("grp", "x"), "grp", "x")
      .collect().map(r => r.getDouble(1) -> r)
    val spike = out.find(_._1 == 500.0).get._2
    assert(spike.getAs[Double]("rscore") > 3,
      s"spike must flag: ${spike.getAs[Double]("rscore")}")
    assert(math.abs(spike.getAs[Double]("med") - 100.0) <= 1,
      "median must ignore the spike")
    val quiet = out.filter(_._1 <= 102.0)
    assert(quiet.forall(q => math.abs(q._2.getAs[Double]("rscore")) < 3),
      "quiet days must not flag")
  }

  test("robustOutlierScores: zero MAD yields null scores, not infinities") {
    val df = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 9.0))
      .toDF("grp", "x")
    val scores = Analytics.robustOutlierScores(df, "grp", "x")
      .select("rscore").collect().map(r => Option(r.get(0)))
    assert(scores.forall(_.isEmpty),
      "mad=0 (majority identical) must score null for every row")
  }

  test("welchT: planted mean shift has the right sign; equal samples give t=0") {
    def stats(a: Seq[Double], b: Seq[Double]) = {
      val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("arm", "x")
      val s = df.agg(
        count(when(col("arm") === "a", 1)).as("na"),
        avg(when(col("arm") === "a", col("x"))).as("ma"),
        var_samp(when(col("arm") === "a", col("x"))).as("va"),
        count(when(col("arm") === "b", 1)).as("nb"),
        avg(when(col("arm") === "b", col("x"))).as("mb"),
        var_samp(when(col("arm") === "b", col("x"))).as("vb"))
      val (t, dof) = Analytics.welchT(col("na"), col("ma"), col("va"),
        col("nb"), col("mb"), col("vb"))
      s.select(t.as("t"), dof.as("df")).head()
    }
    val rnd = new scala.util.Random(3)
    val base = Seq.fill(60)(10.0 + rnd.nextGaussian())
    val shifted = base.map(_ + 5.0)
    val up = stats(shifted, base)
    assert(up.getDouble(0) > 10, s"5-sigma shift must dominate: $up")
    // identical samples: t exactly 0, df defined
    val same = stats(base, base)
    assert(same.getDouble(0) == 0.0 && same.getDouble(1) > 0)
    // hand check against the closed form on a tiny fixture
    val t2 = stats(Seq(1.0, 2.0, 3.0), Seq(2.0, 4.0, 6.0))
    val (va, vb) = (1.0, 4.0) // var_samp of the two fixtures
    val want = (2.0 - 4.0) / math.sqrt(va / 3 + vb / 3)
    assert(math.abs(t2.getDouble(0) - want) < 1e-12)
  }

  test("welchT: degenerate arms (n<2 or zero spread both sides) are null") {
    def one(a: Seq[Double], b: Seq[Double]) = {
      val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("arm", "x")
      val s = df.agg(
        count(when(col("arm") === "a", 1)).as("na"),
        avg(when(col("arm") === "a", col("x"))).as("ma"),
        var_samp(when(col("arm") === "a", col("x"))).as("va"),
        count(when(col("arm") === "b", 1)).as("nb"),
        avg(when(col("arm") === "b", col("x"))).as("mb"),
        var_samp(when(col("arm") === "b", col("x"))).as("vb"))
      val (t, _) = Analytics.welchT(col("na"), col("ma"), col("va"),
        col("nb"), col("mb"), col("vb"))
      Option(s.select(t.as("t")).head().get(0))
    }
    assert(one(Seq(1.0), Seq(2.0, 3.0, 4.0)).isEmpty, "n_a=1")
    assert(one(Seq(5.0, 5.0, 5.0), Seq(7.0, 7.0)).isEmpty, "zero pooled spread")
  }

  test("keySkewProfile: uniform keys score zero Gini; a hot key dominates") {
    val uni = (1 to 100).flatMap(k => Seq.fill(5)(Tuple1(s"k$k"))).toDF("key")
    val u = Analytics.keySkewProfile(uni, "key").head()
    assert(u.getAs[Long]("n_keys") == 100L &&
      u.getAs[Long]("total_rows") == 500L)
    assert(u.getAs[Double]("gini") == 0.0, "uniform ⇒ Gini 0")
    assert(u.getAs[Double]("top1pct_share") == 0.01,
      "top 1 of 100 uniform keys carries exactly 1% of rows")
    val dom = (Seq.fill(901)("hot") ++ (1 to 99).map(i => s"c$i"))
      .map(Tuple1(_)).toDF("key")
    val dr = Analytics.keySkewProfile(dom, "key").head()
    assert(dr.getAs[Double]("top1pct_share") == 0.901,
      "the single ~1% key IS the hot key")
    assert(dr.getAs[Double]("gini") > 0.8, s"hot-key Gini: $dr")
    assert(dr.getAs[Long]("max_cnt") == 901L)
  }

  test("keySkewProfile: histogram block algebra matches the naive ranked formula") {
    val rnd = new scala.util.Random(5)
    // heavy duplication in count VALUES so rank blocks really form
    val counts = (1 to 57).map(i => s"x$i" -> (1 + rnd.nextInt(8)).toLong)
    val df = counts.flatMap { case (k, c) =>
      Seq.fill(c.toInt)(Tuple1(k)) }.toDF("key")
    val got = Analytics.keySkewProfile(df, "key").head()
    val xs = counts.map(_._2).sorted
    val n = xs.size
    val tot = xs.sum.toDouble
    val sumix = xs.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum
    val gini = 2 * sumix / (n * tot) - (n + 1.0) / n
    assert(math.abs(got.getAs[Double]("gini") - gini) < 5e-7,
      s"block-collapsed Gini must equal the ranked formula: $got vs $gini")
    val topShare = xs.max / tot // k1 = max(57 div 100, 1) = 1
    assert(math.abs(got.getAs[Double]("top1pct_share") - topShare) < 5e-7)
    assert(got.getAs[Long]("n_keys") == n.toLong &&
      got.getAs[Long]("total_rows") == tot.toLong)
  }

  test("q131 calibration: identical docs land in band 1.0 with zero error") {
    val dir = java.nio.file.Files.createTempDirectory("calib_fx").toString
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // ids 1, 5, 6 all pass the cal1 50% sample gate; id 2 does NOT —
    // its twin pairs must be invisible even though it shares shingles
    Seq((1L, text, "s"), (5L, text, "s"), (2L, text, "s"),
        (6L, "one two three four five six seven eight nine ten", "s"))
      .toDF("doc_id", "text", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = QueriesDedup.q131MinhashCalibration(spark, dir).collect()
    // (1,5) share everything; (x,6) share nothing; 2 is sampled out
    assert(rows.length == 1, s"only the identical in-sample pair counts: ${rows.toSeq}")
    val r = rows(0)
    assert(r.getAs[Double]("jband") == 1.0 && r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Double]("mean_est") == 1.0,
      "identical shingle sets ⇒ identical signatures ⇒ est exactly 1")
    assert(r.getAs[Double]("mean_exact") == 1.0 &&
      r.getAs[Double]("mean_abs_err") == 0.0)
  }

  test("HLL calibration: approx_count_distinct within its rsd bound on q35's shape") {
    // q35 serves approx_count_distinct at the default rsd 0.05; the
    // KMV/MinHash/Bloom sketches each carry a measured-accuracy hook
    // (q120 exact-under-k, q131, q134) — this is HLL's: DuckDB cannot
    // reproduce Spark's HLL so no oracle row can exist, but the
    // estimate is deterministic for fixed data, and 4 rsd is the same
    // slack KmvSketchSpec grants its saturated estimator.
    val df = (1 to 20000).map(i => (s"u${i % 7333}", i % 4)).toDF("u", "g")
    val rows = df.groupBy("g")
      .agg(countDistinct(col("u")).as("exact"),
        approx_count_distinct(col("u"), 0.05).as("est"))
      .collect()
    for (r <- rows) {
      val (exact, est) = (r.getAs[Long]("exact"), r.getAs[Long]("est"))
      assert(math.abs(est - exact).toDouble / exact <= 4 * 0.05,
        s"group ${r.get(0)}: est $est vs exact $exact exceeds 4·rsd")
    }
  }

  test("q136 chunking: boundary contract (W=40, S=30) — counts and coverage") {
    val dir = java.nio.file.Files.createTempDirectory("chunk_fx").toString
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    Seq((1L, words(40), "s"), (2L, words(41), "s"), (3L, words(100), "s"),
        (4L, words(3), "s"))
      .toDF("doc_id", "text", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = QueriesCorpus.q136RagChunks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def doc(id: Long) = rows.filter(_._1 == id).map(x => (x._2, x._3)).toSeq
    assert(doc(1) == Seq((0L, 40L)), "n == W ⇒ exactly one full chunk")
    assert(doc(2) == Seq((0L, 40L), (1L, 11L)),
      "n == W+1 ⇒ a second chunk from start S covering the tail (30..40)")
    assert(doc(3) == Seq((0L, 40L), (1L, 40L), (2L, 40L)),
      "n = 100 ⇒ starts 0/30/60, last ends exactly at n")
    assert(doc(4) == Seq((0L, 3L)), "short doc ⇒ one whole-doc chunk")
  }

  test("q137 EWMA: steady series never flags; a 2x level jump does") {
    val D = 24L * H
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    // steady: 1 event/day for 20 days → forecast 1.0, dev 0 everywhere
    for (d <- 0 until 20) rows += ((1L, "steady", d * D))
    // jump: 1/day for 15 days, then 2/day — the break day deviates 100%
    for (d <- 0 until 15) rows += ((2L, "jump", d * D))
    for (d <- 15 until 20; k <- 0 until 2)
      rows += ((2L, "jump", d * D + k * H))
    val dir = writeEventsFixture(rows.toSeq)
    val out = QueriesStream.q137EwmaMonitor(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val st = out("steady")
    assert(st.getAs[Long]("n_scored") == 19, "day 1 has no history to score")
    assert(st.getAs[Double]("max_abs_dev") == 0.0 &&
      st.getAs[Long]("n_flags") == 0L, s"steady must not flag: $st")
    val j = out("jump")
    assert(j.getAs[Long]("n_flags") >= 1, s"the 2x break must flag: $j")
    assert(j.getAs[Double]("max_abs_dev") >= 0.9,
      "break-day deviation is ~100% against the pre-break forecast")
    assert(j.getAs[Double]("last_forecast") > 1.2,
      "the forecast must have walked toward the new level")
  }

  test("q126 on a planted fixture: perfect correlation and anti-correlation") {
    // days where click tracks view exactly and error mirrors it
    val rows = (0 until 8).flatMap { d =>
      val base = 10.0 + d
      Seq((d, "view", base), (d, "click", 2 * base + 1),
        (d, "error", 100 - base), (d, "purchase", 5.0),
        (d, "signup", if (d % 2 == 0) 1.0 else 3.0))
    }
    val dir = java.nio.file.Files.createTempDirectory("corr_fx").toString
    rows.zipWithIndex.map { case ((d, t, v), i) =>
      (i.toLong, new Timestamp(1700000000000L + d * 24L * H), 1L, t, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = QueriesStream.q126CorrMatrix(spark, dir)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        Option(x.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    assert(r(("click", "view")).contains(1.0),
      s"affine metric must give r=1: $r")
    assert(r(("error", "view")).contains(-1.0),
      s"mirror must give r=-1: $r")
    assert(r(("purchase", "view")).isEmpty,
      s"constant metric has undefined correlation: $r")
  }
}
