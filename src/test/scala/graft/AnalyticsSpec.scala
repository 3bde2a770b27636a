package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

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
}
