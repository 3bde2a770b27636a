package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Distinct-key scaling instrument for the fuzzy join family (J6) —
  * the SURVEY §6.1 "measured in their own dimension" companion. The
  * fuzzy join's scaling dimension is DISTINCT KEYS, not fact rows (the
  * key-level dedupe before shingling is the operator's contract), so
  * the fact-table scale-up says nothing about it; this main synthesizes
  * a suffixed-name corpus at a controlled distinct-key count and
  * measures the Jaccard face end to end, plus the candidate-stage
  * internals the prefix filter is supposed to shrink.
  *
  * Corpus shape mirrors the q113 fixture (QueriesRel.scala): catalog
  * names drawn word-wise from a small vocabulary (shared grams — the
  * adversarial part: every word is hot across thousands of keys) with a
  * per-key numeric suffix (distinctness), and a feed side of every 7th
  * key with one character dropped at a key-dependent position. Matching
  * pairs sit at Jaccard ≈ 0.6–0.8; unrelated same-word keys at ≈ 0.3.
  *
  * Per key count N it reports, as one JSON line:
  *  - `gram_rows`: post-prune exploded gram rows per side (the prefix
  *    filter's direct output — what actually enters the equi-join);
  *  - `candidates`: distinct candidate pairs entering verify;
  *  - `matches`: verified result rows;
  *  - `wall_s`: warm end-to-end wall (untimed warm run, then min of
  *    two timed runs — the OneQ protocol, same local[4] harness).
  *
  * Flags per run: `prefix` (PPJoin prefix on/off — off only at the
  * smaller counts, to quantify what the prefix buys) and `bdf`
  * (df-table broadcast vs shuffle — the documented large-key-space
  * fallback, exercised at 640k where the repeated-gram vocabulary
  * outgrows a broadcast-sized table).
  *
  * Usage: runMain graft.FuzzyScale [n ...]   (default 6400 64000 640000)
  */
object FuzzyScale {

  private val FzK = 3
  private val FzTau = 0.5
  private val FzMaxDf = 50

  // q113's vocabulary class: ~small word pool, so grams repeat across
  // thousands of keys and the df-prune/prefix actually have work to do
  private val words = Seq(
    "almond", "antique", "aquamarine", "azure", "beige", "bisque",
    "blanched", "blush", "burlywood", "burnished", "chartreuse",
    "chiffon", "chocolate", "coral", "cornflower", "cream", "cyan",
    "dark", "deep", "dim", "dodger", "drab", "firebrick", "floral",
    "forest", "frosted", "gainsboro", "ghost", "goldenrod", "green",
    "grey", "honeydew", "hot", "indian", "ivory", "khaki", "lace",
    "lavender", "lawn", "lemon", "light", "lime", "linen", "magenta",
    "maroon", "medium", "metallic", "midnight", "mint", "misty",
    "moccasin", "navajo", "navy", "olive", "orange", "orchid", "pale",
    "papaya", "peach", "peru", "pink", "plum", "powder", "puff",
    "rose", "rosy", "royal", "saddle", "salmon", "sandy", "seashell",
    "sienna", "sky", "slate", "smoke", "snow", "spring", "steel",
    "tan", "thistle", "tomato", "turquoise", "violet", "wheat",
    "white", "yellow")

  /** N distinct names: three vocabulary words + "#id" suffix. */
  private def corpus(s: SparkSession, n: Long): DataFrame = {
    val w = typedLit(words)
    def pick(seed: Int): Column =
      element_at(w, (pmod(hash(col("id"), lit(seed)), lit(words.size)) + 1)
        .cast("int"))
    s.range(n).select(col("id"),
      concat_ws(" ", pick(1), pick(2), pick(3),
        concat(lit("#"), col("id"))).as("name"))
  }

  private def feedOf(c: DataFrame): DataFrame =
    c.where(col("id") % 7 === 0)
      .select(expr(
        "concat(substr(name, 1, (id % 5 + 2) - 1), " +
          "substr(name, (id % 5 + 2) + 1))").as("feed_name"))

  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(6400L, 64000L, 640000L)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", 100000)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the same PPJoin bound fuzzyKeyJoin installs for its tau
    val jaccardPrefix: Column => Column =
      n => (floor(lit(1.0 - FzTau + 1e-6) * n) + 1).cast("int")

    for (n <- ns; prefix <- Seq(true, false)
         // prefix-off exists to price the prefix, not to scale: skip it
         // at 640k where the unpruned equi-join is the known wall
         if prefix || n <= 64000) {
      val bdf = n <= 64000
      val cat = corpus(spark, n).select("name").localCheckpoint()
      val feed = feedOf(corpus(spark, n)).localCheckpoint()

      val stage = Joins.fuzzyCandidates(cat, feed, "name", "feed_name",
        FzK, FzMaxDf, jaccardPrefix, broadcastDf = bdf, usePrefix = prefix)
      val gramL = stage.prunedL.count()
      val gramR = stage.prunedR.count()
      val candidates = stage.cand.count()

      def once(): Double = {
        val t0 = System.nanoTime()
        Joins.fuzzyKeyJoin(cat, feed, "name", "feed_name",
            FzK, FzTau, FzMaxDf, broadcastDf = bdf, usePrefix = prefix)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val matches = Joins.fuzzyKeyJoin(cat, feed, "name", "feed_name",
        FzK, FzTau, FzMaxDf, broadcastDf = bdf, usePrefix = prefix).count()
      once() // warm (janino + df-table build)
      val wall = math.min(once(), once())
      println(f"""{"n":$n,"prefix":$prefix,"bdf":$bdf,""" +
        f""""gram_rows":[$gramL,$gramR],"candidates":$candidates,""" +
        f""""matches":$matches,"wall_s":$wall%.2f}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
