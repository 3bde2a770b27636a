package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Distinct-key scaling instrument for the fuzzy join family (J6) —
  * the SURVEY §6.1 "measured in their own dimension" companion. The
  * fuzzy join's scaling dimension is DISTINCT KEYS, not fact rows (the
  * key-level dedupe before shingling is the operator's contract), so
  * the fact-table scale-up says nothing about it; this main synthesizes
  * a controlled corpus at each key count and measures the Jaccard face
  * end to end, plus the candidate-stage internals the prefix filter is
  * supposed to shrink.
  *
  * Corpus: CONSTANT-DF names — 8 synthetic 4-letter tokens per key,
  * drawn from a vocabulary that scales with the key count
  * (V = n·8/20), so every token's — and hence every char-3-gram's —
  * document frequency concentrates around ~20 at EVERY scale. That is
  * the regime the operator is built for: grams sit in the df ∈
  * [2, maxDf] band (neither the df-1 drop nor the hot-gram prune
  * deletes them), the candidate equi-join's fan-out per gram is
  * bounded, total candidates grow LINEARLY with keys, and the PPJoin
  * prefix has real work at every scale (~16 surviving grams per key
  * against a ⌊(1−τ)|g|⌋+1 ≈ 11 prefix at τ = 0.7 — the entity-match
  * threshold; at τ = 0.5 the bound is half the key and never binds on
  * ~35-gram keys). A fixed vocabulary would instead drift df past
  * maxDf as n grows and silently degrade the fixture into a sparse
  * boundary-gram match — measured r13: a digit-suffix corpus leaves
  * ~2.6 surviving grams/key, the prefix bound never binds, and
  * candidate growth is collision-quadratic.
  * Feed side: every 7th key with one character dropped at a
  * key-dependent position (the q113 rule) — true pairs sit at
  * J ≈ 0.85, token-sharing noise pairs far below τ.
  *
  * Per run it reports, as one JSON line: post-prune exploded gram rows
  * per side (what actually enters the equi-join), distinct candidate
  * pairs entering verify, verified match rows, and the warm
  * end-to-end wall (untimed warm run, then min of two — the OneQ
  * protocol, same local[4] harness). Flags: `prefix` (PPJoin prefix
  * on/off — off only at the smaller counts, to price the prefix) and
  * `bdf` (df-table broadcast vs shuffle — the documented
  * large-key-space fallback, exercised at 640k).
  *
  * Usage: runMain graft.FuzzyScale [n ...]   (default 6400 64000 640000)
  */
object FuzzyScale {

  private val FzTau = 0.7
  private val FzMaxDf = 50
  private val TokensPerKey = 8
  private val TargetDf = 20

  /** Gram width must TRACK the key space (the fuzzy-join analog of the
    * LSH `bitsPerBand ≈ log₂(n)` rule): the instrument needs
    * 26^k ≳ n·40/15 so ~40 gram instances per key land at ~15 mean df
    * — with a FIXED k the gram alphabet saturates as keys grow
    * (measured r13: 64k keys at k = 3 put 2.2M instances on the
    * 17 576-trigram space, mean df 127 ≫ maxDf, and the df-prune
    * deletes every discriminative gram). 6.4k → 3, 64k → 4, 640k → 5.
    */
  private def kFor(n: Long): Int =
    (3 to 7).find(k => math.pow(26, k) >= n * 40.0 / 15).getOrElse(8)

  private val letters = typedLit(('a' to 'z').map(_.toString))

  /** n names of TokensPerKey (k+1)-letter tokens over a vocabulary of
    * n·TokensPerKey/TargetDf token ids — tokens one char wider than
    * the gram so each contributes interior k-grams at token df. Ids
    * are SCRAMBLED bijectively across the full 26^(k+1) render space
    * before base-26 rendering (odd multiplier coprime to the space) —
    * naive rendering would park a small vocabulary in a corner of gram
    * space (high digits constant) and every gram would go hyper-hot
    * regardless of the df target.
    */
  private def corpus(s: SparkSession, n: Long, k: Int): DataFrame = {
    val tokLen = k + 1
    val vocab = math.max(26L, n * TokensPerKey / TargetDf)
    val space = (0 until tokLen).foldLeft(1L)((a, _) => a * 26L)
    def tokenOf(idx: Column): Column = {
      val sc = pmod(idx * lit(1566083941L), lit(space))
      concat((0 until tokLen).map { j =>
        val div = (0 until j).foldLeft(1L)((a, _) => a * 26L)
        element_at(letters, (pmod(sc / div, lit(26)) + 1).cast("int"))
      }: _*)
    }
    def pick(seed: Int): Column =
      tokenOf(pmod(hash(col("id"), lit(seed)).cast("long"), lit(vocab)))
    s.range(n).select(col("id"),
      concat_ws(" ", (1 to TokensPerKey).map(pick): _*).as("name"))
  }

  private def feedOf(c: DataFrame): DataFrame =
    c.where(col("id") % 7 === 0)
      .select(expr(
        "concat(substr(name, 1, (id % 5 + 2) - 1), " +
          "substr(name, (id % 5 + 2) + 1))").as("feed_name"))

  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(6400L, 64000L, 640000L)
    // default local[4] (the documented harness); FUZZY_CORES=16 is the
    // partition-parallelism probe — the 640k wall is claimed to be a
    // partition-count knob, and a cores sweep is the evidence
    val cores = sys.env.getOrElse("FUZZY_CORES", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", 100000)
      .config("spark.sql.shuffle.partitions", cores.toString)
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
      val k = kFor(n)
      val cat = corpus(spark, n, k).select("name").localCheckpoint()
      val feed = feedOf(corpus(spark, n, k)).localCheckpoint()

      val stage = Joins.fuzzyCandidates(cat, feed, "name", "feed_name",
        k, FzMaxDf, jaccardPrefix, broadcastDf = bdf, usePrefix = prefix)
      val gramL = stage.prunedL.count()
      val gramR = stage.prunedR.count()
      val candidates = stage.cand.count()

      def once(): Double = {
        val t0 = System.nanoTime()
        Joins.fuzzyKeyJoin(cat, feed, "name", "feed_name",
            k, FzTau, FzMaxDf, broadcastDf = bdf, usePrefix = prefix)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val matches = Joins.fuzzyKeyJoin(cat, feed, "name", "feed_name",
        k, FzTau, FzMaxDf, broadcastDf = bdf, usePrefix = prefix).count()
      once() // warm (janino + df-table build)
      val wall = math.min(once(), once())
      println(f"""{"n":$n,"k":$k,"prefix":$prefix,"bdf":$bdf,""" +
        f""""gram_rows":[$gramL,$gramR],"candidates":$candidates,""" +
        f""""matches":$matches,"wall_s":$wall%.2f}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
