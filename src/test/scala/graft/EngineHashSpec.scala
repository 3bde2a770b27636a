package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.operators.TextStats
import graft.operators.TextStats.HashMode

/** Engine-hash mode (md5 oracle parity vs xxhash64 deployment): swapping
  * the hash engine must change hash VALUES but not dedup STRUCTURE —
  * the same documents group, pair, and fingerprint-collide either way.
  */
class EngineHashSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  /** documents plus exact duplicates (normalize-identical). */
  private def exactCorpus: DataFrame = {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    docs.unionByName(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(upper(col("text")), lit("  ")).as("text")))
  }

  /** documents plus near duplicates (appended 5-word tail). */
  private def nearCorpus: DataFrame = {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" extra tail noise appended here")).as("text")))
  }

  test("exact dedup: identical grouping under md5 and xxhash64") {
    def structure(mode: HashMode): Seq[(Long, Long)] =
      Dedup.exactDedup(exactCorpus, "text", "doc_id", mode)
        .select("keep_id", "n_copies").orderBy("keep_id")
        .as[(Long, Long)].collect().toSeq
    val md5S = structure(HashMode.OracleMd5)
    val xxS = structure(HashMode.EngineXx)
    assert(md5S == xxS, "exact-dup groups must not depend on the hash engine")
    // the injected duplicates are actually found
    assert(md5S.count(_._2 == 2) == exactCorpus.count() -
      Tables.documents(spark, d).count())
  }

  test("minhash-LSH: duplicate-pair structure identical under both engines") {
    // LSH recall < 1 by design for sub-1.0 jaccard in EITHER hash family,
    // so the deterministic cross-engine claim is about jaccard-1 pairs:
    // identical shingle sets hash to identical signatures, so every band
    // collides — a j=1 pair is a candidate with probability 1 in ANY
    // mode. exactCorpus's injected duplicates are j=1 after
    // normalization.
    def j1Pairs(mode: HashMode): Set[(Long, Long)] = {
      val base = exactCorpus
        .withColumn("sh", Dedup.hashedWordShingles("text", 3, mode))
        .select(col("doc_id"), col("sh"))
        .cache()
      val withSig = Dedup.minhashSignature(col("sh"), 12)
        .foldLeft(base) { case (df, (n, c)) => df.withColumn(n, c) }
      val withBuckets = withSig
        .withColumn("buckets", Dedup.lshBuckets(4, 3, mode))
      val out = Dedup.lshCandidatePairs(withBuckets, "doc_id")
        .join(base.select(col("doc_id").as("a"), col("sh").as("sa")), "a")
        .join(base.select(col("doc_id").as("b"), col("sh").as("sb")), "b")
        .filter(Dedup.jaccard(col("sa"), col("sb")) === 1.0)
        .select("a", "b").as[(Long, Long)].collect().toSet
      base.unpersist()
      out
    }
    val md5P = j1Pairs(HashMode.OracleMd5)
    val xxP = j1Pairs(HashMode.EngineXx)
    val injected = exactCorpus.filter(col("doc_id") >= 100000)
      .select((col("doc_id") - 100000).as("a"), col("doc_id").as("b"))
      .as[(Long, Long)].collect().toSet
    assert(injected.subsetOf(md5P), "md5 mode must find every j=1 pair")
    assert(injected.subsetOf(xxP), "xx mode must find every j=1 pair")
    assert(md5P == xxP,
      s"pair structure diverged: only-md5=${md5P -- xxP} only-xx=${xxP -- md5P}")
  }

  test("CM sketch: algebra is hash-mode-free; only cell layout moves") {
    // q147 (md5 oracle mode) vs q152 (xxhash64 deployment mode): the
    // sketch GUARANTEES — per-row mass conservation, one-sided error
    // against the exact counts, mergeability — must hold identically,
    // while the cell arrays themselves differ (the hash really moved)
    import graft.functions.CountMinSketchAgg
    val (dd, w) = (3, 97)
    val words = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
    val n = words.count()
    val exact = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cellsByMode = Seq(false, true).map { xx =>
      val cells = words
        .agg(CountMinSketchAgg.cm(col("w"), lit(1L), dd, w, xx).as("c"))
        .select(col("c")).as[Seq[Long]].head()
      (0 until dd).foreach { r =>
        assert(cells.slice(r * w, (r + 1) * w).sum == n,
          s"xx=$xx row $r mass")
      }
      exact.foreach { case (word, cnt) =>
        val (h1, h2) =
          if (xx) CountMinSketchAgg.hashPairXx(word.getBytes("UTF-8"))
          else CountMinSketchAgg.hashPair(word.getBytes("UTF-8"))
        val est = (0 until dd)
          .map(r => cells(r * w + CountMinSketchAgg.bucket(h1, h2, r, w))).min
        assert(est >= cnt, s"xx=$xx: CM may never underestimate '$word'")
      }
      cells
    }
    assert(cellsByMode.head != cellsByMode.last,
      "the two modes must actually hash differently")
  }

  test("fingerprint: exact-duplicate texts collide in both modes, distinct don't") {
    for (mode <- Seq[HashMode](HashMode.OracleMd5, HashMode.EngineXx)) {
      val fp = TextStats.fingerprint("text", k = 8, mode = mode)
        .foldLeft(exactCorpus) { case (df, (n, c)) => df.withColumn(n, c) }
      val groups = fp.groupBy("fp_md5", "fp_min", "fp_max")
        .agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
      val nDocs = Tables.documents(spark, d).count()
      val nDups = exactCorpus.count() - nDocs
      assert(groups.filter(col("n") === 2).count() == nDups, s"mode=$mode")
      assert(groups.count() == nDocs, s"mode=$mode")
    }
  }
}
