package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ArtifactCache

/** The persisted-model-registry contract: learned artifacts (BPE merge
  * table, PQ codebooks) written as parquet fixtures must SERVE a
  * cold-cache consumer — the cross-JVM read path — with zero learning
  * jobs, and the loaded artifact must drive results identical to the
  * learned one (learning is deterministic, so load ≡ learn).
  */
class ArtifactRegistrySpec extends AnyFunSuite with SharedSpark {

  test("fixture-present cold cache serves q69/q73 without learning; load == learn") {
    val d = "/root/testdata/sf0.001"
    // pass 1: learns (or loads a prior round's fixture) and guarantees
    // the fixtures exist on disk for this corpus size
    val r69a = SparkEntry.queries("q69_bpe_tokenize")(spark, d).collect()
    val r73a = SparkEntry.queries("q73_pq_encode")(spark, d).collect()
    // simulate a fresh JVM: in-memory cache emptied, fixtures persist
    ArtifactCache.clear()
    val learnsBefore = ArtifactCache.learnCount
    val r69b = SparkEntry.queries("q69_bpe_tokenize")(spark, d).collect()
    val r73b = SparkEntry.queries("q73_pq_encode")(spark, d).collect()
    assert(ArtifactCache.learnCount == learnsBefore,
      "a fixture-served cold call must not run any learn body")
    assert(r69a.toSeq == r69b.toSeq, "BPE load path must equal learn path")
    assert(r73a.toSeq == r73b.toSeq, "PQ load path must equal learn path")
  }

  test("residual coarse + codebook fixtures serve q83 cold too") {
    val d = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("q83_residual_recall")(spark, d).collect()
    ArtifactCache.clear()
    // r19: q83's exact ground truth is an in-JVM derived frame served
    // by the registry (deterministic recompute, NOT a disk fixture) —
    // rebuild it outside the counted window so the zero-learn assertion
    // keeps pinning the codebook FIXTURES alone
    QueriesSim.sharedExactTopK(spark, d).count()
    val learnsBefore = ArtifactCache.learnCount
    val b = SparkEntry.queries("q83_residual_recall")(spark, d).collect()
    assert(ArtifactCache.learnCount == learnsBefore,
      "coarse + residual codebooks must both load from their fixtures")
    assert(a.toSeq == b.toSeq)
  }

  test("the SemDeDup clustering table serves q86 cold (r8 registry artifact)") {
    val d = "/root/testdata/sf0.001"
    // pass 1 builds (or loads) the clustering table fixture
    val a = SparkEntry.queries("q86_semantic_dedup")(spark, d).collect()
    ArtifactCache.clear()
    val learnsBefore = ArtifactCache.learnCount
    val b = SparkEntry.queries("q86_semantic_dedup")(spark, d).collect()
    assert(ArtifactCache.learnCount == learnsBefore,
      "a persisted clustering table must serve q86 with zero assignment learns")
    assert(a.toSeq == b.toSeq, "table-served dedup must equal the built one")
  }

  test("owned protocol: a same-rowcount corpus alternation re-learns instead of serving stale memory") {
    // two corpora with IDENTICAL lineitem row counts but different
    // content/dirs — the on-disk fixture subdir (keyed by count)
    // collides, which is exactly the A-B-A case the owner map closes:
    // after B's learn overwrites A's fixture, A's next access must
    // invalidate its memory hit and restore its own fixture (the
    // oracle globs the fixture by count and would otherwise read B's)
    val base = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dirA = java.nio.file.Files.createTempDirectory("aba_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("aba_b").toString
    base.write.mode("overwrite").parquet(s"$dirA/lineitem.parquet")
    base.withColumn("l_quantity",
        org.apache.spark.sql.functions.col("l_quantity") + 1.0)
      .write.mode("overwrite").parquet(s"$dirB/lineitem.parquet")
    val q = SparkEntry.queries("q116_quantile_bins_approx")
    val a1 = q(spark, dirA).collect().toSeq
    val learnsAfterA = ArtifactCache.learnCount
    // same-dir re-access: memory hit, zero learns
    assert(q(spark, dirA).collect().toSeq == a1)
    assert(ArtifactCache.learnCount == learnsAfterA,
      "a same-dir re-access must serve from memory without learning")
    // B learns (same row count, different dir) and overwrites the fixture
    val b1 = q(spark, dirB).collect().toSeq
    assert(b1 != a1, "the nudged corpus must bin differently")
    // A again: the owner mismatch must force a re-learn that restores
    // A's fixture — identical output, learnCount strictly up
    val learnsBeforeA2 = ArtifactCache.learnCount
    val a2 = q(spark, dirA).collect().toSeq
    assert(a2 == a1, "restored artifact must reproduce A's bins")
    assert(ArtifactCache.learnCount > learnsBeforeA2,
      "the foreign overwrite must invalidate A's memory hit")
  }

  test("owned protocol: an owner flip evicts ALL key families of the fixture dir") {
    // some fixture dirs host multiple key families (sq8/sq8even,
    // pqcoarse/pqcoarseeven). The A-B-A hazard: B's overwrite is
    // noticed by family 1's access (owner flips B→A, family 1
    // re-learns), but if only the CALLER's key were evicted, family
    // 2's next access would see a matching owner and serve A's stale
    // memory value against B's on-disk fixture. The owner flip must
    // evict every key ever registered under the dir.
    val dir = s"memdir://multifam-${System.nanoTime()}"
    var gen = 0
    def access(key: String, owner: String): String = {
      gen += 1
      val fresh = s"$key-$owner-g$gen" // unique per actual learn
      ArtifactCache.getOrLoadOrLearnOwned[String](key, dir, owner)(None)(fresh)
    }
    val f1a = access("fam1", "A")
    val f2a = access("fam2", "A")
    // steady state: same owner serves from memory
    assert(access("fam1", "A") == f1a)
    assert(access("fam2", "A") == f2a)
    // B arrives via family 1 ONLY — the flip must also evict fam2
    val f1b = access("fam1", "B")
    assert(f1b != f1a, "owner flip must re-learn the touched family")
    // A returns via family 1 (owner flips back to A)
    val f1a2 = access("fam1", "A")
    assert(f1a2 != f1b)
    // family 2 now sees a MATCHING owner — it must still have been
    // evicted at one of the two flips, not served stale from A's era
    val f2a2 = access("fam2", "A")
    assert(f2a2 != f2a,
      "family 2 must re-learn after the dir's owner flipped, not serve " +
        "the pre-flip memory value")
  }

  test("the GK extent/bin-cut fixtures serve q94/q116 cold (r14 registry artifacts)") {
    val d = "/root/testdata/sf0.001"
    // pass 1 learns the sketch artifacts (or loads a prior round's)
    val a94 = SparkEntry.queries("q94_extents_approx")(spark, d).collect()
    val a116 = SparkEntry.queries("q116_quantile_bins_approx")(spark, d).collect()
    ArtifactCache.clear()
    val learnsBefore = ArtifactCache.learnCount
    val b94 = SparkEntry.queries("q94_extents_approx")(spark, d).collect()
    val b116 = SparkEntry.queries("q116_quantile_bins_approx")(spark, d).collect()
    assert(ArtifactCache.learnCount == learnsBefore,
      "persisted GK quantiles/cuts must serve both queries with zero " +
        "sketch learns — the oracle applies the same fixtures")
    assert(a94.toSeq == b94.toSeq, "extent serve must equal learn pass")
    assert(a116.toSeq == b116.toSeq, "bin serve must equal learn pass")
  }

  test("the SQ8 ranges + code table serve q88/q90 cold (r9 registry artifacts)") {
    val d = "/root/testdata/sf0.001"
    // pass 1 builds (or loads) the ranges fixture and the code table
    val a88 = SparkEntry.queries("q88_sq8_encode")(spark, d).collect()
    val a90 = SparkEntry.queries("q90_ivfsq_topk")(spark, d).collect()
    ArtifactCache.clear()
    val learnsBefore = ArtifactCache.learnCount
    val b88 = SparkEntry.queries("q88_sq8_encode")(spark, d).collect()
    val b90 = SparkEntry.queries("q90_ivfsq_topk")(spark, d).collect()
    assert(ArtifactCache.learnCount == learnsBefore,
      "ranges + code table + coarse + residual codes must all load from " +
        "their fixtures — q90 serving runs zero learn/encode jobs")
    assert(a88.toSeq == b88.toSeq, "stored codes must equal a re-encode")
    assert(a90.toSeq == b90.toSeq, "table-served IVF-SQ must equal built")
  }
}
