package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q104 index compaction: delta rows become searchable through the
  * streamed append + merge, and the merged registry table serves
  * without rebuilding (load ≡ learn).
  */
class CompactionSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("compacted index serves both base and delta neighbors") {
    val out = QueriesSim.all("q104_index_compaction")(spark, d)
      .select($"qid", $"id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    val ids = out.map(_._2).toSet
    assert(ids.exists(_ % 2 == 0), "base (even) rows must be searchable")
    assert(ids.exists(_ % 2 != 0),
      "delta (odd) rows ingested through the streaming faces must be " +
        "searchable after compaction")
  }

  test("q108: tombstoned ids never surface; drop-at-compact ≡ filter-at-serve") {
    val out = QueriesSim.all("q108_tombstoned_serve")(spark, d)
      .collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("id") % 17 != 5),
      "a tombstoned id surfaced in serving results")
    // the runtime filter actually excluded someone: q104 (no deletes)
    // must differ from q108 on this fixture
    val withDeletes = QueriesSim.all("q104_index_compaction")(spark, d)
      .collect().toSeq
    assert(withDeletes != out,
      "tombstone fixture excluded no served candidate — rule too weak")
    // physical drop on merge: the rewritten registry holds exactly the
    // surviving rows, and serving from it with NO runtime filter is
    // identical to serve-time anti-join
    val tmp = java.nio.file.Files.createTempDirectory("compact108").toString
    val compacted = QueriesSim.compactDropTombstones(spark, d, s"$tmp/idx")
    assert(compacted.where(expr("nid % 17 = 5")).count() == 0,
      "compaction left a tombstoned row in the registry")
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    val t = spark.read.parquet(s"$d/embeddings.parquet")
      .where(expr("vec_id % 17 = 5")).count()
    assert(compacted.count() == n - t)
    val served = QueriesSim.sqServeTopK(spark, d, compacted).collect().toSeq
    assert(served == out, "drop-at-compact must serve identically to " +
      "filter-at-serve")
  }

  test("second serving pass is registry-served and identical") {
    val a = QueriesSim.all("q104_index_compaction")(spark, d).collect().toSeq
    val learnsBefore = graft.operators.ArtifactCache.learnCount
    val b = QueriesSim.all("q104_index_compaction")(spark, d).collect().toSeq
    assert(graft.operators.ArtifactCache.learnCount == learnsBefore,
      "re-serving must not re-learn any artifact")
    assert(a == b)
  }
}
