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

  test("second serving pass is registry-served and identical") {
    val a = QueriesSim.all("q104_index_compaction")(spark, d).collect().toSeq
    val learnsBefore = graft.operators.ArtifactCache.learnCount
    val b = QueriesSim.all("q104_index_compaction")(spark, d).collect().toSeq
    assert(graft.operators.ArtifactCache.learnCount == learnsBefore,
      "re-serving must not re-learn any artifact")
    assert(a == b)
  }
}
