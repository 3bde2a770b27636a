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

  test("q108 serve path consumes a streamed parquet registry, not the stand-in rule") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // delete a DIFFERENT id set than q108's oracle stand-in (%17 rule):
    // if the serve path secretly depended on the rule instead of the
    // registry rows, this fixture would expose it
    val delIds = spark.read.parquet(s"$d/embeddings.parquet")
      .where(expr("vec_id % 23 = 3")).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(delIds.nonEmpty)
    // accumulate the registry the way a deployment does: delete events
    // through tombstoneStream into a PARQUET sink
    val tmp = java.nio.file.Files.createTempDirectory("tombreg").toString
    val stream = MemoryStream[StreamingSpec.Doc]
    val q = graft.streaming.Streaming
      .tombstoneStream(stream.toDF(), "doc_id", "ts", "10 minutes")
      .writeStream.format("parquet")
      .option("path", s"$tmp/registry")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append()).start()
    try {
      val t0 = 1700000000000L
      stream.addData(delIds.map(id => StreamingSpec.Doc(id, "",
        new java.sql.Timestamp(t0))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val registry = spark.read.parquet(s"$tmp/registry")
    assert(registry.columns.toSeq == Seq("del_id"))
    assert(registry.count() == delIds.length)
    // serve q108's path over the streamed registry table
    val served = QueriesSim.sqServeTopK(spark, d,
      QueriesSim.tombstoneFilteredWith(spark, d, registry)).collect().toSeq
    assert(served.nonEmpty)
    assert(served.forall(r => r.getAs[Long]("id") % 23 != 3),
      "a streamed-registry-deleted id surfaced in serving results")
    // the fixture excluded someone q104 (no deletes) would have served
    val noDeletes = QueriesSim.all("q104_index_compaction")(spark, d)
      .collect().toSeq
    assert(served != noDeletes,
      "streamed registry excluded no served candidate — fixture too weak")
    // registry-content-only dependence: a plain local table of the same
    // ids serves identically to the streamed parquet table
    val plain = delIds.toDF("del_id")
    val viaPlain = QueriesSim.sqServeTopK(spark, d,
      QueriesSim.tombstoneFilteredWith(spark, d, plain)).collect().toSeq
    assert(served == viaPlain,
      "serve must depend only on registry rows, not their provenance")
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
