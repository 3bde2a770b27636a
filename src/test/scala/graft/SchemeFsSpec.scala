package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A Hadoop FileSystem registered under a FOREIGN scheme (`mock://`,
  * backed by local disk). RawLocalFileSystem resolves the path part of
  * the URI, so `mock:///tmp/x` reads and writes `/tmp/x`.
  */
class MockSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
}

/** The s3a seam, proven offline: the deployment sink
  * ([[graft.sinks.TileBuild.writePbfDirectory]] — the tree the
  * reference `aws s3 sync`s, `build.sh:222-228`) and the tree scan
  * ([[graft.Incremental.readPbfTree]]) must work against ANY Hadoop
  * FileSystem scheme the session configures, because that is exactly
  * what pointing them at `s3a://bucket/...` is — a scheme→impl mapping
  * plus credentials, no engine code. The sandbox has no object store,
  * so the spec registers a foreign `mock://` scheme (local-disk
  * backed) and drives the full write → read-back → byte-parity loop
  * through it. A writer that silently assumed `java.io` local paths —
  * what this sink did before r17 — fails here with "No FileSystem for
  * scheme: mock".
  */
class SchemeFsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("pbf tree writes and reads through a foreign FileSystem scheme") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock.impl", classOf[MockSchemeFs].getName)
    val tiles = Seq(
      (8, 41L, 97L, Array[Byte](1, 2, 3)),
      (8, 41L, 98L, Array[Byte](4, 5)),
      (9, 82L, 195L, Array.tabulate[Byte](4096)(_.toByte))
    ).toDF("z", "x", "y", "tile_bytes")

    val base = Files.createTempDirectory("schemefs").toString
    graft.sinks.TileBuild.writePbfDirectory(tiles, s"mock://$base/tree",
      Map("name" -> "schemed"))

    // the bytes landed on the backing store, at the exact layout, with
    // no checksum sidecars polluting the deployable tree
    assert(Files.readAllBytes(Paths.get(s"$base/tree/8/41/97.pbf")).toSeq ==
      Seq[Byte](1, 2, 3))
    assert(Files.exists(Paths.get(s"$base/tree/metadata.json")))
    val walked = Files.walk(Paths.get(base)).iterator()
    while (walked.hasNext) {
      val f = walked.next().toString
      assert(!f.endsWith(".crc"), s"checksum sidecar in the tree: $f")
    }

    // and the engine reads its own tree back THROUGH the scheme —
    // readPbfTree is a Spark binaryFile scan, so this also proves the
    // scan side of the seam
    val back = Incremental.readPbfTree(spark, s"mock://$base/tree")
      .collect()
      .map(r => (r.getAs[Int]("z"), r.getAs[Long]("x"), r.getAs[Long]("y")) ->
        r.getAs[Array[Byte]]("tile_bytes").toSeq).toMap
    val in = tiles.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) ->
        r.getAs[Array[Byte]](3).toSeq).toMap
    assert(back == in, "scheme round-trip must be byte-exact")
  }

  test("local writes are byte-identical to the pre-FS-API layout") {
    val tiles = Seq((3, 1L, 2L, Array[Byte](9, 8, 7)))
      .toDF("z", "x", "y", "tile_bytes")
    val dir = Files.createTempDirectory("plainfs").toString
    graft.sinks.TileBuild.writePbfDirectory(tiles, s"$dir/t", Map("k" -> "v"))
    assert(Files.readAllBytes(Paths.get(s"$dir/t/3/1/2.pbf")).toSeq ==
      Seq[Byte](9, 8, 7))
    val meta = new String(
      Files.readAllBytes(Paths.get(s"$dir/t/metadata.json")), "UTF-8")
    assert(meta.contains("\"k\": \"v\"") && meta.contains("\"format\": \"pbf\""))
    val walked = Files.walk(Paths.get(dir)).iterator()
    while (walked.hasNext) {
      val f = walked.next().toString
      assert(!f.endsWith(".crc"), s"checksum sidecar in the tree: $f")
    }
  }
}
