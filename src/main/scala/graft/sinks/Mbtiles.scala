package graft.sinks

import java.io.{File, RandomAccessFile}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Sqlite._

/** MBTiles 1.3 sink — the sqlite container the reference's tippecanoe
  * emits (`build.sh:129-134,155-160`) and `tile-join` consumes
  * (`:189,210,214`), written directly in the public SQLite file
  * format ([[Sqlite]]) because no JDBC driver resolves offline. This
  * closes the deviation SURVEY §1.4/§8 carried since r7: the engine
  * now ships BOTH deployment formats — the `z/x/y.pbf` tree
  * (`build.sh:220`, what actually deploys) and the `.mbtiles`
  * intermediate the reference's tooling exchanges.
  *
  * Schema (MBTiles 1.3):
  *   CREATE TABLE metadata (name text, value text);
  *   CREATE TABLE tiles (zoom_level integer, tile_column integer,
  *                       tile_row integer, tile_data blob);
  *   CREATE UNIQUE INDEX tile_index on tiles (zoom_level,
  *                       tile_column, tile_row);
  * `tile_row` is TMS (south-origin): row = 2^z − 1 − y for the XYZ y
  * the tile builders emit.
  *
  * Single-writer by nature — an MBTiles file IS one sqlite database,
  * the same constraint tippecanoe has; rows stream through
  * `toLocalIterator` ordered (z, x, row), so driver memory holds one
  * partition of tile rows at a time, never the tileset. The pbf
  * directory stays the scale path for serving; this sink exists for
  * tool-compatibility with the reference's ecosystem.
  */
object Mbtiles {

  def writeMbtiles(tiles: DataFrame, path: String,
                   metadata: Map[String, String]): Unit = {
    val f = new File(path)
    if (f.exists) f.delete()
    Option(f.getParentFile).foreach(_.mkdirs())
    val raf = new RandomAccessFile(f, "rw")
    try {
      val sink = new Sink(raf)
      val metaB = new TableBuilder(sink)
      metadata.toSeq.sortBy(_._1).zipWithIndex.foreach { case ((k, v), i) =>
        metaB.addRow(i + 1L, record(Seq(SqlText(k), SqlText(v))))
      }
      val metaRoot = metaB.finish()

      val tilesB = new TableBuilder(sink)
      val idxB = new IndexBuilder(sink)
      // index order is (z, x, tile_row) ascending; tile_row = 2^z-1-y
      // reverses y within (z, x), hence the y DESCENDING sort
      val it = tiles
        .select(col("z").cast("long").as("z"), col("x").cast("long").as("x"),
          col("y").cast("long").as("y"), col("tile_bytes"))
        .orderBy(col("z"), col("x"), col("y").desc)
        .toLocalIterator()
      var rowid = 0L
      while (it.hasNext) {
        val r = it.next()
        rowid += 1
        val z = r.getLong(0); val x = r.getLong(1); val y = r.getLong(2)
        val row = (1L << z) - 1L - y
        val bytes = r.getAs[Array[Byte]]("tile_bytes")
        tilesB.addRow(rowid,
          record(Seq(SqlInt(z), SqlInt(x), SqlInt(row), SqlBlob(bytes))))
        idxB.addEntry(
          record(Seq(SqlInt(z), SqlInt(x), SqlInt(row), SqlInt(rowid))))
      }
      val tilesRoot = tilesB.finish()
      val idxRoot = idxB.finish()
      sink.patchPage1(buildPage1(sink.nPages, Seq(
        ("table", "metadata", "metadata", metaRoot,
          "CREATE TABLE metadata (name text, value text)"),
        ("table", "tiles", "tiles", tilesRoot,
          "CREATE TABLE tiles (zoom_level integer, tile_column integer, " +
            "tile_row integer, tile_data blob)"),
        ("index", "tile_index", "tiles", idxRoot,
          "CREATE UNIQUE INDEX tile_index on tiles (zoom_level, " +
            "tile_column, tile_row)"))))
    } finally raf.close()
  }
}
