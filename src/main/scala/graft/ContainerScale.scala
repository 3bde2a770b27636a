package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `.mbtiles` container economics at 10× the national tile count —
  * the r15 verdict's open decision: [[Incremental.incrementalRegion]]
  * updates the pbf tree in place (IO ∝ delta), but the container sink
  * only FULL-REWRITES. Is that acceptable as the tileset grows, or
  * does the container need affected-leaf surgery?
  *
  * This main measures the full rewrite + distributed read-back at a
  * parameterized tile count and byte volume (defaults: 193,770 tiles ×
  * ~87 KB avg ≈ 16.9 GB — ten times the measured national block-groups
  * container, same average tile size). Tile bytes are deterministic
  * hash-derived filler (container IO cost depends on bytes, not
  * content); sizes vary ±45% around the average like real tiles do.
  *
  * The decision rule this informs: the container is a tool-compat
  * EXPORT, not the serving tree — if a nightly full rewrite at 10×
  * national stays in single-digit minutes (throughput roughly flat vs
  * the 1.69 GB point, i.e. the writer is bytes-bound, not
  * tiles-bound), full-rewrite-as-contract is correct and leaf surgery
  * is complexity without a payoff.
  *
  * Usage: runMain graft.ContainerScale [nTiles] [avgKb] [outBase]
  *        defaults: 193770 87 /tmp/containerscale
  */
object ContainerScale {

  def main(args: Array[String]): Unit = {
    val nTiles = args.lift(0).map(_.toLong).getOrElse(193770L)
    val avgKb = args.lift(1).map(_.toInt).getOrElse(87)
    val outBase = args.lift(2).getOrElse("/tmp/containerscale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // unique (z,x,y) on one zoom plane; size_i deterministic in
    // [0.55, 1.45]×avg; bytes = a 64-char digest repeated to size
    // (content-free filler — the writer streams bytes, it never parses)
    val z = 12
    val tiles = spark.range(nTiles)
      .withColumn("z", lit(z))
      .withColumn("x", col("id") % (1 << z))
      .withColumn("y", col("id") / (1 << z))
      .withColumn("size",
        (lit(avgKb * 1024 * 0.55) +
          pmod(xxhash64(col("id")), lit(1000)) / 1000.0 *
            lit(avgKb * 1024 * 0.9)).cast("int"))
      .withColumn("tile_bytes",
        expr("cast(repeat(sha2(cast(id as string), 256), " +
          "int(ceil(size / 64.0))) as binary)"))
      .select("z", "x", "y", "tile_bytes")

    val db = s"$outBase/scale.mbtiles"
    val t0 = System.nanoTime()
    graft.sinks.Mbtiles.writeMbtiles(tiles, db,
      Map("name" -> "containerscale", "format" -> "pbf"))
    val writeWall = (System.nanoTime() - t0) / 1e9
    val bytes = new java.io.File(db).length()

    val t1 = System.nanoTime()
    val r = graft.sinks.Mbtiles.readMbtiles(spark, db)
      .selectExpr("count(*) AS n", "sum(length(tile_bytes)) AS b").head
    val readWall = (System.nanoTime() - t1) / 1e9
    require(r.getLong(0) == nTiles,
      s"read-back count ${r.getLong(0)} != $nTiles")

    val parts = graft.sinks.Mbtiles.readMbtiles(spark, db)
      .rdd.getNumPartitions
    println(f"""{"metric":"containerscale","tiles":$nTiles,""" +
      f""""container_gb":${bytes / 1e9}%.2f,""" +
      f""""write_wall":$writeWall%.1f,""" +
      f""""write_mbps":${bytes / 1e6 / writeWall}%.0f,""" +
      f""""read_wall":$readWall%.1f,""" +
      f""""read_mbps":${bytes / 1e6 / readWall}%.0f,""" +
      f""""read_partitions":$parts,"unit":"sec"}""")

    // the DEDUP-layout arm (r17, optional 4th arg "dedup"): national
    // tiles are ~all distinct, so this measures the layout's OVERHEAD
    // case — the id-indirection (map rows + images index + view) priced
    // on a tileset where it saves nothing. The number this produces is
    // the evidence FOR direct-by-default; MbtilesSpec's repeated-blob
    // fixture measures the payoff case the flag exists for.
    if (args.lift(3).contains("dedup")) {
      val db2 = s"$outBase/scale_dedup.mbtiles"
      val t2 = System.nanoTime()
      graft.sinks.Mbtiles.writeMbtiles(tiles, db2,
        Map("name" -> "containerscale", "format" -> "pbf"),
        dedupLayout = true)
      val dedupWall = (System.nanoTime() - t2) / 1e9
      val dedupBytes = new java.io.File(db2).length()
      val r2 = graft.sinks.Mbtiles.readMbtiles(spark, db2)
        .selectExpr("count(*) AS n").head
      require(r2.getLong(0) == nTiles,
        s"dedup read-back count ${r2.getLong(0)} != $nTiles")
      println(f"""{"metric":"containerscale_dedup","tiles":$nTiles,""" +
        f""""container_gb":${dedupBytes / 1e9}%.2f,""" +
        f""""overhead_frac":${dedupBytes.toDouble / bytes - 1.0}%.4f,""" +
        f""""write_wall":$dedupWall%.1f,""" +
        f""""write_mbps":${dedupBytes / 1e6 / dedupWall}%.0f,"unit":"sec"}""")
    }
    spark.stop()
  }
}
