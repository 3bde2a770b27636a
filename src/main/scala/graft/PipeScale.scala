package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.config.EtlConfig
import graft.sources.Sources

/** The composed reference pipeline measured END-TO-END at the
  * reference's REAL largest input — the SURVEY §6 row the piecewise
  * fixtures never provided (r14 verdict item 1).
  *
  * The reference's biggest region is US block groups: ≈217k geoids ×
  * 19 years ≈ 4.1M long rows feeding a ~573-column pivot, two decade
  * tilesets at z8–10 choropleth / z0–10 bubble (`BASELINE.md:19-20`,
  * `build.sh:28,34-36,121-126,147-152`). This main synthesizes that
  * region deterministically, then times [[Pipeline.runRegion]] doing
  * everything the reference's `build.sh -e -t` does for it, as ONE
  * Spark job graph in one session:
  *
  *   long CSV → shape (pivot) → wide CSV artifact → extents CSV
  *   artifact → GeoJSON-lines geometry → polylabel interior points →
  *   per-decade [bubble tiles + choropleth tiles + layer merge + pbf
  *   tree]
  *
  * Synthesis (generate-once, hash-derived, no Random/now — SemScale
  * discipline):
  *  - geoids are an exact grid over the continental-US bbox, so
  *    choropleth polygons are grid cells that genuinely SHARE borders
  *    (the shared-border simplify path runs for real) and GEOIDs carry
  *    leading zeros (P10);
  *  - every (geoid, year, metric) cell is a deterministic function of
  *    xxhash64, ~3% empty (P8), ~2% of parent_location empty (P6).
  *
  * Protocol: one untimed small-n warm-up (janino/codegen), then TWO
  * timed full executions, each a complete cold pipeline over fresh
  * persists (features and wide caches released between runs — nothing
  * carries over but JIT state). Both walls print; min is the headline.
  *
  * Usage: runMain graft.PipeScale [nCells] [outBase]
  *        defaults: 217000 /tmp/pipescale
  */
object PipeScale {

  private val Bbox = (-124.0, 25.0, -67.0, 49.0) // continental US
  private val Years = (2000 to 2018).map(_.toString)

  /** Metric long-names in CSV column order (everything the raw map
    * knows except the id columns).
    */
  private[graft] val metricLongNames: Seq[String] =
    EtlConfig.columnMapRaw.map(_._1)
      .filterNot(Seq("id", "name", "parent_location").contains)

  /** Grid geometry for cell i of n: (x0, y0, x1, y1). */
  private def gridExprs(n: Long): (Int, Int) = {
    val (w, h) = (Bbox._3 - Bbox._1, Bbox._4 - Bbox._2)
    val cols = math.ceil(math.sqrt(n * (w / h))).toInt
    val rows = math.ceil(n.toDouble / cols).toInt
    (cols, rows)
  }

  /** Write the long CSV (if absent): n cells × 19 years, header, column
    * order = [[Sources.longSchema]](metricLongNames). `mutStep > 0`
    * bumps population for every `mutStep`-th cell — the "tonight's
    * delta" twin snapshot for the incremental-rebuild measurement.
    */
  private[graft] def genLongCsv(spark: SparkSession, n: Long, path: String,
                         mutStep: Long = 0,
                         mutRange: Option[(Long, Long)] = None): Unit = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(fsPath)) return
    val base = spark.range(n).select(col("id").as("cell"))
      .crossJoin(spark.createDataFrame(Years.map(Tuple1(_))).toDF("year"))
      .withColumn("id", format_string("%012d", col("cell")))
      .withColumn("name", concat(lit("BG "), col("id")))
      // ~2% missing parent_location exercises the pl default (P6)
      .withColumn("parent_location",
        when(pmod(xxhash64(col("id")), lit(50)) === 0, lit(null))
          .otherwise(concat(lit("State "),
            pmod(xxhash64(col("id")), lit(50)).cast("string"))))
    val withMetrics = metricLongNames.zipWithIndex.foldLeft(base) {
      case (df, (m, i)) =>
        val h = xxhash64(col("id"), col("year"), lit(m))
        val mut = if (m != "population") lit(0L) else {
          val stepHit = if (mutStep > 0) col("cell") % mutStep === 0 else lit(false)
          val rangeHit = mutRange.map { case (a, b) =>
            col("cell") >= a && col("cell") < b }.getOrElse(lit(false))
          when(stepHit || rangeHit, 1L).otherwise(0L)
        }
        val v = m match {
          case "population" => (pmod(h, lit(4900)) + 100 + mut).cast("string")
          case "judgements" | "filings" | "filings_high" | "filings_low" |
               "threatened" | "threatened_low" | "threatened_high" =>
            pmod(h, lit(1000)).cast("string")
          case "low_flag" => pmod(h, lit(2)).cast("string")
          case _ => // rates / medians: 0.00 .. 99.99
            format_string("%.2f", pmod(h, lit(10000)) / lit(100.0))
        }
        // ~3% empty cells (P8: empty ⇒ NULL at read)
        df.withColumn(m, when(pmod(h, lit(33)) === i % 33, lit(null)).otherwise(v))
    }
    Sources.writeCsv(
      withMetrics.select(("id" +: "year" +: "name" +: "parent_location" +:
        metricLongNames).map(col): _*), path)
    println(s"[pipescale] wrote long CSV: $n cells x ${Years.size} years -> $path")
  }

  /** Write the GeoJSON-lines geometry (if absent): one Polygon feature
    * per grid cell; neighbours share edges exactly.
    */
  private[graft] def genGeoLines(spark: SparkSession, n: Long, path: String): Unit = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(fsPath)) return
    val (cols, rows) = gridExprs(n)
    val (w, h) = (Bbox._3 - Bbox._1, Bbox._4 - Bbox._2)
    val (cw, ch) = (w / cols, h / rows)
    val df = spark.range(n)
      .withColumn("gx", col("id") % cols)
      .withColumn("gy", col("id") / cols)
      .withColumn("x0", lit(Bbox._1) + col("gx") * cw)
      .withColumn("y0", lit(Bbox._2) + col("gy") * ch)
      .withColumn("x1", col("x0") + cw)
      .withColumn("y1", col("y0") + ch)
      .select(format_string(
        """{"type":"Feature","properties":{"GEOID":"%012d"},"geometry":""" +
          """{"type":"Polygon","coordinates":[[[%.6f,%.6f],[%.6f,%.6f],""" +
          """[%.6f,%.6f],[%.6f,%.6f],[%.6f,%.6f]]]}}""",
        col("id"), col("x0"), col("y0"), col("x1"), col("y0"),
        col("x1"), col("y1"), col("x0"), col("y1"),
        col("x0"), col("y0")).as("value"))
    df.write.mode("overwrite").text(path)
    println(s"[pipescale] wrote geometry lines: $n cells -> $path")
  }

  /** One complete composed run; returns wall seconds. `tiles = false`
    * runs only the scan→pivot→artifact half (no geometry, no tile
    * fan) — the diagnostic split for scaling-ratio points: which half
    * owns a super-linear wall.
    */
  private def runOnce(spark: SparkSession, csv: String, geo: String,
                      out: String, tiles: Boolean = true): Double = {
    val t0 = System.nanoTime()
    val feats = if (tiles)
      Some(Pipeline.geometryFeatures(Sources.readGeoJsonLines(spark, geo))
        .persist(StorageLevel.MEMORY_AND_DISK))
    else None
    Pipeline.runRegion(spark, csv, "raw", metricLongNames, "block-groups",
      features = feats, outDir = if (tiles) Some(out) else None,
      wideOut = Some(s"$out/build-csv"), extentsOut = Some(s"$out/extents-csv"))
    feats.foreach(_.unpersist())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val nCells = args.lift(0).map(_.toLong).getOrElse(217000L)
    val outBase = args.lift(1).getOrElse("/tmp/pipescale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // modes combine: e.g. "full-once profile"
    val modes = args.drop(2).toSet
    // "profile": per-stage task-time attribution for scaling-ratio
    // diagnosis — which stage owns a super-linear wall (the r16 4×
    // investigation instrument)
    val profile = modes("profile")
    val stageTimes =
      new java.util.concurrent.ConcurrentHashMap[String, Long]()
    if (profile) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        // stage-level callsites are useless under AQE (every shuffle
        // stage materializes inside withThreadLocalCaptured): attribute
        // at the JOB level instead — a job's callsite is the ACTION
        // that triggered it, and all its AQE stages inherit it
        private val stageToAction =
          new java.util.concurrent.ConcurrentHashMap[Int, String]()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val action = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("unknown")
          j.stageIds.foreach(id => stageToAction.put(id, action))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val info = sc.stageInfo
          // best-effort: job callsite (absent on AQE-internal jobs) →
          // first graft frame in the stage details → stage name. Under
          // AQE most shuffle stages still land in one opaque bucket;
          // the instrument's reliable output is the RESULT stages
          val key = Option(stageToAction.get(info.stageId))
            .filter(_ != "unknown")
            .orElse(info.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("PipeScale"))
              .map(_.trim.take(120)))
            .getOrElse(info.name.take(80))
          stageTimes.merge(key, info.taskMetrics.executorRunTime,
            (a, b) => a + b)
        }
      })

    val csv = s"$outBase/in/long_$nCells.csv"
    val geo = s"$outBase/in/geo_$nCells.jsonl"
    genLongCsv(spark, nCells, csv)
    genGeoLines(spark, nCells, geo)

    // small-n warm-up: same plan shapes, compiles the 573-wide pivot
    // and tile codegen once outside the timed window
    val warmN = math.min(nCells, 5000L)
    val wCsv = s"$outBase/in/long_$warmN.csv"
    val wGeo = s"$outBase/in/geo_$warmN.jsonl"
    genLongCsv(spark, warmN, wCsv)
    genGeoLines(spark, warmN, wGeo)
    runOnce(spark, wCsv, wGeo, s"$outBase/warm", tiles = !modes("pivot-only"))

    // "incr-only": reuse existing run1/run2 trees and re-measure only
    // the incremental arms (the full-run walls print as -1);
    // "full-only": the composed-run walls alone (scaling-ratio runs at
    // other cell counts don't need the delta arms re-priced);
    // "full-once": ONE timed run — large-n ratio points whose two
    // trees would not fit the host disk (the 4× point writes ~14 GB
    // per tree)
    val incrOnly = modes("incr-only")
    val fullOnce = modes("full-once")
    val pivotOnly = modes("pivot-only")
    val fullOnly = fullOnce || pivotOnly || modes("full-only")
    val wall1 = if (incrOnly) -1.0
      else runOnce(spark, csv, geo, s"$outBase/run1", tiles = !pivotOnly)
    val wall2 = if (incrOnly || fullOnce || pivotOnly) -1.0
      else runOnce(spark, csv, geo, s"$outBase/run2")

    // incremental rebuild measurement: a 0.1%-mutated twin snapshot
    // applied IN PLACE to run1's tree (outDir == prevDir — the live
    // deployment mode: IO proportional to the delta) — the nightly
    // delta the reference's `rm -rf _proc` rebuilds from scratch
    val csvMut = s"$outBase/in/long_${nCells}_mut.csv"
    val csvMut2 = s"$outBase/in/long_${nCells}_mut2.csv"
    val csvClust = s"$outBase/in/long_${nCells}_clust.csv"
    if (!fullOnly) {
      genLongCsv(spark, nCells, csvMut, mutStep = 1000)
      // mut2 vs mut: cells ≡0 (mod 500) but not (mod 1000) newly change —
      // the same 0.1% scattered delta SHAPE as arm A, but arm C runs it
      // against run1's now-stored fingerprint artifact (no old-CSV scan)
      genLongCsv(spark, nCells, csvMut2, mutStep = 500)
      // clustered delta: one contiguous 217-cell block — the "one county
      // re-reported" case, where the delta lands in O(1) z8 tiles
      genLongCsv(spark, nCells, csvClust,
        mutRange = Some((nCells / 2, nCells / 2 + 217)))
    }
    lazy val featsI = {
      val f = Pipeline.geometryFeatures(Sources.readGeoJsonLines(spark, geo))
        .persist(StorageLevel.MEMORY_AND_DISK)
      f.count() // geometry is unchanged between snapshots: parse untimed
      f
    }
    def incr(oldCsv: String, newCsv: String, tree: String)
        : (Double, Incremental.Stats) = {
      val t0 = System.nanoTime()
      val st = Incremental.incrementalRegion(spark, oldCsv, newCsv, "raw",
        metricLongNames, "block-groups", featsI,
        prevDir = tree, outDir = tree)
      ((System.nanoTime() - t0) / 1e9, st)
    }
    val noStats = Incremental.Stats(-1, -1, -1, -1, -1, fullRebuild = false)
    val ((wallA, statsA), (wallC, statsC), (wallB, statsB)) =
      if (fullOnly) ((-1.0, noStats), (-1.0, noStats), (-1.0, noStats))
      else (incr(csv, csvMut, s"$outBase/run1"),      // scattered, cold fp
        incr(csvMut, csvMut2, s"$outBase/run1"),      // scattered, WARM fp
        incr(csv, csvClust, s"$outBase/run2"))        // clustered, cold fp
    if (!fullOnly) featsI.unpersist() // lazy: untouched on full-only runs

    // .mbtiles container write at the national tile count — single-
    // writer by format (tippecanoe's constraint too): decade 00's tree
    // streams back through toLocalIterator into one sqlite file
    val wallMbt = if (fullOnly) -1.0 else {
      val t0 = System.nanoTime()
      graft.sinks.Mbtiles.writeMbtiles(
        Incremental.readPbfTree(spark, s"$outBase/run2/block-groups/00"),
        s"$outBase/run2/block-groups/00.mbtiles",
        Map("name" -> "block-groups-00", "format" -> "pbf"))
      (System.nanoTime() - t0) / 1e9
    }
    // and the two-way door: the distributed container READ at the same
    // scale (driver walks interiors; executors parse leaf ranges)
    val (wallMbtRead, nMbt) = if (fullOnly) (-1.0, -1L) else {
      val t0 = System.nanoTime()
      val n = graft.sinks.Mbtiles.readMbtiles(spark,
        s"$outBase/run2/block-groups/00.mbtiles")
        .selectExpr("count(*)", "sum(length(tile_bytes))").head.getLong(0)
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // sanity: tiles on disk + artifact shapes (outside the timed walls)
    def countPbf(dir: String): Long = {
      val d = new java.io.File(dir)
      if (!d.exists) 0L
      else {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles.map(walk).sum
          else if (f.getName.endsWith(".pbf")) 1L else 0L
        walk(d)
      }
    }
    val sanityBase = if (fullOnce || pivotOnly) s"$outBase/run1"
      else s"$outBase/run2"
    val tiles00 = countPbf(s"$sanityBase/block-groups/00")
    val tiles10 = countPbf(s"$sanityBase/block-groups/10")
    val wideRows = spark.read.option("header", true)
      .csv(s"$sanityBase/build-csv").count()
    val extRows = spark.read.option("header", true)
      .csv(s"$sanityBase/extents-csv").count()
    if (profile) {
      import scala.jdk.CollectionConverters._
      val top = stageTimes.asScala.toSeq.sortBy(-_._2).take(14)
      for ((name, ms) <- top)
        println(f"""{"metric":"stage_profile","sec":${ms / 1000.0}%.1f,"stage":"${
          name.replace("\"", "'").replace("\n", " ")}"}""")
    }
    println(f"""{"metric":"pipescale","cells":$nCells,""" +
      f""""long_rows":${nCells * Years.size},"wide_rows":$wideRows,""" +
      f""""extent_rows":$extRows,"tiles_00":$tiles00,"tiles_10":$tiles10,""" +
      f""""wall1":$wall1%.1f,"wall2":$wall2%.1f,""" +
      f""""wall_min":${if (fullOnce || pivotOnly) wall1
        else math.min(wall1, wall2)}%.1f,""" +
      f""""incr_scatter":$wallA%.1f,"incr_scatter_tiles":${statsA.affectedTiles},""" +
      f""""incr_scatter_contrib":${statsA.contributors},""" +
      f""""incr_warmfp":$wallC%.1f,"incr_warmfp_tiles":${statsC.affectedTiles},""" +
      f""""incr_cluster":$wallB%.1f,"incr_cluster_tiles":${statsB.affectedTiles},""" +
      f""""incr_cluster_contrib":${statsB.contributors},""" +
      f""""mbtiles_wall":$wallMbt%.1f,""" +
      f""""mbtiles_read_wall":$wallMbtRead%.1f,"mbtiles_tiles":$nMbt,""" +
      f""""unit":"sec"}""")
    spark.stop()
  }
}
