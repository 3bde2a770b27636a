package graft

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.sources.Sources

/** The reference's MULTI-REGION session (`build.sh:69` loops regions
  * serially in one process): states → counties → tracts → block-groups
  * at the census pyramid's real relative sizes, run serially in ONE
  * Spark session — the deployment shape a nightly build actually has.
  *
  * Two claims this measures:
  *  - the whole-session economics: per-region wall + total, i.e. what
  *    "rebuild the country" costs when the big region no longer
  *    dominates a fresh JVM (codegen/JIT amortize across regions);
  *  - NO CROSS-REGION STATE LEAK: counties runs once SOLO (fresh
  *    output) before the serial loop; after states has run in the same
  *    session, counties runs again and its pbf tree must be
  *    byte-identical to the solo run. Any cache or artifact-registry
  *    entry leaking across regions (the r14 ArtifactCache owner-flip
  *    class of bug) breaks the md5 comparison and the tool FAILS — the
  *    parity is a hard require, not a printed number.
  *
  * Inputs reuse [[PipeScale]]'s deterministic grid synthesis (same
  * bbox, so regions genuinely overlap spatially like the census
  * pyramid does). Sizes default to the real pyramid: 52 states, 3,144
  * counties, 74,134 tracts, 217,000 block groups; `scale` divides all
  * four for smoke runs.
  *
  * Usage: runMain graft.MultiRegion [scale] [outBase]
  *        defaults: 1 /tmp/multiregion
  */
object MultiRegion {

  private val Pyramid = Seq(
    "states" -> 52L,
    "counties" -> 3144L,
    "tracts" -> 74134L,
    "block-groups" -> 217000L)

  private def md5Tree(dir: String): String = {
    val base = java.nio.file.Paths.get(dir)
    val md = MessageDigest.getInstance("MD5")
    if (java.nio.file.Files.exists(base)) {
      val files = java.nio.file.Files.walk(base).iterator()
      val all = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (files.hasNext) {
        val p = files.next()
        if (p.toString.endsWith(".pbf")) all += p
      }
      for (p <- all.sortBy(base.relativize(_).toString)) {
        md.update(base.relativize(p).toString.getBytes("UTF-8"))
        md.update(java.nio.file.Files.readAllBytes(p))
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val scale = args.lift(0).map(_.toLong).getOrElse(1L)
    val outBase = args.lift(1).getOrElse("/tmp/multiregion")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sizes = Pyramid.map { case (r, n) => r -> math.max(4L, n / scale) }
    for ((_, n) <- sizes) {
      PipeScale.genLongCsv(spark, n, s"$outBase/in/long_$n.csv")
      PipeScale.genGeoLines(spark, n, s"$outBase/in/geo_$n.jsonl")
    }

    def runRegionOnce(region: String, n: Long, out: String): Double = {
      val t0 = System.nanoTime()
      val feats = Pipeline.geometryFeatures(
        Sources.readGeoJsonLines(spark, s"$outBase/in/geo_$n.jsonl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      Pipeline.runRegion(spark, s"$outBase/in/long_$n.csv", "raw",
        PipeScale.metricLongNames, region, features = Some(feats),
        outDir = Some(out), wideOut = Some(s"$out/build-csv"),
        extentsOut = Some(s"$out/extents-csv"))
      feats.unpersist()
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up at tiny n (codegen/janino outside every timed window)
    runRegionOnce("counties", sizes.head._2, s"$outBase/warm")

    // counties SOLO — the leak-check reference tree. The whole full
    // phase runs inside a canary bracket (stderr line) so its absolute
    // walls always carry their host-window tag — the r18 lesson: the
    // full and incremental phases of ONE session can land in very
    // different throttle stretches.
    val nCounties = sizes.find(_._1 == "counties").get._2
    val (soloWall, soloMd5, walls) =
      Canary.bracketed(spark, "multiregion_full") {
        val sw = runRegionOnce("counties", nCounties, s"$outBase/solo")
        val sm = md5Tree(s"$outBase/solo/counties")
        // the serial session: every region through the SAME session state
        val ws = sizes.map { case (region, n) =>
          region -> runRegionOnce(region, n, s"$outBase/serial")
        }
        (sw, sm, ws)
      }
    val serialMd5 = md5Tree(s"$outBase/serial/counties")
    require(serialMd5 == soloMd5,
      s"CROSS-REGION LEAK: counties tree differs between solo ($soloMd5) " +
        s"and serial ($serialMd5) runs in the same session")

    val wallsJson = walls.map { case (r, w) => f""""$r":$w%.1f""" }
      .mkString(",")
    println(f"""{"metric":"multiregion","scale":$scale,""" +
      f""""walls":{$wallsJson},"total":${walls.map(_._2).sum}%.1f,""" +
      f""""counties_solo":$soloWall%.1f,""" +
      f""""counties_parity":"${if (serialMd5 == soloMd5) "ok" else "LEAK"}",""" +
      f""""unit":"sec"}""")

    // ---- incremental pyramid phase (r17) --------------------------------
    // The NIGHTLY deployment shape: 0.1% deltas (every 1000th cell's
    // population bumps — PipeScale's deterministic mutator) flow through
    // incrementalRegion across the whole pyramid IN ONE SESSION, updating
    // the serial trees in place. The leak gate extends to this path:
    // counties' delta ALSO runs solo (prevDir = the solo full tree,
    // outDir fresh), and the in-place serial counties tree must come out
    // byte-identical — cross-region cache leaks under the incremental
    // path were untested before this phase, and the two modes (in-place
    // update vs full-copy) must agree byte-for-byte too.
    for ((_, n) <- sizes)
      PipeScale.genLongCsv(spark, n, s"$outBase/in/long_${n}_d.csv",
        mutStep = 1000)

    def featuresOf(n: Long) = Pipeline.geometryFeatures(
      Sources.readGeoJsonLines(spark, s"$outBase/in/geo_$n.jsonl"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // counties delta SOLO (full-copy mode) — the reference tree; the
    // incremental phase gets its OWN canary bracket (see the full
    // phase's comment)
    val (incSoloWall, soloStats, incSoloMd5, incWalls) =
      Canary.bracketed(spark, "multiregion_incremental") {
        val fSolo = featuresOf(nCounties)
        val t0s = System.nanoTime()
        val sst = Incremental.incrementalRegion(spark,
          s"$outBase/in/long_$nCounties.csv",
          s"$outBase/in/long_${nCounties}_d.csv",
          "raw", PipeScale.metricLongNames, "counties", fSolo,
          prevDir = s"$outBase/solo", outDir = s"$outBase/isolo")
        val isw = (System.nanoTime() - t0s) / 1e9
        fSolo.unpersist()
        require(!sst.fullRebuild,
          s"0.1% delta must stay on the incremental path, got $sst")
        val ism = md5Tree(s"$outBase/isolo/counties")

        // the serial incremental session: every region's delta through
        // the SAME session, updating the serial trees IN PLACE
        val iws = sizes.map { case (region, n) =>
          val f = featuresOf(n)
          val t0 = System.nanoTime()
          val st = Incremental.incrementalRegion(spark,
            s"$outBase/in/long_$n.csv", s"$outBase/in/long_${n}_d.csv",
            "raw", PipeScale.metricLongNames, region, f,
            prevDir = s"$outBase/serial", outDir = s"$outBase/serial")
          val wall = (System.nanoTime() - t0) / 1e9
          f.unpersist()
          require(!st.fullRebuild,
            s"$region: 0.1% delta must stay incremental, got $st")
          (region, wall, st)
        }
        (isw, sst, ism, iws)
      }
    val incSerialMd5 = md5Tree(s"$outBase/serial/counties")
    require(incSerialMd5 == incSoloMd5,
      s"CROSS-REGION LEAK (incremental path): counties tree differs " +
        s"between solo ($incSoloMd5) and in-place serial ($incSerialMd5)")

    val incWallsJson = incWalls
      .map { case (r, w, _) => f""""$r":$w%.1f""" }.mkString(",")
    val changedJson = incWalls
      .map { case (r, _, st) => s""""$r":${st.changed + st.added}""" }
      .mkString(",")
    println(f"""{"metric":"multiregion_incremental","scale":$scale,""" +
      f""""walls":{$incWallsJson},"total":${incWalls.map(_._2).sum}%.1f,""" +
      f""""changed":{$changedJson},""" +
      f""""counties_solo":$incSoloWall%.1f,""" +
      f""""counties_parity":"${if (incSerialMd5 == incSoloMd5) "ok"
        else "LEAK"}","unit":"sec"}""")
    spark.stop()
  }
}
