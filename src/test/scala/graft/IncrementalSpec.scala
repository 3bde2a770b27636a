package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Incremental region rebuild ≡ full rebuild — the r14 verdict's item 4:
  * q135's diff primitive wired to the composed pipeline must produce a
  * tile tree BYTE-IDENTICAL to rebuilding everything, while touching
  * only the changed GEOIDs' neighbourhood. The fixture is a 300-cell
  * shared-border grid (block-groups knobs: coalesce + shared borders —
  * the adversarial path, since border arcs depend on neighbours) with
  * one changed, one removed, and one added GEOID between snapshots.
  */
class IncrementalSpec extends AnyFunSuite with SharedSpark {

  private val Cols = 20
  private val Rows = 15
  private val NCells = Cols * Rows // 300
  private val Years = (2000 to 2018).map(_.toString)
  private val metricLongNames = Seq("population", "judgement_rate",
    "filing_rate", "threatened_rate", "median_gross_rent")

  private def geoid(cell: Int): String = f"$cell%012d"

  /** Deterministic metric value; `bump` shifts a cell's values to make
    * it "changed".
    */
  private def value(cell: Int, year: Int, m: Int, bump: Int): String =
    (((cell * 31 + year * 7 + m * 13 + bump) % 97) + 1).toString

  /** Write a long CSV for the given cells. */
  private def writeLong(cells: Seq[Int], bumped: Set[Int]): String = {
    val dir = Files.createTempDirectory("incr-long").toString
    val sb = new StringBuilder("id,year,name,parent_location," +
      metricLongNames.mkString(",") + "\n")
    for (c <- cells; y <- Years) {
      sb.append(geoid(c)).append(',').append(y).append(",Cell ").append(c)
        .append(",Gridland")
      val bump = if (bumped(c)) 1 else 0
      for (m <- metricLongNames.indices)
        sb.append(',').append(value(c, y.toInt, m, bump))
      sb.append('\n')
    }
    val p = Paths.get(dir, "data.csv")
    Files.write(p, sb.toString.getBytes("UTF-8"))
    p.toString
  }

  /** 20×15 exact grid over a small bbox — neighbours share edges, so
    * the shared-border arc machinery runs for real.
    */
  private lazy val features = {
    val dir = Files.createTempDirectory("incr-geo").toString
    val (lon0, lat0, cw, ch) = (-100.0, 30.0, 0.1, 0.1)
    val sb = new StringBuilder
    for (c <- 0 until NCells) {
      val (gx, gy) = (c % Cols, c / Cols)
      val (x0, y0) = (lon0 + gx * cw, lat0 + gy * ch)
      val (x1, y1) = (x0 + cw, y0 + ch)
      sb.append(s"""{"type":"Feature","properties":{"GEOID":"${geoid(c)}"},""" +
        s""""geometry":{"type":"Polygon","coordinates":[[[$x0,$y0],[$x1,$y0],""" +
        s"""[$x1,$y1],[$x0,$y1],[$x0,$y0]]]}}""").append('\n')
    }
    val p = Paths.get(dir, "features.jsonl")
    Files.write(p, sb.toString.getBytes("UTF-8"))
    val f = Pipeline.geometryFeatures(
      graft.sources.Sources.readGeoJsonLines(spark, p.toString)).persist()
    f.count()
    f
  }

  private def md5tree(dir: String): Map[String, String] = {
    val base = Paths.get(dir)
    if (!Files.exists(base)) return Map.empty
    val out = scala.collection.mutable.Map.empty[String, String]
    Files.walk(base).filter(_.toString.endsWith(".pbf")).forEach { p =>
      val d = MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
      out(base.relativize(p).toString) = d.map("%02x".format(_)).mkString
    }
    out.toMap
  }

  test("incremental rebuild is byte-identical to the full rebuild (1% mutation)") {
    // old snapshot: cells 0..298 (299 is born later); new snapshot:
    // cell 5 changed, cell 7 removed, cell 299 added
    val oldCsv = writeLong((0 until NCells - 1), bumped = Set.empty)
    val newCsv = writeLong((0 until NCells).filterNot(_ == 7), bumped = Set(5))

    val dirOld = Files.createTempDirectory("incr-prev").toString
    val dirFull = Files.createTempDirectory("incr-full").toString
    val dirIncr = Files.createTempDirectory("incr-out").toString
    Pipeline.runRegion(spark, oldCsv, "raw", metricLongNames, "block-groups",
      features = Some(features), outDir = Some(dirOld))
    Pipeline.runRegion(spark, newCsv, "raw", metricLongNames, "block-groups",
      features = Some(features), outDir = Some(dirFull))
    val stats = Incremental.incrementalRegion(spark, oldCsv, newCsv, "raw",
      metricLongNames, "block-groups", features, prevDir = dirOld,
      outDir = dirIncr)

    assert(!stats.fullRebuild, s"3/300 GEOIDs must take the incremental path: $stats")
    assert(stats.changed == 1 && stats.added == 1 && stats.removed == 1, stats.toString)
    assert(stats.affectedTiles > 0 && stats.contributors >= 3, stats.toString)

    for (decade <- Seq("00", "10")) {
      val full = md5tree(s"$dirFull/block-groups/$decade")
      val incr = md5tree(s"$dirIncr/block-groups/$decade")
      assert(full.nonEmpty, s"full rebuild wrote no tiles for decade $decade")
      assert(incr.keySet == full.keySet,
        s"decade $decade tile SETS differ: only-full=" +
          s"${(full.keySet -- incr.keySet).take(5)} only-incr=" +
          s"${(incr.keySet -- full.keySet).take(5)}")
      val mismatched = full.keys.filter(k => full(k) != incr(k)).toSeq
      assert(mismatched.isEmpty,
        s"decade $decade: ${mismatched.size} tiles differ, e.g. " +
          s"${mismatched.take(5)}")
      // the carry-over must be real: strictly fewer tiles rebuilt than exist
      assert(stats.affectedTiles < full.size * 2L, // both decades share the tile set
        s"affected=${stats.affectedTiles} of ${full.size} tiles/decade")
      // metadata carried from the previous run
      assert(Files.exists(Paths.get(dirIncr, "block-groups", decade, "metadata.json")))
    }

    // IN-PLACE mode (outDir == prevDir, the live-deployment shape):
    // clone the previous tree, update it in place, same byte parity —
    // including DELETION of tiles the delta emptied
    val dirLive = Files.createTempDirectory("incr-live").toString
    Files.walk(Paths.get(dirOld)).forEach { p =>
      val t = Paths.get(dirLive).resolve(Paths.get(dirOld).relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
    val metaBefore = new String(Files.readAllBytes(
      Paths.get(dirLive, "block-groups", "00", "metadata.json")), "UTF-8")
    val statsLive = Incremental.incrementalRegion(spark, oldCsv, newCsv, "raw",
      metricLongNames, "block-groups", features, prevDir = dirLive,
      outDir = dirLive)
    assert(!statsLive.fullRebuild)
    // the live tree's metadata (bounds/zooms/layers) must survive the
    // in-place update untouched — an empty-map rewrite once clobbered it
    val metaAfter = new String(Files.readAllBytes(
      Paths.get(dirLive, "block-groups", "00", "metadata.json")), "UTF-8")
    assert(metaAfter == metaBefore, s"metadata clobbered:\n$metaAfter")
    assert(metaAfter.contains("bounds"), metaAfter)
    // the next delta can start from the stored fingerprint artifact
    assert(Files.exists(Paths.get(dirLive, "block-groups",
      "fingerprints.parquet")))
    for (decade <- Seq("00", "10")) {
      val full = md5tree(s"$dirFull/block-groups/$decade")
      val live = md5tree(s"$dirLive/block-groups/$decade")
      assert(live.keySet == full.keySet,
        s"in-place decade $decade tile SETS differ: only-full=" +
          s"${(full.keySet -- live.keySet).take(5)} only-live=" +
          s"${(live.keySet -- full.keySet).take(5)}")
      val mm = full.keys.filter(k => full(k) != live(k)).toSeq
      assert(mm.isEmpty, s"in-place decade $decade: ${mm.size} differ ${mm.take(5)}")
    }

    // CHAINED delta: the second in-place update diffs against the
    // STORED fingerprint artifact (the first one hashed the old CSV —
    // this is the only path that exercises stored-fp parity), and its
    // result must equal a full rebuild of the third state
    val thirdCsv = writeLong((0 until NCells).filterNot(_ == 7),
      bumped = Set(5, 9))
    val statsChain = Incremental.incrementalRegion(spark, newCsv, thirdCsv,
      "raw", metricLongNames, "block-groups", features, prevDir = dirLive,
      outDir = dirLive)
    assert(!statsChain.fullRebuild && statsChain.changed == 1,
      s"only cell 9 changes between states 2 and 3: $statsChain")
    val dirFull3 = Files.createTempDirectory("incr-full3").toString
    Pipeline.runRegion(spark, thirdCsv, "raw", metricLongNames,
      "block-groups", features = Some(features), outDir = Some(dirFull3))
    for (decade <- Seq("00", "10")) {
      val full3 = md5tree(s"$dirFull3/block-groups/$decade")
      val live3 = md5tree(s"$dirLive/block-groups/$decade")
      assert(live3.keySet == full3.keySet, s"chained decade $decade set diff")
      val mm3 = full3.keys.filter(k => full3(k) != live3(k)).toSeq
      assert(mm3.isEmpty, s"chained decade $decade: ${mm3.size} differ ${mm3.take(5)}")
    }
  }

  test("mass change routes to the full-rebuild fallback") {
    val oldCsv = writeLong(0 until 40, bumped = Set.empty)
    val newCsv = writeLong(0 until 40, bumped = (0 until 20).toSet) // 50% changed
    val dirOld = Files.createTempDirectory("incr-prev2").toString
    val dirOut = Files.createTempDirectory("incr-out2").toString
    Pipeline.runRegion(spark, oldCsv, "raw", metricLongNames, "block-groups",
      features = Some(features.filter(org.apache.spark.sql.functions.col("GEOID") <
        geoid(40))), outDir = Some(dirOld))
    val stats = Incremental.incrementalRegion(spark, oldCsv, newCsv, "raw",
      metricLongNames, "block-groups",
      features.filter(org.apache.spark.sql.functions.col("GEOID") < geoid(40)),
      prevDir = dirOld, outDir = dirOut)
    assert(stats.fullRebuild && stats.changed == 20, stats.toString)
    // the fallback still produced a complete tree
    assert(md5tree(s"$dirOut/block-groups/00").nonEmpty)
  }

  test("a tree deeper than the configured fan routes to the full rebuild") {
    // an extend-zooms-deepened previous tree holds tiles the fan never
    // covers: incremental updates would strand them stale. The guard
    // reads the tree's own deepest z directory (block-groups fan max
    // is z10; plant a z13 leaf) and must take the fallback — which
    // wipes the region subtree, so the stale deep tile also vanishes.
    val oldCsv = writeLong(0 until 40, bumped = Set.empty)
    val newCsv = writeLong(0 until 40, bumped = Set(3)) // tiny delta
    val feats40 = features.filter(
      org.apache.spark.sql.functions.col("GEOID") < geoid(40))
    val dirOld = Files.createTempDirectory("incr-deep").toString
    val dirOut = Files.createTempDirectory("incr-deep-out").toString
    Pipeline.runRegion(spark, oldCsv, "raw", metricLongNames, "block-groups",
      features = Some(feats40), outDir = Some(dirOld))
    val deep = Paths.get(dirOld, "block-groups", "00", "13", "4096")
    Files.createDirectories(deep)
    Files.write(deep.resolve("2048.pbf"), Array[Byte](1, 2, 3))
    assert(Incremental.treeMaxZoom(
      new org.apache.hadoop.fs.Path(s"$dirOld/block-groups")
        .getFileSystem(spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(s"$dirOld/block-groups")) == 13)

    // copy mode: the fallback must fire despite the 1/40 delta
    val stats = Incremental.incrementalRegion(spark, oldCsv, newCsv, "raw",
      metricLongNames, "block-groups", feats40, prevDir = dirOld,
      outDir = dirOut)
    assert(stats.fullRebuild, s"deep tree must force the fallback: $stats")
    assert(md5tree(s"$dirOut/block-groups/00").nonEmpty)
    assert(!Files.exists(Paths.get(dirOut, "block-groups", "00", "13")),
      "the fallback tree must not inherit the stale deep tiles")

    // in-place mode: same guard, and the wipe removes the stale leaf
    val statsLive = Incremental.incrementalRegion(spark, oldCsv, newCsv,
      "raw", metricLongNames, "block-groups", feats40, prevDir = dirOld,
      outDir = dirOld)
    assert(statsLive.fullRebuild)
    assert(!Files.exists(deep), "in-place fallback must wipe the deep leaf")
  }

  test("diff plan: map-side partial fingerprints; one id-keyed shuffle per side") {
    val oldCsv = writeLong(0 until 20, bumped = Set.empty)
    val newCsv = writeLong(0 until 20, bumped = Set(3))
    val schema = graft.sources.Sources.longSchema(metricLongNames)
    val p = Incremental.geoidDiff(
      graft.sources.Sources.readCsv(spark, oldCsv, schema),
      graft.sources.Sources.readCsv(spark, newCsv, schema))
      .queryExecution.executedPlan.toString
    assert("FileScan csv".r.findAllIn(p).size == 2,
      "each snapshot must scan exactly once")
    assert(p.contains("partial_sum"),
      "fingerprints must combine map-side — raw rows may not cross")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"), p)
    // the only shuffles are the two per-side fingerprint aggregations,
    // keyed on the id: the rename to GEOID is alias-aware, so the join
    // reuses the aggregation partitioning with NO third exchange
    val ex = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(ex.size == 2, s"expected 2 id-keyed exchanges:\n${ex.mkString("\n")}")
    ex.foreach(l => assert(l.contains("(id#"), l))
  }

  test("geoidDiff classifies added/removed/changed and drops unchanged") {
    val oldCsv = writeLong(0 until 10, bumped = Set.empty)
    val newCsv = writeLong((0 until 11).filterNot(_ == 3), bumped = Set(4))
    val schema = graft.sources.Sources.longSchema(metricLongNames)
    val d = Incremental.geoidDiff(
      graft.sources.Sources.readCsv(spark, oldCsv, schema),
      graft.sources.Sources.readCsv(spark, newCsv, schema))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d == Map(geoid(3) -> "removed", geoid(4) -> "changed",
      geoid(10) -> "added"), d.toString)
  }
}
