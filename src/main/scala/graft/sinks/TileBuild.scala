package graft.sinks

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

import graft.operators.{Geometry, Tiling}

/** Tile-pyramid build + sink: the Spark re-expression of the reference's
  * tippecanoe → tile-join → `--output-to-directory` chain
  * (`/root/reference/build.sh:129-134,155-160,219-228`).
  *
  * Spark-first design notes (100 TB scale):
  *  - features fan out to tile keys ([[Tiling.assignTiles]]), then ONE
  *    `groupBy(z,x,y)` shuffle brings each tile's features together and
  *    a per-group fold encodes the MVT bytes — `mapGroups` over the
  *    KeyValueGroupedDataset, the typed-Aggregator shape from
  *    SURVEY.md §2.11.
  *  - per-tile feature order is pinned (importance desc, id) so tile
  *    bytes are deterministic; the density budget (O4) is applied
  *    BEFORE the shuffle would explode — the window prunes map-side via
  *    WindowGroupLimit. NB: that rewrite only fires when the budget ≤
  *    `spark.sql.optimizer.windowGroupLimitThreshold` (default 1000);
  *    every session builder in this repo raises it to 100000 so the
  *    default 10000 budget stays rank-limit-optimizable — keep that
  *    conf when embedding the library elsewhere.
  *  - the directory sink writes `z/x/y.pbf` straight from executors
  *    (`foreachPartition`), exactly the reference's exploded tile tree
  *    (`build.sh:220`); on a cluster the same code targets a shared
  *    filesystem / object store.
  */
object TileBuild {

  /** Encode point features into per-tile MVT byte blobs.
    *
    * @param points     DataFrame with id, lon, lat and `attrCols`
    * @param attrCols   attribute columns carried into tiles (null cells
    *                   dropped per-feature — `--empty-csv-columns-are-null`)
    * @param budget     per-tile feature-COUNT cap, applied map-side BEFORE
    *                   the tile shuffle (bounds shuffle fan-in)
    * @param byteBudget per-tile encoded-BYTE cap, applied at encode time —
    *                   tippecanoe's actual `--drop-densest-as-needed`
    *                   semantics are a tile size budget
    *                   (`build.sh:124-126`; tippecanoe default 500K)
    * @param baseZoom   tippecanoe `--base-zoom` (`build.sh:121-126`):
    *                   zooms below it thin points at ~2.5×/level
    *                   ([[Tiling.baseZoomKeep]] — deterministic
    *                   hash-ordered drop, applied per-row BEFORE the
    *                   tile shuffle)
    * @return DataFrame (z, x, y, n_features, tile_bytes)
    */
  def buildPointTiles(points: DataFrame, idCol: String, lonCol: String,
                      latCol: String, attrCols: Seq[String], layerName: String,
                      minZoom: Int, maxZoom: Int,
                      importanceCol: Option[String] = None,
                      budget: Int = 10000,
                      byteBudget: Int = 500 * 1024,
                      baseZoom: Option[Int] = None): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._

    val fanned = Tiling.assignTiles(points, lonCol, latCol, minZoom, maxZoom)
    val assigned = baseZoom match {
      case Some(bz) if bz > minZoom => fanned.filter(Tiling.baseZoomKeep(
        graft.operators.TextStats.hash60(col(idCol).cast("string")),
        col("z"), minZoom, bz))
      case _ => fanned
    }
    // pixel coords per zoom: computed per-row from the already-assigned z
    val withPx = assigned.withColumn("fx",
        round((col(lonCol) + 180.0) / 360.0 * pow(lit(2.0), col("z")), 6))
      .withColumn("latc",
        least(lit(Tiling.MaxLat), greatest(lit(-Tiling.MaxLat), col(latCol))))
      .withColumn("fy",
        round((lit(1.0) - log(tan(radians(col("latc"))) + lit(1.0) / cos(radians(col("latc"))))
          / lit(math.Pi)) / 2.0 * pow(lit(2.0), col("z")), 6))
      // clamp: tile x/y are clamped to [0, n-1] but fx/fy are not, so the
      // antimeridian (lon=180) / south-clamp (merc=1) edge lands at pixel
      // 4096 — one past the MVT extent. Pin to [0, 4095].
      .withColumn("px", least(lit(4095), greatest(lit(0),
        floor((col("fx") - col("x")) * 4096))).cast("int"))
      .withColumn("py", least(lit(4095), greatest(lit(0),
        floor((col("fy") - col("y")) * 4096))).cast("int"))
    val budgeted = Tiling.dropDensest(withPx,
      col(importanceCol.getOrElse(idCol)), col(idCol), budget)

    val attrPairs = attrCols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val rows = budgeted.select(col("z"), col("x"), col("y"),
      col("density_rank"), col(idCol).cast("long").as("fid"),
      col("px"), col("py"), map(attrPairs: _*).as("attrs"))

    rows.as[(Int, Long, Long, Int, Long, Int, Int, Map[String, String])]
      .groupByKey { case (z, x, y, _, _, _, _, _) => (z, x, y) }
      .mapGroups { (key: (Int, Long, Long),
                    it: Iterator[(Int, Long, Long, Int, Long, Int, Int, Map[String, String])]) =>
        val (z, x, y) = key
        // pinned order: density_rank already encodes (importance desc,
        // tie id) — renderers that draw/drop in feature order see the
        // most important features first (tippecanoe discipline)
        val feats = it.toSeq.sortBy(t => (t._4, t._5)).map {
          case (_, _, _, _, fid, px, py, attrs) =>
            Mvt.Feature(fid, Mvt.PointGeom, Seq(Seq((px, py))),
              attrs.toSeq.filter(_._2 != null).sortBy(_._1))
        }
        val (kept, bytes) = fitToByteBudget(layerName, feats, byteBudget)
        (z, x, y, kept, bytes)
      }
      .toDF("z", "x", "y", "n_features", "tile_bytes")
  }

  /** Encode polygon features into per-tile MVT byte blobs — the
    * choropleth half of the reference's tippecanoe stage
    * (`build.sh:139-160`: mapshaper simplify → tippecanoe polygon
    * tiles). Candidate tiles come from the bbox cover
    * ([[Geometry.coverTiles]], a pure Generate fan-out); the exact
    * refinement happens per tile AFTER the one groupBy(z,x,y) shuffle:
    * project rings to world pixels, per-zoom Douglas-Peucker simplify
    * (`--simplification`, pixel tolerance is zoom-scaled for free
    * because pixel space doubles per zoom), Sutherland–Hodgman clip to
    * the tile square, quantize to the 4096 grid, drop empty/sliver
    * rings — a feature whose clipped exterior vanishes is dropped, and
    * tiles left with zero features are dropped (bbox-cover false
    * positives on diagonal shapes).
    *
    * @param polys      DataFrame with id, a parsed polygons column
    *                   ([[Geometry.parsePolygons]] layout:
    *                   polygons→rings→points→[lon,lat]) and `attrCols`
    * @param simplifyPx Douglas-Peucker tolerance in tile pixels (the
    *                   tippecanoe `--simplification` knob; 0 disables)
    * @param coalesce   over-budget strategy: true =
    *                   `--coalesce-smallest-as-needed` (merge
    *                   attr-identical features, keep coverage — the
    *                   reference's choropleth setting), false =
    *                   `--drop-densest-as-needed` prefix drop
    * @return DataFrame (z, x, y, n_features, tile_bytes)
    */
  def buildPolygonTiles(polys: DataFrame, idCol: String, polygonsCol: String,
                        attrCols: Seq[String], layerName: String,
                        minZoom: Int, maxZoom: Int,
                        importanceCol: Option[String] = None,
                        budget: Int = 10000,
                        byteBudget: Int = 500 * 1024,
                        simplifyPx: Double = 1.0,
                        coalesce: Boolean = false,
                        sharedBorders: Boolean = false): DataFrame = {
    // fused single-pass plan (attrs ride the fan-out rows — NO join
    // unless sharedBorders adds the per-feature shared-segment join):
    // the split polygonTileFeatures/encodePolygonTiles pair exists for
    // the per-decade reuse path where the geometry stage is persisted.
    // CAVEAT (r15, found by IncrementalSpec): under sharedBorders the
    // fused path detects shared segments over THIS frame — if callers
    // pre-join attributes and thereby drop data-less features, those
    // features' edges stop counting as shared and borders simplify
    // differently than the split path (which runs geometry over the
    // full feature table BEFORE the attribute join). Pipeline paths
    // that must agree byte-for-byte use the split helpers
    // (Pipeline.choroTileFeatures/choroDecadeEncode).
    val spark = polys.sparkSession
    import spark.implicits._
    val withShared =
      if (sharedBorders) Geometry.withSharedSegments(polys, idCol, polygonsCol)
      else polys.withColumn("shared_segs",
        typedLit(Seq.empty[Seq[Seq[Double]]]))
    val withBbox = Geometry.bboxColumns(col(polygonsCol))
      .foldLeft(withShared) { case (df, (n, c)) => df.withColumn(n, c) }
    val covered = Geometry.coverTiles(withFlatGeom(withBbox, polygonsCol),
      minZoom, maxZoom)
    val budgeted = Tiling.dropDensest(covered,
      col(importanceCol.getOrElse(idCol)), col(idCol), budget)
    val attrPairs = attrCols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val rows = budgeted.select(col("z").cast("int"), col("x"), col("y"),
      col("density_rank"), col(idCol).cast("long").as("fid"),
      col("coords"), col("ring_sizes"), col("poly_sizes"),
      col("shared_flat"), map(attrPairs: _*).as("attrs"))

    rows.as[(Int, Long, Long, Int, Long, Array[Double], Array[Int], Array[Int], Array[Double], Map[String, String])]
      .groupByKey { case (z, x, y, _, _, _, _, _, _, _) => (z, x, y) }
      .mapGroups { (key: (Int, Long, Long),
                    it: Iterator[(Int, Long, Long, Int, Long, Array[Double], Array[Int], Array[Int], Array[Double], Map[String, String])]) =>
        val (z, x, y) = key
        val feats = it.toSeq.sortBy(t => (t._4, t._5)).flatMap {
          case (_, _, _, _, fid, coords, ringSizes, polySizes, sharedFlat, attrs) =>
            val rings = tileRings(z, x, y,
              unflatten(coords, ringSizes, polySizes), simplifyPx,
              if (sharedBorders) Some(toSegSetFlat(sharedFlat)) else None)
            if (rings.isEmpty) None
            else Some(Mvt.Feature(fid, Mvt.PolygonGeom, rings,
              attrs.toSeq.filter(_._2 != null).sortBy(_._1)))
        }
        val (kept, bytes) =
          if (coalesce) coalesceToByteBudget(layerName, feats, byteBudget)
          else fitToByteBudget(layerName, feats, byteBudget)
        (z, x, y, kept, bytes)
      }
      .toDF("z", "x", "y", "n_features", "tile_bytes")
      .filter(col("n_features") > 0)
  }

  private def toSegSet(segs: Seq[Seq[Seq[Double]]])
      : Set[((Double, Double), (Double, Double))] =
    segs.map { s =>
      ((s(0)(0), s(0)(1)), (s(1)(0), s(1)(1)))
    }.toSet

  // -------------------------------------------------------------------
  // Flattened geometry wire format. The per-(tile, feature) rows that
  // cross the tile shuffle carried array<array<array<array<double>>>> —
  // and the Catalyst codec for nested Seqs was measured at ~95% of the
  // whole tile-build kernel's cost (the geometry math is cheap). The
  // shuffle rows now carry primitive arrays (coords interleaved
  // lon,lat; per-ring point counts; per-polygon ring counts), which use
  // the fast primitive-array encoders, and the nested structure is
  // rebuilt with plain Scala inside the kernel.

  /** coords/sizes → the nested polygons layout [[tileRings]] consumes. */
  private def unflatten(coords: Array[Double], ringSizes: Array[Int],
                        polySizes: Array[Int]): Seq[Seq[Seq[Seq[Double]]]] = {
    val polys = Vector.newBuilder[Seq[Seq[Seq[Double]]]]
    var ri = 0
    var ci = 0
    var pi = 0
    while (pi < polySizes.length) {
      val rings = Vector.newBuilder[Seq[Seq[Double]]]
      var r = 0
      while (r < polySizes(pi)) {
        val npts = ringSizes(ri); ri += 1
        val pts = new Array[Seq[Double]](npts)
        var j = 0
        while (j < npts) {
          pts(j) = Seq(coords(ci), coords(ci + 1)); ci += 2; j += 1
        }
        rings += scala.collection.immutable.ArraySeq.unsafeWrapArray(pts)
        r += 1
      }
      polys += rings.result()
      pi += 1
    }
    polys.result()
  }

  /** Flat (ax,ay,bx,by)* segment array → canonical segment set. */
  private def toSegSetFlat(flat: Array[Double])
      : Set[((Double, Double), (Double, Double))] = {
    val b = Set.newBuilder[((Double, Double), (Double, Double))]
    var i = 0
    while (i + 3 < flat.length) {
      b += (((flat(i), flat(i + 1)), (flat(i + 2), flat(i + 3))))
      i += 4
    }
    b.result()
  }

  /** Replace the nested polygons + shared_segs columns with the flat
    * wire format — applied BEFORE the tile fan-out, so the flattening
    * runs once per FEATURE and only primitive arrays ride the
    * per-(tile, feature) rows into the shuffle.
    */
  private def withFlatGeom(df: DataFrame, polygonsCol: String): DataFrame =
    df.withColumn("coords", flatten(flatten(flatten(col(polygonsCol)))))
      .withColumn("ring_sizes", flatten(transform(col(polygonsCol),
        p => transform(p, r => size(r)))))
      .withColumn("poly_sizes", transform(col(polygonsCol), p => size(p)))
      .withColumn("shared_flat", flatten(flatten(col("shared_segs"))))
      .drop(polygonsCol, "shared_segs")

  /** The per-(tile, feature) geometry kernel shared by the fused and
    * split builds: project → simplify → clip → quantize → MVT winding.
    * Empty result ⇒ the feature misses this tile.
    *
    * With `sharedSegs` (T3 `--detect-shared-borders` consume half), the
    * ring is split at junction vertices into shared/private runs and
    * each run simplifies independently — shared runs in canonical
    * direction, so the border's two owners emit identical simplified
    * polylines (gap-free across features, per zoom).
    */
  private def tileRings(z: Int, x: Long, y: Long,
                        polygons: Seq[Seq[Seq[Seq[Double]]]],
                        simplifyPx: Double,
                        sharedSegs: Option[Set[((Double, Double), (Double, Double))]] = None)
      : Seq[Seq[(Int, Int)]] = {
    val ox = x * 4096.0; val oy = y * 4096.0
    polygons.flatMap { poly =>
      val quantized = poly.map { ring =>
        val simp = sharedSegs match {
          case Some(set) if simplifyPx > 0 =>
            // open the ring; flags from LONLAT canonical pairs, geometry
            // simplified in projected world-px (same tolerance space as
            // the plain path)
            val open = if (ring.length > 1 && ring.head == ring.last)
              ring.dropRight(1) else ring
            val pts = open.map(p => (p(0), p(1))).toIndexedSeq
            val flags = pts.indices.map { i =>
              val a = pts(i); val b = pts((i + 1) % pts.length)
              val canon = if (Ordering[(Double, Double)].lteq(a, b)) (a, b)
                          else (b, a)
              set.contains(canon)
            }
            val proj = pts.map { case (lo, la) => Geometry.worldPx(lo, la, z) }
            Geometry.simplifySharedAware(proj, flags, simplifyPx)
          case _ =>
            val proj = ring.map(p => Geometry.worldPx(p(0), p(1), z))
            if (simplifyPx > 0) Tiling.simplify(proj, simplifyPx) else proj
        }
        Geometry.quantizeRing(
          Geometry.clipRing(simp, ox, oy, ox + 4096, oy + 4096), ox, oy)
      }
      // exterior gone ⇒ whole polygon gone; holes keep MVT winding
      if (quantized.isEmpty || quantized.head.isEmpty) Seq.empty
      else Geometry.orient(quantized.head, exterior = true) +:
        quantized.tail.filter(_.nonEmpty)
          .map(Geometry.orient(_, exterior = false))
    }
  }

  /** Stage 1 of the polygon build — everything DECADE-INDEPENDENT: bbox
    * cover fan-out, per-tile simplify/clip/quantize. The reference builds
    * its base choropleth tileset exactly once and then `tile-join`s each
    * decade's CSV onto it (`build.sh:139-160` once, `:208-211` per
    * decade); persisting this stage's output and re-running only
    * [[encodePolygonTiles]] per decade reproduces that shape — the
    * geometry pipeline (the expensive half) never re-runs.
    *
    * @return (z, x, y, density_rank, fid, rings_flat, ring_sizes) —
    *         tile-local integer rings in MVT winding order, flattened
    *         (interleaved x,y + per-ring point counts: the primitive-
    *         array wire format, see [[unflatten]] notes)
    */
  def polygonTileFeatures(polys: DataFrame, idCol: String,
                          polygonsCol: String, minZoom: Int, maxZoom: Int,
                          importanceCol: Option[String] = None,
                          budget: Int = 10000,
                          simplifyPx: Double = 1.0,
                          sharedBorders: Boolean = false): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._

    val withShared =
      if (sharedBorders) Geometry.withSharedSegments(polys, idCol, polygonsCol)
      else polys.withColumn("shared_segs",
        typedLit(Seq.empty[Seq[Seq[Double]]]))
    val withBbox = Geometry.bboxColumns(col(polygonsCol))
      .foldLeft(withShared) { case (df, (n, c)) => df.withColumn(n, c) }
    val covered = Geometry.coverTiles(withFlatGeom(withBbox, polygonsCol),
      minZoom, maxZoom)
    // map-side candidate cap BEFORE the tile shuffle, like the point path
    val budgeted = Tiling.dropDensest(covered,
      col(importanceCol.getOrElse(idCol)), col(idCol), budget)
    val rows = budgeted.select(col("z").cast("int"), col("x"), col("y"),
      col("density_rank"), col(idCol).cast("long").as("fid"),
      col("coords"), col("ring_sizes"), col("poly_sizes"), col("shared_flat"))

    rows.as[(Int, Long, Long, Int, Long, Array[Double], Array[Int], Array[Int], Array[Double])]
      .map { case (z, x, y, rank, fid, coords, ringSizes, polySizes, sharedFlat) =>
        val rings = tileRings(z, x, y,
          unflatten(coords, ringSizes, polySizes), simplifyPx,
          if (sharedBorders) Some(toSegSetFlat(sharedFlat)) else None)
        val flat = new Array[Int](rings.map(_.length).sum * 2)
        var i = 0
        rings.foreach(_.foreach { p =>
          flat(i) = p._1; flat(i + 1) = p._2; i += 2
        })
        (z, x, y, rank, fid, flat, rings.map(_.length).toArray)
      }
      .toDF("z", "x", "y", "density_rank", "fid", "rings_flat", "ring_sizes")
      .filter(size(col("rings_flat")) > 0)
  }

  /** Stage 2 — per-decade attribute join + MVT encode: one broadcast-able
    * join on fid, one groupBy(z,x,y) shuffle, per-group byte-budget fold.
    * `attrs` = (fid, attrs map); features with no attr row are DROPPED
    * (tile-join `--if-matched`, `build.sh:208`).
    */
  def encodePolygonTiles(tileFeatures: DataFrame, attrs: DataFrame,
                         layerName: String,
                         byteBudget: Int = 500 * 1024,
                         coalesce: Boolean = false): DataFrame = {
    val spark = tileFeatures.sparkSession
    import spark.implicits._
    tileFeatures.join(attrs, Seq("fid"))
      .select(col("z"), col("x"), col("y"), col("density_rank"), col("fid"),
        col("rings_flat"), col("ring_sizes"), col("attrs"))
      .as[(Int, Long, Long, Int, Long, Array[Int], Array[Int], Map[String, String])]
      .groupByKey { case (z, x, y, _, _, _, _, _) => (z, x, y) }
      .mapGroups { (key: (Int, Long, Long),
                    it: Iterator[(Int, Long, Long, Int, Long, Array[Int], Array[Int], Map[String, String])]) =>
        val (z, x, y) = key
        val feats = it.toSeq.sortBy(t => (t._4, t._5)).map {
          case (_, _, _, _, fid, flat, ringSizes, attrs) =>
            var ci = 0
            val rings = ringSizes.toIndexedSeq.map { n =>
              val ring = new Array[(Int, Int)](n)
              var j = 0
              while (j < n) { ring(j) = (flat(ci), flat(ci + 1)); ci += 2; j += 1 }
              scala.collection.immutable.ArraySeq.unsafeWrapArray(ring): Seq[(Int, Int)]
            }
            Mvt.Feature(fid, Mvt.PolygonGeom, rings,
              attrs.toSeq.filter(_._2 != null).sortBy(_._1))
        }
        val (kept, bytes) =
          if (coalesce) coalesceToByteBudget(layerName, feats, byteBudget)
          else fitToByteBudget(layerName, feats, byteBudget)
        (z, x, y, kept, bytes)
      }
      .toDF("z", "x", "y", "n_features", "tile_bytes")
      .filter(col("n_features") > 0)
  }

  /** `--coalesce-smallest-as-needed` (`build.sh:139-160`): when a tile
    * overflows its byte budget, MERGE attribute-identical features into
    * one multi-ring feature — smallest (fewest vertices) groups first —
    * instead of dropping coverage; only if every mergeable group is
    * coalesced and the tile still overflows does it fall back to the
    * importance-ordered prefix drop. Merging strictly shrinks the
    * encoding (duplicate ids/tags/geometry headers collapse), so the
    * "how many groups to coalesce" search is binary, O(log n) encodes.
    * Returns (kept feature count after merging, layer bytes).
    */
  private[graft] def coalesceToByteBudget(layerName: String,
                                          feats: Seq[Mvt.Feature],
                                          byteBudget: Int): (Int, Array[Byte]) = {
    val full = Mvt.encodeLayer(layerName, feats)
    if (full.length <= byteBudget) return (feats.length, full)
    // mergeable groups: ≥2 features sharing the exact attr list,
    // smallest total vertex count first (deterministic tie on min id)
    val groups = feats.zipWithIndex.groupBy(_._1.attrs).values
      .filter(_.length >= 2).toSeq
      .sortBy(g => (g.map(_._1.rings.map(_.length).sum).sum, g.map(_._1.id).min))
    def coalesced(k: Int): Seq[Mvt.Feature] = {
      val merged = groups.take(k).map { g =>
        val members = g.sortBy(_._2) // keep importance order
        (members.head._2, Mvt.Feature(members.map(_._1.id).min,
          Mvt.PolygonGeom, members.flatMap(_._1.rings), members.head._1.attrs))
      }.toMap
      val dropIdx = groups.take(k).flatMap(_.drop(1).map(_._2)).toSet
      feats.indices.collect {
        case i if merged.contains(i) => merged(i)
        case i if !dropIdx.contains(i) && !merged.contains(i) => feats(i)
      }
    }
    // everything coalesced and still over budget ⇒ fall back to drop
    val allMerged = coalesced(groups.length)
    val allEnc = Mvt.encodeLayer(layerName, allMerged)
    if (allEnc.length > byteBudget)
      return fitToByteBudget(layerName, allMerged, byteBudget)
    // smallest k whose encoding fits (k=0 overflows, k=|groups| fits)
    var lo = 1; var hi = groups.length
    var best = allMerged; var bytes = allEnc
    while (lo < hi) {
      val mid = (lo + hi) / 2
      val cand = coalesced(mid)
      val enc = Mvt.encodeLayer(layerName, cand)
      if (enc.length <= byteBudget) { hi = mid; best = cand; bytes = enc }
      else lo = mid + 1
    }
    (best.length, bytes)
  }

  /** Drop-densest on a BYTE budget: the largest importance-ordered
    * prefix of `feats` whose encoded layer fits `byteBudget`. Encoded
    * size is monotone in prefix length (key/value interning only ever
    * adds bytes), so a binary search needs O(log n) re-encodes — and
    * only for tiles that actually overflow.
    * Returns (kept feature count, layer bytes).
    */
  private[graft] def fitToByteBudget(layerName: String,
                                     feats: Seq[Mvt.Feature],
                                     byteBudget: Int): (Int, Array[Byte]) = {
    val full = Mvt.encodeLayer(layerName, feats)
    if (full.length <= byteBudget) return (feats.length, full)
    var lo = 0 // invariant: prefix of length lo fits (empty layer best-effort)
    var hi = feats.length // invariant: prefix of length hi overflows
    var best = Mvt.encodeLayer(layerName, Seq.empty)
    while (lo + 1 < hi) {
      val mid = (lo + hi) / 2
      val enc = Mvt.encodeLayer(layerName, feats.take(mid))
      if (enc.length <= byteBudget) { lo = mid; best = enc } else hi = mid
    }
    (lo, best)
  }

  /** S7: explode tiles to a `z/x/y.pbf` directory tree + metadata.json
    * (`build.sh:219-228`). Executor-side writes THROUGH THE HADOOP
    * FILESYSTEM API (r17): `outDir` takes any configured scheme — a
    * local path, a shared mount, hdfs://, s3a:// — because this is the
    * tree the reference deploys to an object store
    * (`deploy-source.sh:38-45`, `build.sh:222-228` aws s3 sync). The
    * session's Hadoop conf (scheme→impl mappings, credentials set via
    * `spark.hadoop.*`) ships to executors as plain entries; checksum
    * sidecars are disabled so the local layout stays byte-identical to
    * the previous direct-IO writer (IncrementalSpec's tree parity
    * rides on that). Scheme-pluggability is spec-proven offline
    * through a foreign `mock://` filesystem (SchemeFsSpec) — s3a is
    * the same seam with credentials, which the sandbox cannot reach.
    */
  /** @param writeMetadata false for IN-PLACE tree updates
    *                      ([[graft.Incremental]]): the live tree's
    *                      metadata.json is decade-level and already
    *                      correct — rewriting it from this call's
    *                      (empty) map would clobber bounds/zooms/layers
    */
  def writePbfDirectory(tiles: DataFrame, outDir: String,
                        metadata: Map[String, String] = Map.empty,
                        writeMetadata: Boolean = true): Unit = {
    // Configuration is not serializable: ship the entries BROADCAST
    // (once per executor, not per task — ~100 KB of strings); the
    // per-partition cost is one fsCache lookup after the first
    // partition of a given (scheme, authority, conf) builds the client
    val confEntries = tiles.sparkSession.sparkContext.broadcast {
      val c = tiles.sparkSession.sessionState.newHadoopConf()
      val it = c.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += e.getKey -> e.getValue }
      buf.toSeq
    }
    def writeFile(fs: org.apache.hadoop.fs.FileSystem,
                  path: org.apache.hadoop.fs.Path,
                  bytes: Array[Byte]): Unit = {
      // create(overwrite = true) makes parents and truncate-overwrites —
      // the idempotent re-run contract Incremental relies on
      val out = fs.create(path, true)
      try out.write(bytes) finally out.close()
    }
    // the ~100 KB conf broadcast is per-CALL state: destroy it once the
    // action finishes — SUCCESS OR FAILURE (r18 ADVICE: a destroy after
    // the action leaked the broadcast on every failed call, the exact
    // accumulation it exists to prevent in the nightly loop)
    try {
      tiles.select("z", "x", "y", "tile_bytes").foreachPartition {
        (it: Iterator[Row]) =>
          // cached per executor JVM — do NOT close; see [[ExecutorFs]]
          val fs = ExecutorFs.forPath(confEntries.value, outDir)
          it.foreach { r =>
            writeFile(fs, new org.apache.hadoop.fs.Path(
              s"$outDir/${r.getAs[Any]("z")}/${r.getAs[Any]("x")}/" +
                s"${r.getAs[Any]("y")}.pbf"),
              r.getAs[Array[Byte]]("tile_bytes"))
          }
      }
    } finally confEntries.destroy()
    if (writeMetadata) {
      val meta = (metadata + ("format" -> "pbf"))
        .map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
      val conf = tiles.sparkSession.sessionState.newHadoopConf()
      val fs = org.apache.hadoop.fs.FileSystem.newInstance(
        new org.apache.hadoop.fs.Path(outDir).toUri, conf)
      try {
        fs.setWriteChecksum(false)
        writeFile(fs,
          new org.apache.hadoop.fs.Path(s"$outDir/metadata.json"),
          meta.getBytes("UTF-8"))
      } finally fs.close()
    }
  }
}

/** Executor-JVM-wide cache of PRIVATE checksum-disabled FileSystem
  * instances, keyed by (scheme, authority, conf fingerprint). This
  * restores the amortization the shared Hadoop FileSystem CACHE used to
  * give — one client per scheme per JVM; an object-store client build
  * (connection pools, signer setup) costs tens of ms, and per-PARTITION
  * construction multiplies that by the tile partition count — without
  * the r17 hazard of mutating the SHARED cached instance's checksum
  * flag. Instances live for the executor's life, one per distinct key
  * (the same lifecycle Hadoop's own cache gives); a conf change mints a
  * new key, so a stale instance can never serve fresh credentials — the
  * superseded one idles, bounded by the number of distinct confs the
  * JVM ever sees. A standalone top-level object so closures calling
  * [[forPath]] reference `ExecutorFs$.MODULE$` statically instead of
  * capturing the (non-serializable) enclosing sink object.
  */
private[sinks] object ExecutorFs {
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Int), org.apache.hadoop.fs.FileSystem]()

  def forPath(entries: Seq[(String, String)],
              dir: String): org.apache.hadoop.fs.FileSystem = {
    val uri = new org.apache.hadoop.fs.Path(dir).toUri
    val key = (String.valueOf(uri.getScheme),
      String.valueOf(uri.getAuthority), entries.hashCode)
    cache.computeIfAbsent(key, _ => {
      val conf = new org.apache.hadoop.conf.Configuration(true)
      entries.foreach { case (k, v) => conf.set(k, v) }
      // newInstance, NOT the process-wide cached FileSystem: the
      // checksum flag below would otherwise silently disable .crc
      // sidecars for every other writer of this scheme in the JVM
      // (r17 ADVICE) — the private instance lives in this cache
      val fs = org.apache.hadoop.fs.FileSystem.newInstance(uri, conf)
      // no .crc sidecars in the tree (LocalFileSystem is checksummed
      // by default; object stores ignore this)
      fs.setWriteChecksum(false)
      fs
    })
  }
}
