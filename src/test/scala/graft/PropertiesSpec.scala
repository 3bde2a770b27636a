package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Tiling
import graft.sinks.Mvt

/** ScalaCheck properties over the pure kernels (SURVEY.md §5 item 3). */
object TilingProperties extends Properties("tiling") {

  private val coord = Gen.choose(-1000.0, 1000.0)
  private val pointGen = Gen.zip(coord, coord)
  private val ringGen = for {
    n <- Gen.choose(3, 12)
    pts <- Gen.listOfN(n, pointGen)
  } yield pts

  property("simplify keeps endpoints and is a subsequence") =
    forAll(ringGen, Gen.choose(0.0, 50.0)) { (line, tol) =>
      val out = Tiling.simplify(line, tol)
      out.head == line.head && out.last == line.last &&
        out.forall(line.contains) && out.length <= line.length
    }

  property("simplify with tolerance 0 is identity") =
    forAll(ringGen) { line => Tiling.simplify(line, 0.0) == line }

  property("centroid of a convex quad lies inside it") =
    forAll(Gen.choose(1.0, 100.0), Gen.choose(1.0, 100.0)) { (w, h) =>
      val rect = Seq((0.0, 0.0), (w, 0.0), (w, h), (0.0, h), (0.0, 0.0))
      val (cx, cy) = Tiling.centroid(rect)
      cx > 0 && cx < w && cy > 0 && cy < h
    }

  property("polylabel of a rectangle is its center (max inscribed circle)") =
    forAll(Gen.choose(2.0, 50.0), Gen.choose(2.0, 50.0)) { (w, h) =>
      val rect = Seq((0.0, 0.0), (w, 0.0), (w, h), (0.0, h), (0.0, 0.0))
      val (px, py) = Tiling.polylabel(rect, 1e-3)
      // distance to edge at the pole == min(w,h)/2 within precision
      math.abs(Tiling.signedDist(px, py, rect) - math.min(w, h) / 2) < 0.05
    }

  property("signedDist is positive inside, negative outside") =
    forAll(Gen.choose(1.0, 50.0)) { s =>
      val sq = Seq((0.0, 0.0), (s, 0.0), (s, s), (0.0, s), (0.0, 0.0))
      Tiling.signedDist(s / 2, s / 2, sq) > 0 &&
        Tiling.signedDist(-1.0, -1.0, sq) < 0
    }

  property("MVT point geometry roundtrips through zigzag deltas") =
    forAll(Gen.listOfN(5, Gen.zip(Gen.choose(0, 4095), Gen.choose(0, 4095)))) {
      pts =>
        val cmds = Mvt.encodeGeometry(Mvt.PointGeom, Seq(pts))
        def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1)
        val decoded = cmds.tail.grouped(2).scanLeft((0L, 0L)) {
          case ((x, y), Seq(dx, dy)) => (x + unzig(dx), y + unzig(dy))
        }.drop(1).toSeq
        decoded == pts.map(p => (p._1.toLong, p._2.toLong))
    }
}
