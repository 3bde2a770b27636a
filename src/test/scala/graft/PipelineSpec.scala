package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-shaped end-to-end fixture test (FIXTURES.md §A, SURVEY.md §5
  * item 4): a tiny long CSV with every edge case runs through
  * shape → extents → decade tiles, outputs checked against hand-computed
  * goldens replicating shape-data.js / extract-extents.js semantics.
  */
class PipelineSpec extends AnyFunSuite with SharedSpark {

  /** A1-style fixture: dup (id,year) rows, missing parent_location,
    * empty metric cells, an unmapped column, non-numeric junk, leading
    * zeros.
    */
  private lazy val fixtureCsv: String = {
    val dir = Files.createTempDirectory("fixture").toString
    val csv =
      """id,year,name,parent_location,population,judgements,judgement_rate,low_flag,junk_col
        |01001,2000,Autauga,Alabama,43671,23,1.2,0,IGNORED
        |01001,2000,Autauga,Alabama,43671,24,1.3,0,IGNORED
        |01001,2001,Autauga,Alabama,44021,25,1.4,0,x
        |02013,2000,Aleutians,,2697,,not-a-number,1,y
        |""".stripMargin
    Files.write(java.nio.file.Paths.get(dir, "data.csv"), csv.getBytes("UTF-8"))
    s"$dir/data.csv"
  }

  private val metricLongNames = Seq("population", "judgements",
    "judgement_rate", "low_flag", "junk_col")

  test("shape: A2 semantics — rename, last-wins, pl default, sort, zeros") {
    val (wide, _) = Pipeline.runRegion(spark, fixtureCsv, "raw",
      metricLongNames, "counties")
    val rows = wide.collect()
    // sorted by GEOID ascending, leading zeros intact
    assert(rows.map(_.getAs[String]("GEOID")).toSeq == Seq("01001", "02013"))
    val r1 = rows(0); val r2 = rows(1)
    // duplicate (01001, 2000): last row wins -> judgements 24, rate 1.3
    assert(r1.getAs[String]("e-00") == "24")
    assert(r1.getAs[String]("er-00") == "1.3")
    // non-duplicated year cell
    assert(r1.getAs[String]("e-01") == "25")
    // missing parent_location defaults
    assert(r2.getAs[String]("pl") == "United States")
    assert(r1.getAs[String]("pl") == "Alabama")
    // empty metric cell is null, junk passes through as string cell
    assert(r2.isNullAt(r2.fieldIndex("e-00")))
    assert(r2.getAs[String]("er-00") == "not-a-number")
    // unmapped column dropped entirely
    assert(!wide.columns.exists(_.contains("junk")))
    // year columns beyond the data exist but are null (declared schema)
    assert(wide.columns.contains("e-18"))
    assert(r1.isNullAt(r1.fieldIndex("e-18")))
  }

  test("extents: A3 semantics — numeric coercion, junk/empty dropped") {
    val (_, ext) = Pipeline.runRegion(spark, fixtureCsv, "raw",
      metricLongNames, "counties")
    val byId = ext.collect().map(r => r.getAs[String]("id") -> r).toMap
    // er-00: values ("1.3" [last-wins], "not-a-number") -> only 1.3 numeric
    val er = byId("er-00")
    assert(er.getAs[Double]("vmin") == 1.3 && er.getAs[Double]("vmax") == 1.3)
    // e-00: 24 (last-wins) and null -> single value 24
    assert(byId("e-00").getAs[Double]("vmin") == 24.0)
    // p-00 spans both geoids
    assert(byId("p-00").getAs[Double]("vmin") == 2697.0)
    assert(byId("p-00").getAs[Double]("vmax") == 43671.0)
    // id columns never appear
    assert(!byId.keySet.exists(k => k == "GEOID" || k == "n" || k == "pl"))
  }

  test("runRegion with features writes merged bubble+choropleth pbf trees") {
    import spark.implicits._
    val features = Seq(("01001", -86.6, 32.5)).toDF("GEOID", "lon", "lat")
    val out = Files.createTempDirectory("tiles").toString
    Pipeline.runRegion(spark, fixtureCsv, "raw", metricLongNames,
      "counties", features = Some(features), outDir = Some(out))
    for (decade <- Seq("00", "10")) {
      val dir = new java.io.File(s"$out/counties/$decade")
      assert(dir.exists, s"missing $dir")
      assert(new java.io.File(dir, "metadata.json").exists)
      val pbfs = java.nio.file.Files.walk(dir.toPath)
        .filter(_.toString.endsWith(".pbf")).count()
      assert(pbfs > 0)
    }
    // merged tile bytes contain BOTH layer names (J3 protobuf-level merge)
    val z0 = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$out/counties/00"))
      .filter(_.toString.endsWith(".pbf")).findFirst().get()
    val bytes = java.nio.file.Files.readAllBytes(z0)
    val s0 = new String(bytes.map(b => (b & 0xff).toChar))
    assert(s0.contains("counties-00-bubble") && s0.contains("counties-00-choropleth"))
  }

  test("decade tiles: slice + if-matched join + MVT build end-to-end") {
    val (wide, _) = Pipeline.runRegion(spark, fixtureCsv, "raw",
      metricLongNames, "counties")
    import spark.implicits._
    // one feature matches, one does not (if-matched drops it), one extra
    val features = Seq(
      ("01001", -86.6, 32.5), ("99999", 0.0, 0.0))
      .toDF("GEOID", "lon", "lat")
    val tiles = Pipeline.decadeTiles(wide, features, "raw", "00",
      "choropleth", "counties")
    val rows = tiles.collect()
    assert(rows.nonEmpty)
    // only the matched feature tiles: counties choropleth z1..7 -> 7 tiles
    assert(rows.length == 7)
    assert(rows.forall(_.getAs[Int]("n_features") == 1))
    assert(rows.forall(_.getAs[Array[Byte]]("tile_bytes").length > 10))
  }
}
