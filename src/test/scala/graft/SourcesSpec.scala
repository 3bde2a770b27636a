package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** Source/sink tests (SURVEY.md §2.1): CSV schema discipline, gzip
  * roundtrip, GeoJSON FeatureCollection scan, HLL sketch accuracy.
  */
class SourcesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("CSV: explicit schema keeps GEOID strings, empty cells null (S1/P8/P10)") {
    val dir = Files.createTempDirectory("csv").toString
    Files.write(java.nio.file.Paths.get(dir, "d.csv"),
      "id,year,name,parent_location,population\n01001,2000,A,,\n".getBytes)
    val df = Sources.readCsv(spark, s"$dir/d.csv",
      Sources.longSchema(Seq("population")))
    val r = df.collect()(0)
    assert(r.getAs[String]("id") == "01001") // leading zero survives
    assert(r.isNullAt(r.fieldIndex("parent_location"))) // empty => null
    assert(r.isNullAt(r.fieldIndex("population")))
  }

  test("quarantined CSV: ragged/mistyped rows divert to rejects, clean rows flow") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("quar").toString
    // typed schema so BOTH malformation classes occur: wrong token
    // count (ragged) and a type-cast failure (mistyped int)
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("n", IntegerType), StructField("v", StringType)))
    Files.write(java.nio.file.Paths.get(dir, "d.csv"),
      ("id,n,v\n" +
        "01001,1,a\n" + // clean
        "01003,notanint,b\n" + // mistyped -> corrupt
        "01005,2\n" + // too few tokens -> corrupt
        "01007,3,c,EXTRA\n" + // too many tokens -> corrupt
        "01009,4,d\n" // clean
        ).getBytes("UTF-8"))
    val rejects = s"$dir/rejects"
    val q = Sources.readCsvQuarantined(spark, s"$dir/d.csv", schema,
      rejectsOut = Some(rejects), maxRejectFraction = 0.8)
    assert(q.total == 5 && q.rejected == 3, s"${q.total}/${q.rejected}")
    val clean = q.clean.orderBy("id").collect()
    assert(clean.map(_.getString(0)).toSeq == Seq("01001", "01009"))
    assert(!q.clean.columns.contains("_graft_corrupt"))
    // rejects channel carries each raw line for triage
    val raw = spark.read.option("header", true).csv(rejects)
      .collect().map(_.getAs[String]("raw_record")).toSet
    assert(raw == Set("01003,notanint,b", "01005,2", "01007,3,c,EXTRA"), raw)
    // mass rejection aborts loudly instead of silently dropping the corpus
    val e = intercept[IllegalStateException] {
      Sources.readCsvQuarantined(spark, s"$dir/d.csv", schema,
        maxRejectFraction = 0.1)
    }
    assert(e.getMessage.contains("3 of 5"), e.getMessage)
  }

  test("quarantined CSV: landing the clean frame to parquet restores pruning") {
    import org.apache.spark.sql.types._
    // the barrier frame deliberately defeats column pruning (pruning
    // would re-admit rejected rows); the documented escape hatch for
    // wide repeatedly-consumed tables is to land the clean frame ONCE
    // and read the staged parquet — which must prune normally again
    val dir = Files.createTempDirectory("quar-land").toString
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("a", IntegerType), StructField("b", IntegerType),
      StructField("c", StringType)))
    Files.write(java.nio.file.Paths.get(dir, "d.csv"),
      ("id,a,b,c\n" + (0 until 50).map(i => s"r$i,$i,${i * 2},x$i\n").mkString +
        "bad,notanint,0,y\n").getBytes("UTF-8"))
    val q = Sources.readCsvQuarantined(spark, s"$dir/d.csv", schema,
      maxRejectFraction = 0.5)
    assert(q.rejected == 1)
    // the barrier frame: a 2-column projection still parses full-width
    val barrierScan = q.clean.select("id", "a")
      .queryExecution.executedPlan.toString
    assert(!barrierScan.contains("ReadSchema"),
      "the quarantine frame must NOT be a prunable file scan")
    // the escape hatch: land once, read staged — pruning is back
    val staged = s"$dir/staged.parquet"
    q.clean.write.parquet(staged)
    val pruned = spark.read.parquet(staged).select("id", "a")
      .queryExecution.executedPlan.toString
    assert(pruned.contains("ReadSchema: struct<id:string,a:int>"),
      s"staged parquet must prune to the projection:\n$pruned")
    assert(spark.read.parquet(staged).count() == 50)
  }

  test("CSV sink: gzip'd single-file write reads back identically (S2/S3/S8)") {
    val df = Seq(("01001", "a"), ("02013", "b")).toDF("GEOID", "n")
    val out = Files.createTempDirectory("gz").toString + "/out"
    Sources.writeCsv(df, out, singleFile = true, gzip = true)
    val files = new java.io.File(out).listFiles.filter(_.getName.endsWith(".csv.gz"))
    assert(files.length == 1) // single gzip'd part
    val back = spark.read.option("header", true).csv(out)
    assert(back.orderBy("GEOID").collect().map(_.getString(0)).toSeq ==
      Seq("01001", "02013"))
  }

  test("JSONL sink: gzip'd shards bounded by maxRecordsPerShard round-trip") {
    import org.apache.spark.sql.types._
    val docs = (0L until 10L).map(i => (i, s"doc $i text", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Files.createTempDirectory("jsonl").toString + "/export"
    Sources.writeJsonl(docs.repartition(1), out, gzip = true,
      maxRecordsPerShard = 4)
    val files = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".json.gz"))
    // 10 records / 4-per-shard cap from one task => 3 shards
    assert(files.length == 3, files.map(_.getName).mkString(","))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val back = Sources.readJsonl(spark, out, schema)
    assert(back.count() == 10)
    assert(back.schema == schema) // explicit schema, no inference drift
    assert(back.orderBy("doc_id").collect().map(_.getLong(0)).toSeq ==
      (0L until 10L).toSeq)
  }

  test("GeoJSON scan explodes FeatureCollection into keyed rows (S4/S5)") {
    val gj =
      """{"type": "FeatureCollection", "features": [
        |{"type": "Feature", "properties": {"GEOID": "02"},
        | "geometry": {"type": "Point", "coordinates": [1.5, 2.5]}},
        |{"type": "Feature", "properties": {"GEOID": "01"},
        | "geometry": {"type": "Polygon", "coordinates": [[[0,0],[1,0],[1,1],[0,0]]]}}
        |]}""".stripMargin
    val dir = Files.createTempDirectory("gj").toString
    Files.write(java.nio.file.Paths.get(dir, "f.geojson"), gj.getBytes)
    val rows = Sources.featureLines(Sources.readGeoJson(spark, s"$dir/f.geojson"))
      .collect()
    assert(rows.map(_.getAs[String]("GEOID")).toSeq == Seq("01", "02")) // sorted
    assert(rows(0).getAs[String]("geom_type") == "Polygon")
    assert(rows(1).getAs[String]("geometry_json").contains("1.5"))
  }

  test("HLL approx_count_distinct is within 5% of exact (G7 scale path)") {
    val df = spark.range(0, 20000).select(($"id" % 5000).as("k"))
    val r = df.agg(
      countDistinct($"k").as("exact"),
      approx_count_distinct($"k", rsd = 0.02).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
