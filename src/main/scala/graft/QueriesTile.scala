package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Tiling, Windows}

/** Tiling query batch (SURVEY.md §2.10 M7): slippy-map tile assignment,
  * per-tile density ranking, bubble centers. Synthetic deterministic
  * lon/lat points derived from customer keys (+0.5 offsets keep points
  * far from tile edges, so the rounded web-mercator formula is
  * engine-stable).
  */
object QueriesTile {
  import Tables._

  /** Deterministic point cloud: one point per customer. */
  private def points(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      lpad(col("c_custkey").cast("string"), 8, "0").as("geoid"),
      col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
      ((col("c_custkey") * 7) % 360 - 180 + 0.5).cast("double").as("lon"),
      ((col("c_custkey") * 13) % 160 - 80 + 0.5).cast("double").as("lat"))

  private val pointsSql =
    """SELECT lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS geoid,
      |  c_custkey, c_nationkey, c_acctbal,
      |  CAST((c_custkey * 7) % 360 - 180 + 0.5 AS DOUBLE) AS lon,
      |  CAST((c_custkey * 13) % 160 - 80 + 0.5 AS DOUBLE) AS lat
      |FROM customer""".stripMargin

  /** DuckDB web-mercator tile formulas (must mirror Tiling.tileX/tileY
    * including the 6-decimal pre-floor round).
    */
  private def tileXSql(z: Int): String = {
    val n = 1L << z
    s"least(${n - 1}, greatest(0, CAST(floor(round((lon + 180.0) / 360.0 * $n, 6)) AS BIGINT)))"
  }
  private def tileYSql(z: Int): String = {
    val n = 1L << z
    val latc = s"least(85.05112878, greatest(-85.05112878, lat))"
    s"""least(${n - 1}, greatest(0, CAST(floor(round(
       |  (1.0 - ln(tan(radians($latc)) + 1.0 / cos(radians($latc))) / pi()) / 2.0 * $n,
       |  6)) AS BIGINT)))""".stripMargin
  }

  // ---------------------------------------------------------------------
  // T4 tile assignment: every point fans out to its (z,x,y) for z 3..6;
  // per-tile feature counts = the tile-build shuffle in miniature.
  def q31TileAssign(s: SparkSession, d: String): DataFrame =
    Tiling.assignTiles(points(s, d), "lon", "lat", minZoom = 3, maxZoom = 6)
      .groupBy("z", "x", "y")
      .agg(count(lit(1)).as("n_features"))
      .orderBy("z", "x", "y")

  val q31Sql: String = {
    val zs = (3 to 6).map { z =>
      s"SELECT $z AS z, ${tileXSql(z)} AS x, ${tileYSql(z)} AS y FROM pts"
    }.mkString("\nUNION ALL ")
    s"""WITH pts AS ($pointsSql),
       |assigned AS ($zs)
       |SELECT z, x, y, count(*) AS n_features
       |FROM assigned GROUP BY z, x, y ORDER BY z, x, y""".stripMargin
  }

  // ---------------------------------------------------------------------
  // O4 density drop: per z=5 tile, keep the 3 highest-balance features
  // (tippecanoe --drop-densest-as-needed with a budget of 3).
  def q32TileDensityDrop(s: SparkSession, d: String): DataFrame =
    Tiling.dropDensest(
        Tiling.assignTiles(points(s, d), "lon", "lat", 5, 5),
        col("c_acctbal"), col("c_custkey"), budget = 3)
      .select(col("z"), col("x"), col("y"), col("geoid"),
        col("c_acctbal").as("bal"), col("density_rank"))
      .orderBy("z", "x", "y", "density_rank")

  val q32Sql: String =
    s"""WITH pts AS ($pointsSql),
       |assigned AS (
       | SELECT 5 AS z, ${tileXSql(5)} AS x, ${tileYSql(5)} AS y,
       |        geoid, c_acctbal, c_custkey
       | FROM pts),
       |ranked AS (
       | SELECT z, x, y, geoid, c_acctbal AS bal,
       |  row_number() OVER (PARTITION BY z, x, y
       |    ORDER BY c_acctbal DESC, c_custkey) AS density_rank
       | FROM assigned)
       |SELECT z, x, y, geoid, bal, density_rank
       |FROM ranked WHERE density_rank <= 3
       |ORDER BY z, x, y, density_rank""".stripMargin

  // ---------------------------------------------------------------------
  // T1 bubble centers (fast path): per-nation centroid of the point
  // cloud. The concave-safe polylabel variant is exercised in unit tests
  // (not SQL-expressible).
  def q33BubbleCenters(s: SparkSession, d: String): DataFrame =
    points(s, d)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_points"),
        round(avg("lon"), 6).as("center_lon"),
        round(avg("lat"), 6).as("center_lat"))
      .orderBy("c_nationkey")

  val q33Sql: String =
    s"""WITH pts AS ($pointsSql)
       |SELECT c_nationkey, count(*) AS n_points,
       | round(avg(lon), 6) AS center_lon, round(avg(lat), 6) AS center_lat
       |FROM pts GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_tile_assign" -> (q31TileAssign _),
    "q32_tile_density_drop" -> (q32TileDensityDrop _),
    "q33_bubble_centers" -> (q33BubbleCenters _),
  )

  val oracle: Map[String, String] = Map(
    "q31_tile_assign" -> q31Sql,
    "q32_tile_density_drop" -> q32Sql,
    "q33_bubble_centers" -> q33Sql,
  )
}
