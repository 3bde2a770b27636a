package graft.config

/** Static configuration mirroring the reference pipeline's dictionaries.
  *
  * The reference (EvictionLab/map-v2-etl) drives its pipeline from two JSON
  * column maps (`assets/column-map-raw.json:1-35`,
  * `assets/column-map-modeled.json:1-34`), a decade table
  * (`build.sh:34-36`), per-layer variable sets (`build.sh:172-176,193-197`)
  * and per-region tippecanoe zoom options (`build.sh:121-126,147-152`).
  * Here they are plain Scala data so every stage is config-driven and
  * testable without IO.
  */
object EtlConfig {

  /** Identity/carry columns of the wide table (never year-suffixed). */
  val idColumns: Seq[String] = Seq("GEOID", "n", "pl")

  /** Columns shared by the raw and modeled maps (long name -> short code). */
  private val commonMap: Seq[(String, String)] = Seq(
    "id" -> "GEOID",
    "name" -> "n",
    "parent_location" -> "pl",
    "population" -> "p",
    "renter_homes_pct" -> "pro",
    "median_gross_rent" -> "mgr",
    "median_household_income" -> "mhi",
    "median_property_value" -> "mpv",
    "rent_burden" -> "rb",
    "white_pct" -> "pw",
    "black_pct" -> "paa",
    "latinx_pct" -> "ph",
    "aian_pct" -> "pai",
    "asian_pct" -> "pa",
    "nhpi_pct" -> "pnp",
    "multiple_pct" -> "pm",
    "other_pct" -> "po",
    "poverty_rate" -> "pr",
    "threatened" -> "t",
    "threatened_low" -> "tl",
    "threatened_high" -> "th",
    "threatened_rate" -> "tr",
    "threatened_rate_high" -> "trh",
    "threatened_rate_low" -> "trl",
    "filings" -> "ef",
    "filings_high" -> "efh",
    "filings_low" -> "efl",
    "filing_rate" -> "efr",
    "filing_rate_low" -> "efrl",
    "filing_rate_high" -> "efrh",
  )

  /** Raw input type: court judgement counts (`column-map-raw.json:20-21,34`). */
  val columnMapRaw: Seq[(String, String)] = commonMap ++ Seq(
    "judgements" -> "e",
    "judgement_rate" -> "er",
    "low_flag" -> "lf",
  )

  /** Modeled input type: modeled eviction estimates
    * (`column-map-modeled.json:20-21`; no `low_flag`).
    */
  val columnMapModeled: Seq[(String, String)] = commonMap ++ Seq(
    "evictions" -> "e",
    "eviction_rate" -> "er",
  )

  def columnMap(inputType: String): Seq[(String, String)] = inputType match {
    case "raw"     => columnMapRaw
    case "modeled" => columnMapModeled
    case other     => throw new IllegalArgumentException(s"unknown input type: $other")
  }

  /** Default for a missing `parent_location` (`shape-data.js:44-47`). */
  val parentLocationDefault = "United States"

  /** Decade column groups: each tileset carries ~10 years of columns to cap
    * payload size (`build.sh:34-36`, rationale `README.md:10`).
    */
  val decades: Map[String, Seq[String]] = Map(
    "00" -> (0 to 9).map(y => f"$y%02d"),
    "10" -> (10 to 18).map(y => f"$y%02d"),
  )

  /** All year suffixes 2000-2018 in order. */
  val allYears: Seq[String] = (0 to 18).map(y => f"$y%02d")

  /** Bubble-layer variable codes per input type (`build.sh:172-176`). */
  val bubbleVars: Map[String, Seq[String]] = Map(
    "raw" -> Seq("er", "efr", "tr"),
    "modeled" -> Seq("efr", "tr"),
  )

  /** Choropleth-layer variable codes per input type (`build.sh:193-197`). */
  val choroplethVars: Map[String, Seq[String]] = Map(
    "raw" -> Seq("p", "pr", "pro", "mgr", "mhi", "mpv", "rb", "pw", "paa",
      "ph", "pai", "pa", "pnp", "pm", "po", "e", "er", "t", "tr", "ef", "efr"),
    "modeled" -> Seq("p", "pr", "pro", "mgr", "mhi", "mpv", "rb", "pw", "paa",
      "ph", "pai", "pa", "pnp", "pm", "po", "t", "tl", "th", "tr", "trl",
      "trh", "ef", "efl", "efh", "efr", "efrl", "efrh"),
  )

  /** Field list for one (layer, inputType, decade): `GEOID,n,pl` plus each
    * var crossed with each year of the decade (`build.sh:177-188,198-209`).
    */
  def decadeFields(vars: Seq[String], decade: String): Seq[String] =
    idColumns ++ (for (v <- vars; y <- decades(decade)) yield s"$v-$y")

  /** Per-region tile zoom envelopes (`build.sh:121-126,147-152`).
    * `extend` = tippecanoe `--extend-zooms-if-still-dropping`: the dense
    * point regions may deepen maxZoom until the density limiter stops
    * dropping ([[graft.operators.Tiling.extendMaxZoom]]). Choropleth
    * regions using the coalesce strategy never drop, so extension only
    * matters for the point/bubble layers (and cities choropleth, which
    * shares the bubble geometry density profile).
    */
  final case class ZoomSpec(minZoom: Int, maxZoom: Int, baseZoom: Int,
                            extend: Boolean = false)

  val bubbleZoom: Map[String, ZoomSpec] = Map(
    "states" -> ZoomSpec(0, 6, 1),
    "counties" -> ZoomSpec(0, 7, 2),
    "cities" -> ZoomSpec(0, 9, 7, extend = true),
    "tracts" -> ZoomSpec(0, 10, 9, extend = true),
    "block-groups" -> ZoomSpec(0, 10, 10, extend = true),
  )

  val choroplethZoom: Map[String, ZoomSpec] = Map(
    "states" -> ZoomSpec(0, 6, 6),
    "counties" -> ZoomSpec(1, 7, 7, extend = true),
    "cities" -> ZoomSpec(2, 9, 9, extend = true),
    "tracts" -> ZoomSpec(7, 10, 10, extend = true),
    "block-groups" -> ZoomSpec(8, 10, 10, extend = true),
  )

  /** Per-region choropleth build knobs (`build.sh:148-152`): tippecanoe
    * `--simplification` scale (mapped to the Douglas-Peucker pixel
    * tolerance at the 4096 extent — an approximation of tippecanoe's
    * internal tolerance unit) and the over-budget strategy
    * (`--coalesce-smallest-as-needed` for the dense polygon regions vs
    * `--drop-densest-as-needed` for cities; states set no strategy).
    */
  final case class ChoroplethBuild(simplifyPx: Double, coalesce: Boolean,
                                   sharedBorders: Boolean)

  val choroplethBuild: Map[String, ChoroplethBuild] = Map(
    "states" -> ChoroplethBuild(10.0, coalesce = false, sharedBorders = true),
    "counties" -> ChoroplethBuild(10.0, coalesce = true, sharedBorders = true),
    "cities" -> ChoroplethBuild(10.0, coalesce = false, sharedBorders = false),
    "tracts" -> ChoroplethBuild(25.0, coalesce = true, sharedBorders = true),
    "block-groups" -> ChoroplethBuild(25.0, coalesce = true, sharedBorders = true),
  )

  /** The five region granularities (`build.sh:28`). */
  val regions: Seq[String] =
    Seq("states", "counties", "cities", "tracts", "block-groups")
}
