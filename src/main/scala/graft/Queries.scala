package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Extents, Shape}

/** Named query catalog: each entry is an operator exercise from SURVEY.md §2
  * over the driver's parquet tables, with a DuckDB oracle twin in
  * [[Queries.oracle]]. Column names/aliases MUST match the oracle exactly
  * (driver sorts columns by name before hashing). Every query orders by a
  * deterministic key and avoids order-dependent aggregates.
  */
object Queries {
  import Tables._

  /** Days of January present in the events table (TESTDATA ts spans
    * 2024-01-01..2024-01-30); plays the role of the reference's year list.
    */
  private val eventDays: Seq[String] = (1 to 30).map(d => f"$d%02d")

  // ---------------------------------------------------------------------
  // G5 hash aggregation (TPC-H Q1 shape) — partial+final agg, one shuffle.
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(avg(l_quantity), 6) AS avg_qty,
      | round(avg(l_discount), 6) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // A1 long→wide pivot (the reference's shape-data.js), deterministic
  // last-wins cells: one row per user, one `value-DD` column per day.
  def q02ShapePivot(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("dd", date_format(col("ts"), "dd"))
    Shape.pivotWide(ev, idCol = "user_id", carry = Nil, yearCol = "dd",
      metrics = Seq("value"), years = eventDays, ordCol = "event_id")
  }

  val q02Sql: String = {
    val cells = eventDays.map { dd =>
      s""" max_by(value, event_id) FILTER (WHERE strftime(ts, '%d') = '$dd') AS "value-$dd""""
    }.mkString(",\n")
    s"SELECT user_id,\n$cells\nFROM events GROUP BY user_id ORDER BY user_id"
  }

  // ---------------------------------------------------------------------
  // A2+G1-G4 extents (the reference's extract-extents.js): unpivot + per-
  // metric min/max/q1/q99 in one shuffle.
  private val extentCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def q03Extents(s: SparkSession, d: String): DataFrame =
    Extents.extents(lineitem(s, d), extentCols)
      .select(col("id"),
        round(col("vmin"), 6).as("vmin"), round(col("vmax"), 6).as("vmax"),
        round(col("q1"), 6).as("q1"), round(col("q99"), 6).as("q99"))
      .orderBy("id")

  val q03Sql: String = {
    val branches = extentCols
      .map(c => s"SELECT '$c' AS id, CAST($c AS DOUBLE) AS value FROM lineitem")
      .mkString(" UNION ALL ")
    s"""WITH long AS ($branches)
       |SELECT id, round(min(value), 6) AS vmin, round(max(value), 6) AS vmax,
       |  round(quantile_cont(value, 0.01), 6) AS q1,
       |  round(quantile_cont(value, 0.99), 6) AS q99
       |FROM long WHERE value IS NOT NULL AND NOT isnan(value)
       |GROUP BY id ORDER BY id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q94: the APPROXIMATE extents deployment path as a first-class
  // bench entry. q03 is the exact oracle-parity twin (R-7 / d3
  // semantics via the range-bucketed distinct-value histogram) and a
  // suite cost leader purely from that exactness; the documented scale
  // path for choropleth extents is the percentile_approx sketch
  // (constant memory per group, one pass, ~1e-4 relative accuracy —
  // ample for scales needing ~1%).
  //
  // Registry-split since round 14 (the q69 BPE / q73 PQ-codebook
  // protocol): the sketch LEARNS its q1/q99 once per (corpus, ε) and
  // persists them as a parquet fixture; the query APPLIES the stored
  // estimates next to an exact one-pass vmin/vmax, and the DuckDB
  // oracle applies the SAME fixture — so the whole application path
  // (unpivot, numeric-or-null filter, min/max, rounding, ordering) is
  // hash-checked end to end. This also makes the query deterministic:
  // GK merge order varies with shuffle fetch order, so a re-learn per
  // run could drift in the last ulp — the persisted artifact is the
  // stable contract, exactly as a deployment would serve a trained
  // discretizer. Accuracy vs exact stays spec-pinned
  // (CoreOperatorsSpec "approximate extents stay within 2% of exact
  // quantiles").
  // _v2: the learn_params provenance column changed the fixture
  // schema — a bumped dir keeps old-schema subdirs out of the
  // oracle's read_parquet glob (DuckDB has no union_by_name here; a
  // mixed-schema glob fails even for the corpus just re-learned).
  // The repo precedent: pq_codebooks_s16.
  private val ExtFixtureDir = "/tmp/graft_fixtures/gk_extents_q1q99_v2"

  /** Registry READ path (the loadCodebook discipline): provenance
    * columns pin the corpus dir — two scale factors could share a row
    * count with different content — AND the learn hyperparameters
    * (`params`): a fixture learned under a different k / quantile pair
    * / sketch accuracy must re-learn, never serve, or a constant
    * change would silently serve stale cuts that the oracle (applying
    * the same stale fixture) could not catch. The learn overwrites, so
    * the oracle — which can only filter by count — always reads the
    * artifact of the corpus just verified.
    */
  private def loadMetricDoubles(s: SparkSession, dir: String, n: Long,
                                d: String, params: String,
                                cols: Seq[String])
      : Option[Seq[org.apache.spark.sql.Row]] =
    graft.operators.ArtifactCache.parquetFixture(s, s"$dir/$n")
      .filter(df => df.columns.contains("corpus_dir") &&
        df.columns.contains("learn_params"))
      .map(_.where(col("corpus_rows") === n && col("corpus_dir") === d &&
          col("learn_params") === params)
        .select(cols.map(col): _*).collect().toSeq)
      .filter(_.size == extentCols.size) // torn/foreign dir: re-learn

  private val ExtParams = "lo0.01:hi0.99:acc10000"

  private def extentQuantilesArtifact(s: SparkSession, d: String)
      : Seq[(String, (Double, Double))] = {
    // one count shared by the load and learn closures (both only run
    // on a memory miss; the memory-hit path runs zero jobs)
    var nMemo = -1L
    def n: Long = {
      if (nMemo < 0) nMemo = lineitem(s, d).count(); nMemo
    }
    // owned protocol: closes the same-JVM A-B-A gap between the
    // in-memory artifact and the overwrite-on-learn fixture (see
    // ArtifactCache.getOrLoadOrLearnOwned)
    graft.operators.ArtifactCache.getOrLoadOrLearnOwned(
        s"extq:$d:$ExtParams", ExtFixtureDir, d) {
      loadMetricDoubles(s, ExtFixtureDir, n, d, ExtParams,
          Seq("metric", "q1", "q99"))
        .map(_.map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
          .sortBy(_._1))
    } {
      val qs = Extents.approxExtentQuantiles(lineitem(s, d), extentCols)
      import s.implicits._
      qs.map { case (m, (a, b)) => (m, a, b, n, d, ExtParams) }
        .toDF("metric", "q1", "q99", "corpus_rows", "corpus_dir",
          "learn_params")
        .coalesce(1).write.mode("overwrite").parquet(s"$ExtFixtureDir/$n")
      qs
    }
  }

  def q94ExtentsApprox(s: SparkSession, d: String): DataFrame =
    Extents.extentsWithFixedQuantiles(lineitem(s, d), extentCols,
        extentQuantilesArtifact(s, d))
      .select(col("id"),
        round(col("vmin"), 6).as("vmin"), round(col("vmax"), 6).as("vmax"),
        round(col("q1"), 6).as("q1"), round(col("q99"), 6).as("q99"))
      .orderBy("id")

  val q94Sql: String = {
    val branches = extentCols
      .map(c => s"SELECT '$c' AS id, CAST($c AS DOUBLE) AS value FROM lineitem")
      .mkString(" UNION ALL ")
    s"""WITH fx AS (
       | SELECT metric, q1, q99 FROM read_parquet('$ExtFixtureDir/*/*.parquet')
       | WHERE corpus_rows = (SELECT count(*) FROM lineitem)),
       |long AS ($branches),
       |r AS (
       | SELECT id, min(value) AS vmin, max(value) AS vmax FROM long
       | WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY id)
       |SELECT r.id, round(r.vmin, 6) AS vmin, round(r.vmax, 6) AS vmax,
       | round(fx.q1, 6) AS q1, round(fx.q99, 6) AS q99
       |FROM r JOIN fx ON fx.metric = r.id
       |ORDER BY id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // P1/P3/P9 dictionary rename + projection + year-suffix slice.
  def q04RenameProject(s: SparkSession, d: String): DataFrame = {
    val mapping = Seq("event_id" -> "eid", "user_id" -> "uid",
      "event_type" -> "et", "value" -> "v") // `props`/`ts` unmapped → dropped
    Shape.renameColumns(events(s, d).withColumn("yy", date_format(col("ts"), "yy")),
        mapping, keep = Seq("yy"))
      .orderBy("eid")
  }

  val q04Sql: String =
    """SELECT strftime(ts, '%y') AS yy, event_id AS eid, user_id AS uid,
      | event_type AS et, value AS v
      |FROM events ORDER BY eid""".stripMargin

  // ---------------------------------------------------------------------
  // P6 null-default + P7 numeric-or-null coercion.
  def q05CleanNulls(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val kStr = expr("nullif(regexp_extract(props, '\"k\": (\\\\d+)', 1), '')")
    ev.select(
      col("event_id").as("eid"),
      Extents.numericOrNull(kStr).as("k_num"),
      Shape.defaultParentLocation(
        when(col("value") > 100, col("event_type")), "United States").as("et_filled"))
      .orderBy("eid")
  }

  val q05Sql: String =
    """SELECT event_id AS eid,
      | TRY_CAST(nullif(regexp_extract(props, '"k": (\d+)', 1), '') AS DOUBLE) AS k_num,
      | coalesce(CASE WHEN value > 100 THEN event_type END, 'United States') AS et_filled
      |FROM events ORDER BY eid""".stripMargin

  // ---------------------------------------------------------------------
  // Event-time tumbling window aggregation (batch twin of the Structured
  // Streaming path; SURVEY.md §2.9).
  def q06HourlyRollup(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))
      .orderBy("hour", "event_type")

  val q06Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      | event_type, count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // O1/O3 GEOID-style zero-padded string key, binary-order sort + limit.
  def q07SortLimit(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(lpad(col("c_custkey").cast("string"), 8, "0").as("geoid"),
        col("c_name").as("n"), col("c_acctbal").as("bal"))
      .orderBy("geoid")
      .limit(100)

  val q07Sql: String =
    """SELECT lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS geoid,
      | c_name AS n, c_acctbal AS bal
      |FROM customer ORDER BY geoid LIMIT 100""".stripMargin

  // ---------------------------------------------------------------------
  // Grouped extents: per-returnflag choropleth scales (the reference's
  // one-extents-file-per-region, as one grouped shuffle).
  def q44ExtentsByGroup(s: SparkSession, d: String): DataFrame =
    Extents.extentsBy(lineitem(s, d), "l_returnflag",
        Seq("l_quantity", "l_extendedprice"))
      .select(col("l_returnflag"), col("id"),
        round(col("vmin"), 6).as("vmin"), round(col("vmax"), 6).as("vmax"),
        round(col("q1"), 6).as("q1"), round(col("q99"), 6).as("q99"))
      .orderBy("l_returnflag", "id")

  val q44Sql: String =
    """WITH long AS (
      | SELECT l_returnflag, 'l_quantity' AS id, CAST(l_quantity AS DOUBLE) AS value FROM lineitem
      | UNION ALL
      | SELECT l_returnflag, 'l_extendedprice' AS id, CAST(l_extendedprice AS DOUBLE) AS value FROM lineitem)
      |SELECT l_returnflag, id,
      | round(min(value), 6) AS vmin, round(max(value), 6) AS vmax,
      | round(quantile_cont(value, 0.01), 6) AS q1,
      | round(quantile_cont(value, 0.99), 6) AS q99
      |FROM long WHERE value IS NOT NULL AND NOT isnan(value)
      |GROUP BY l_returnflag, id ORDER BY l_returnflag, id""".stripMargin

  // ---------------------------------------------------------------------
  // q101 one-pass column profiling (the Deequ-style data-quality gate a
  // pipeline runs before trusting a new table): per numeric lineitem
  // column — rows, nulls, exact distinct count, min/max, integer-micro
  // sum and mean. One unpivot + one grouped aggregation = one table
  // scan for all columns; sums are exact integers in a DECIMAL(38,0)
  // accumulator (reproducible across engines AND partition merge
  // orders, the q67 discipline — a BIGINT accumulator overflows on a
  // corpus-scale key column, which ANSI mode surfaced at the 10×
  // scale-up). sum_micro crosses the wire as the canonical decimal
  // STRING: DECIMAL(38,0) was the one column whose driver hash
  // canonicalization diverged between engines (r9's only red row).
  private val profileCols = Seq("l_orderkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax")

  def q101Profile(s: SparkSession, d: String): DataFrame =
    Extents.profileColumns(lineitem(s, d), profileCols)
      .orderBy("col_name")

  val q101Sql: String = {
    val branches = profileCols
      .map(c => s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS value FROM lineitem")
      .mkString(" UNION ALL ")
    s"""WITH long AS ($branches)
       |SELECT col_name,
       | count(*) AS n,
       | CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       | count(DISTINCT value) AS n_distinct,
       | min(value) AS vmin, max(value) AS vmax,
       | CAST(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS sum_micro,
       | CAST(sum(CAST(round(value * 1000000) AS BIGINT))
       |   // nullif(count(*) - CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT), 0)
       |   AS BIGINT) AS mean_micro
       |FROM long GROUP BY col_name ORDER BY col_name""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q111 profile DRIFT — the monitoring step after q101's profiling
  // gate: profile two slices of the fact table side by side (here the
  // pre-/post-mid-1998 shipdate halves standing in for yesterday's vs
  // today's snapshot) in ONE scan (`Extents.profileColumnsBy` — the
  // unpivot carries the slice key, so the histogram shuffle is shared)
  // and emit per-column deltas in exact integer micros: a double mean
  // would make "did the mean move?" depend on partition merge order,
  // the integer-micro mean can drift only if the DATA did. The
  // per-mille drift ratio stays in truncating integer division (Spark
  // `div` ≡ DuckDB `//` on the non-negative operands) so the oracle
  // hash covers the drift arithmetic itself.
  private val DriftCut = "1998-06-01"

  def q111ProfileDrift(s: SparkSession, d: String): DataFrame = {
    val sliced = lineitem(s, d).withColumn("slice",
      when(col("l_shipdate") < lit(DriftCut).cast("date"), "base")
        .otherwise("cur"))
    // r19: the base/cur attach is ONE conditional aggregation over the
    // per-slice profile instead of a localCheckpoint + self-join — the
    // two-branch formulation materialized the tiny table and paid a
    // join's worth of stages to line up rows the groupBy lines up for
    // free. The isNotNull guard reproduces the old inner join exactly:
    // a column missing from either slice dropped out of the join, and
    // drops out here (on this fact table every column has rows on both
    // sides of the cut, so the guard never fires — it pins semantics).
    val p = Extents.profileColumnsBy(sliced, profileCols, "slice")
    def side(tag: String, c: String) = max(when(col("slice") === tag, col(c)))
    p.groupBy("col_name")
      .agg(side("base", "n").as("n_base"), side("cur", "n").as("n_cur"),
        side("base", "n_distinct").as("distinct_base"),
        side("cur", "n_distinct").as("distinct_cur"),
        side("base", "mean_micro").as("mean_base"),
        side("cur", "mean_micro").as("mean_cur"))
      .where(col("n_base").isNotNull && col("n_cur").isNotNull)
      .select(col("col_name"),
        col("n_base"), col("n_cur"),
        (col("n_cur") - col("n_base")).as("n_delta"),
        col("distinct_base"), col("distinct_cur"),
        col("mean_base"), col("mean_cur"),
        (col("mean_cur") - col("mean_base")).as("mean_delta_micro"),
        expr("CAST(abs(mean_cur - mean_base) * 1000 " +
          "div nullif(abs(mean_base), 0) AS BIGINT)").as("drift_pm"))
      .orderBy("col_name")
  }

  val q111Sql: String = {
    val branches = profileCols
      .map(c => "SELECT CASE WHEN l_shipdate < DATE '" + DriftCut +
        s"' THEN 'base' ELSE 'cur' END AS slice, '$c' AS col_name, " +
        s"CAST($c AS DOUBLE) AS value FROM lineitem")
      .mkString(" UNION ALL ")
    s"""WITH long AS ($branches),
       |p AS (
       | SELECT slice, col_name, count(*) AS n,
       |  count(DISTINCT value) AS n_distinct,
       |  CAST(sum(CAST(round(value * 1000000) AS BIGINT))
       |    // nullif(count(*) - CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT), 0)
       |    AS BIGINT) AS mean_micro
       | FROM long GROUP BY slice, col_name)
       |SELECT b.col_name,
       | b.n AS n_base, c.n AS n_cur, c.n - b.n AS n_delta,
       | b.n_distinct AS distinct_base, c.n_distinct AS distinct_cur,
       | b.mean_micro AS mean_base, c.mean_micro AS mean_cur,
       | c.mean_micro - b.mean_micro AS mean_delta_micro,
       | CAST(abs(c.mean_micro - b.mean_micro) * 1000
       |   // nullif(abs(b.mean_micro), 0) AS BIGINT) AS drift_pm
       |FROM p b JOIN p c ON b.col_name = c.col_name
       |WHERE b.slice = 'base' AND c.slice = 'cur'
       |ORDER BY b.col_name""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q112 equal-frequency (quantile) BINNING — the exact
  // feature-discretization operator over the same metric columns as
  // q03: k bins of near-equal row count per metric, ties kept in one
  // bin (the histogram-granularity ntile: bin = (cum_before·k) div n
  // over the range-bucketed cumulative histogram — all-integer rank
  // arithmetic, no whole-metric sort on one task, oracle-exact by
  // construction since DuckDB computes the identical integer formula
  // over the identical distinct-value cumsum).
  private val BinK = 8

  def q112QuantileBins(s: SparkSession, d: String): DataFrame =
    Extents.quantileBins(lineitem(s, d), extentCols, BinK)

  // ---------------------------------------------------------------------
  // q116: q112's APPROXIMATE twin — equal-frequency binning with GK
  // sketch cut points (histogram-fed weighted sketch, ε = 1e-4) in
  // place of the exact cumulative-rank windows. Same ties-in-one-bin
  // semantics (bin = #cuts strictly below the value); bin balance off
  // by ≤ 2ε·n + tie mass; accuracy vs exact spec-pinned in
  // CoreOperatorsSpec. Registry-split like q94: the k−1 cuts per
  // metric are learned once, persisted, and APPLIED — by the query
  // (one scan, cuts as a broadcast literal, |metrics|·k-key shuffle)
  // and by the DuckDB oracle over the same fixture, hash-checking the
  // whole discretizer application end to end.
  private val BinFixtureDir = "/tmp/graft_fixtures/gk_bin_cuts_v2"

  private val BinParams = s"k$BinK:acc10000"

  private def binCutsArtifact(s: SparkSession, d: String)
      : Seq[(String, Seq[Double])] = {
    var nMemo = -1L
    def n: Long = {
      if (nMemo < 0) nMemo = lineitem(s, d).count(); nMemo
    }
    graft.operators.ArtifactCache.getOrLoadOrLearnOwned(
        s"bincuts:$d:$BinParams", BinFixtureDir, d) {
      loadMetricDoubles(s, BinFixtureDir, n, d, BinParams,
          Seq("metric", "cuts"))
        .map(_.map(r => r.getString(0) -> r.getSeq[Double](1).toSeq)
          .sortBy(_._1))
    } {
      val cuts = Extents.approxBinCuts(lineitem(s, d), extentCols, BinK)
      import s.implicits._
      cuts.map { case (m, cs) => (m, cs, n, d, BinParams) }
        .toDF("metric", "cuts", "corpus_rows", "corpus_dir", "learn_params")
        .coalesce(1).write.mode("overwrite").parquet(s"$BinFixtureDir/$n")
      cuts
    }
  }

  def q116QuantileBinsApprox(s: SparkSession, d: String): DataFrame =
    Extents.binByCuts(lineitem(s, d), extentCols, binCutsArtifact(s, d))

  val q116Sql: String = {
    val branches = extentCols
      .map(c => s"SELECT '$c' AS id, CAST($c AS DOUBLE) AS value FROM lineitem")
      .mkString(" UNION ALL ")
    s"""WITH fx AS (
       | SELECT metric, cuts FROM read_parquet('$BinFixtureDir/*/*.parquet')
       | WHERE corpus_rows = (SELECT count(*) FROM lineitem)),
       |long AS ($branches),
       |b AS (
       | SELECT l.id AS metric,
       |  CAST(len(list_filter(fx.cuts, x -> x < l.value)) AS INT) AS bin,
       |  l.value AS value
       | FROM long l JOIN fx ON fx.metric = l.id
       | WHERE l.value IS NOT NULL AND NOT isnan(l.value))
       |SELECT metric, bin, count(*) AS n_rows, min(value) AS lo, max(value) AS hi
       |FROM b GROUP BY 1, 2 ORDER BY metric, bin""".stripMargin
  }

  val q112Sql: String = {
    val branches = extentCols
      .map(c => s"SELECT '$c' AS id, CAST($c AS DOUBLE) AS value FROM lineitem")
      .mkString(" UNION ALL ")
    s"""WITH long AS ($branches),
       |h AS (
       | SELECT id, value, count(*) AS cnt FROM long
       | WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY id, value),
       |c AS (
       | SELECT id, value, cnt,
       |  sum(cnt) OVER (PARTITION BY id ORDER BY value) - cnt AS cum_before,
       |  sum(cnt) OVER (PARTITION BY id) AS n
       | FROM h)
       |SELECT id AS metric,
       | least($BinK - 1, CAST((cum_before * $BinK) // n AS INT)) AS bin,
       | CAST(sum(cnt) AS BIGINT) AS n_rows,
       | min(value) AS lo, max(value) AS hi
       |FROM c GROUP BY 1, 2 ORDER BY metric, bin""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q144: exact QUANTILE NORMALIZATION (rank→CDF feature scaling, the
  // sklearn QuantileTransformer shape) of the REPEAT-HEAVY metric
  // columns — the third member of the learned-feature-transform
  // family next to q112's binning and q140's target encoding.
  // l_extendedprice is DELIBERATELY excluded: its values are
  // near-unique, so its mapping table would approach corpus size and
  // stop being the broadcastable artifact this transform exists to
  // produce (a deployment normalizes such a column with the GK-cut
  // fixture instead, the q116 path). Emits the per-distinct-value
  // mapping table a deployment broadcasts back onto rows; ties share
  // one midrank cdf. Same range-bucketed histogram kernel as the
  // exact extents — the oracle recomputes the identical integer
  // cumsum and the one double division.
  private val NormCols = Seq("l_quantity", "l_discount", "l_tax")

  def q144QuantileNormalize(s: SparkSession, d: String): DataFrame =
    Extents.cdfTransform(lineitem(s, d), NormCols)

  val q144Sql: String = {
    val branches = NormCols
      .map(c => s"SELECT '$c' AS id, CAST($c AS DOUBLE) AS value FROM lineitem")
      .mkString(" UNION ALL ")
    s"""WITH long AS ($branches),
       |h AS (
       | SELECT id, value, count(*) AS cnt FROM long
       | WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY id, value),
       |c AS (
       | SELECT id, value, cnt,
       |  sum(cnt) OVER (PARTITION BY id ORDER BY value) - cnt AS cum_before,
       |  sum(cnt) OVER (PARTITION BY id) AS n
       | FROM h)
       |SELECT id AS metric, value, CAST(cnt AS BIGINT) AS n_rows,
       | round((cum_before + cnt * 0.5) / n, 6) AS cdf
       |FROM c ORDER BY metric, value""".stripMargin
  }

  /** Registry: name -> query. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q144_quantile_normalize" -> (q144QuantileNormalize _),
    "q111_profile_drift" -> (q111ProfileDrift _),
    "q112_quantile_bins" -> (q112QuantileBins _),
    "q116_quantile_bins_approx" -> (q116QuantileBinsApprox _),
    "q44_extents_by_group" -> (q44ExtentsByGroup _),
    "q94_extents_approx" -> (q94ExtentsApprox _),
    "q101_profile" -> (q101Profile _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_shape_pivot" -> (q02ShapePivot _),
    "q03_extents" -> (q03Extents _),
    "q04_rename_project" -> (q04RenameProject _),
    "q05_clean_nulls" -> (q05CleanNulls _),
    "q06_hourly_rollup" -> (q06HourlyRollup _),
    "q07_sort_limit" -> (q07SortLimit _),
  )

  /** Registry: name -> DuckDB oracle SQL. */
  val oracle: Map[String, String] = Map(
    "q144_quantile_normalize" -> q144Sql,
    "q94_extents_approx" -> q94Sql,
    "q116_quantile_bins_approx" -> q116Sql,
    "q44_extents_by_group" -> q44Sql,
    "q101_profile" -> q101Sql,
    "q111_profile_drift" -> q111Sql,
    "q112_quantile_bins" -> q112Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_shape_pivot" -> q02Sql,
    "q03_extents" -> q03Sql,
    "q04_rename_project" -> q04Sql,
    "q05_clean_nulls" -> q05Sql,
    "q06_hourly_rollup" -> q06Sql,
    "q07_sort_limit" -> q07Sql,
  )
}
