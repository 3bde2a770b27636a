package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Curation query batch: deterministic train/eval split, stratified
  * sampling, value histograms — the dataset-assembly operations of a
  * training pipeline, all hash-deterministic and oracle-checked.
  */
object QueriesCuration {
  import Tables._

  private val hash60Sql =
    (c: String) => s"CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15)) AS BIGINT)"

  // ---------------------------------------------------------------------
  // 80/20 deterministic split of documents by doc_id hash; per-split
  // rollup proves assignment stability.
  def q39TrainEvalSplit(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("split", Curation.splitAssign(col("doc_id"), 80))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("split")

  val q39Sql: String =
    s"""SELECT CASE WHEN ${hash60Sql("doc_id")} % 100 < 80
       |  THEN 'train' ELSE 'eval' END AS split,
       | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM documents GROUP BY 1 ORDER BY split""".stripMargin

  // ---------------------------------------------------------------------
  // Stratified sample by language: keep 50% of en, 20% of de, drop rest;
  // emits the surviving doc ids (deterministic membership).
  private val strata = Seq("en" -> 0.5, "de" -> 0.2)

  def q40StratifiedSample(s: SparkSession, d: String): DataFrame =
    Curation.stratifiedSample(documents(s, d), "doc_id", "lang", strata.toMap)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  val q40Sql: String = {
    val pct = strata.reverse.foldLeft("0.0") { case (acc, (l, f)) =>
      s"CASE WHEN lang = '$l' THEN $f ELSE $acc END"
    }
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${hash60Sql("doc_id")} % 10000 < ($pct) * 10000
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Fixed-width histogram of event values (20 buckets over [0, 1000)).
  def q41ValueHistogram(s: SparkSession, d: String): DataFrame =
    Curation.histogram(events(s, d), "value", 0.0, 1000.0, 20)
      .orderBy("bucket")

  val q41Sql: String =
    """SELECT bucket, count(*) AS n,
      | round(0.0 + bucket * 50.0, 6) AS lo,
      | round(0.0 + (bucket + 1) * 50.0, 6) AS hi
      |FROM (SELECT least(19, greatest(0,
      |        CAST(floor((value - 0.0) / 50.0) AS INT))) AS bucket
      |      FROM events WHERE value IS NOT NULL)
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------------
  // Capstone: the full training-data assembly flow in ONE lazy plan —
  // exact dedup (survivor = min doc_id per normalized-text digest) →
  // quality gate (stopword/length composite >= 0.3) → language filter →
  // deterministic train/eval split → per-split rollup. Composes the
  // dedup, text-quality and curation tiers; every stage is a narrow
  // projection or a single hash aggregation.
  def q47CurationPipeline(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{Dedup, TextStats}
    val docs = documents(s, d)
    val survivors = Dedup.exactDedup(docs, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val quality = TextStats.qualityColumns("text")
      .find(_._1 == "quality").get._2
    docs.join(survivors, "doc_id")
      .filter(col("lang").isin("en", "de"))
      .withColumn("quality", quality)
      .filter(col("quality") >= 0.3)
      .withColumn("split", Curation.splitAssign(col("doc_id"), 80))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        // quality is 6-decimal-quantized, so a double avg() lands on
        // exact .5 rounding boundaries whose direction depends on the
        // partition-order float sum (the q67 divergence class): sum
        // exact integer millionths instead, one final division
        round(sum(round(col("quality") * 1000000.0).cast("long"))
          / (count(lit(1)) * 1000000.0), 6).as("avg_quality"),
        sum("n_chars").cast("long").as("total_chars"))
      .orderBy("split", "lang")
  }

  val q47Sql: String = {
    val normSql = graft.operators.TextStats.normalizeSql("text")
    val stop = graft.operators.TextStats.stopwords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH survivors AS (
       | SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5($normSql)),
       |quality AS (
       | SELECT doc_id, lang, n_chars,
       |  round(least(1.0, greatest(0.0,
       |    0.5 * least(round(CAST(len(list_filter(string_split($normSql, ' '),
       |          t -> list_contains($stop, t))) AS DOUBLE)
       |        / len(string_split($normSql, ' ')), 6) * 4.0, 1.0)
       |    + 0.5 * least(len(string_split($normSql, ' ')) / 50.0, 1.0)
       |    - round(CAST(len(regexp_extract_all($normSql, '[^a-z0-9 ]')) AS DOUBLE)
       |        / length($normSql), 6))), 6) AS quality
       | FROM documents
       | WHERE doc_id IN (SELECT doc_id FROM survivors) AND lang IN ('en', 'de')),
       |gated AS (SELECT * FROM quality WHERE quality >= 0.3)
       |SELECT CASE WHEN ${hash60Sql("doc_id")} % 100 < 80
       |  THEN 'train' ELSE 'eval' END AS split, lang,
       | count(*) AS n_docs,
       | round(CAST(sum(CAST(round(quality * 1000000) AS BIGINT)) AS BIGINT)
       |   / (count(*) * 1000000.0), 6) AS avg_quality,
       | CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM gated GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q66 sequence packing: docs concatenate in doc_id order into one
  // token stream cut into 512-token context windows; each doc reports
  // its cumulative end offset and the window span it occupies. The
  // Spark side computes the prefix sum RANGE-BUCKETED (bucketWidth 64 →
  // 8 buckets at sf0.01, so the bucketing is genuinely exercised, with
  // only the 8 bucket totals crossing a single-partition pass); the
  // oracle is the textbook single cumsum window — same values.
  private val PackWindow = 512
  private val PackBucket = 64L

  def q66SequencePacking(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_count(
      graft.operators.TextStats.normalize(col("text")), lit("\\S+"))
    val docs = documents(s, d)
      .select(col("doc_id"), toks.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    Curation.packingOffsets(docs, "doc_id", "n_tokens", PackWindow, PackBucket)
      .select("doc_id", "n_tokens", "cum_end",
        "first_window", "last_window", "n_windows")
      .orderBy("doc_id")
  }

  val q66Sql: String = {
    val normSql = graft.operators.TextStats.normalizeSql("text")
    s"""WITH t AS (
       | SELECT doc_id,
       |  CAST(len(regexp_extract_all($normSql, '\\S+')) AS BIGINT) AS n_tokens
       | FROM documents),
       |c AS (
       | SELECT doc_id, n_tokens,
       |  CAST(sum(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_end
       | FROM t WHERE n_tokens > 0)
       |SELECT doc_id, n_tokens, cum_end,
       | (cum_end - n_tokens) // $PackWindow AS first_window,
       | (cum_end - 1) // $PackWindow AS last_window,
       | ((cum_end - 1) // $PackWindow - (cum_end - n_tokens) // $PackWindow + 1)
       |   AS n_windows
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q100 next-fit bin packing: docs in id order fill fixed 256-token
  // training bins within 50-id buckets (bins never cross buckets — the
  // q66 range-bucket discipline applied to bin ASSIGNMENT). The oracle
  // replays the identical sequential fold as a recursive CTE stepping
  // the per-bucket row number.
  private val PackCapacity = 256L
  private val PackIdBucket = 50L

  def q100NextfitPack(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_count(
      graft.operators.TextStats.normalize(col("text")), lit("\\S+"))
    val docs = documents(s, d)
      .select(col("doc_id"), toks.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    Curation.nextFitPack(docs, "doc_id", "n_tokens",
        capacity = PackCapacity, bucketWidth = PackIdBucket)
      .orderBy("doc_id")
  }

  val q100Sql: String = {
    val normSql = graft.operators.TextStats.normalizeSql("text")
    s"""WITH RECURSIVE base AS (
       | SELECT doc_id, doc_id // $PackIdBucket AS bucket,
       |  CAST(len(regexp_extract_all($normSql, '\\S+')) AS BIGINT) AS n_tokens
       | FROM documents),
       |t AS (
       | SELECT doc_id, bucket, n_tokens,
       |  row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
       | FROM base WHERE n_tokens > 0),
       |pack AS (
       | SELECT doc_id, bucket, rn, n_tokens,
       |  CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS bin_offset,
       |  n_tokens AS fill
       | FROM t WHERE rn = 1
       | UNION ALL
       | SELECT t.doc_id, t.bucket, t.rn, t.n_tokens,
       |  CAST(CASE WHEN p.fill > 0 AND p.fill + t.n_tokens > $PackCapacity
       |       THEN p.bin + 1 ELSE p.bin END AS BIGINT),
       |  CAST(CASE WHEN p.fill > 0 AND p.fill + t.n_tokens > $PackCapacity
       |       THEN 0 ELSE p.fill END AS BIGINT),
       |  CAST(CASE WHEN p.fill > 0 AND p.fill + t.n_tokens > $PackCapacity
       |       THEN t.n_tokens ELSE p.fill + t.n_tokens END AS BIGINT)
       | FROM pack p JOIN t ON t.bucket = p.bucket AND t.rn = p.rn + 1)
       |SELECT doc_id, bucket, bin, bin_offset FROM pack
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q105 reproducible training-order shuffle: two epochs (seeds 1, 2)
  // of the seeded-hash permutation over documents, sharded so the sort
  // never single-partitions (Curation.trainShuffle). The union proves
  // both faces of the contract in one result: within a seed the order
  // is deterministic (the oracle recomputes it exactly), and across
  // seeds the permutation actually changes (different shard/pos rows
  // hash-matching per seed).
  private val ShuffleShards = 8
  private val ShuffleSeeds = Seq(1L, 2L)

  def q105TrainShuffle(s: SparkSession, d: String): DataFrame =
    ShuffleSeeds.map { seed =>
      Curation.trainShuffle(documents(s, d), "doc_id", seed, ShuffleShards)
    }.reduce(_ unionByName _).orderBy("seed", "shard", "pos")

  val q105Sql: String = {
    val seedRows = ShuffleSeeds
      .map(v => s"SELECT CAST($v AS BIGINT) AS seed").mkString(" UNION ALL ")
    s"""WITH e AS ($seedRows),
       |h AS (
       | SELECT d.doc_id, e.seed,
       |  CAST(('0x' || substr(md5(
       |    CAST(e.seed AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)),
       |    1, 15)) AS BIGINT) AS h
       | FROM documents d CROSS JOIN e)
       |SELECT doc_id, seed, h % $ShuffleShards AS shard,
       | row_number() OVER (PARTITION BY seed, h % $ShuffleShards
       |   ORDER BY h, doc_id) AS pos
       |FROM h ORDER BY seed, shard, pos""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q124: weighted sampling without replacement — 8 docs per source,
  // probability ∝ n_chars (the char-budget-aware subset draw a mixture
  // builder runs per source; k = 8 of ~25 docs/source at sf0.01 keeps
  // the draw a REAL selection — a k at the stratum size would select
  // everything and verify nothing). Deterministic E-S exponential
  // keys; the oracle reproduces the identical sample because the sort
  // key is fixed-point nanos before ranking (Curation.weightedSample).
  def q124WeightedSample(s: SparkSession, d: String): DataFrame =
    Curation.weightedSample(
        documents(s, d).select("doc_id", "source", "n_chars"),
        keyCol = "doc_id", weightCol = "n_chars", stratumCol = "source",
        k = 8, seed = "wsr1")
      .select(col("source"), col("doc_id"), col("n_chars"), col("samp_rank"))
      .orderBy("source", "samp_rank")

  val q124Sql: String =
    s"""WITH s AS (SELECT source, doc_id, n_chars,
       |  CAST(round(-ln(
       |      (${hash60Sql("'wsr1:' || doc_id")} + 1) / 1152921504606846976e0)
       |    / n_chars * 1e9) AS BIGINT) AS skey
       |  FROM documents WHERE n_chars > 0)
       |SELECT source, doc_id, n_chars, samp_rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY source
       |    ORDER BY skey, doc_id) AS samp_rank FROM s)
       |WHERE samp_rank <= 8 ORDER BY source, samp_rank""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q124_weighted_sample" -> (q124WeightedSample _),
    "q47_curation_pipeline" -> (q47CurationPipeline _),
    "q39_train_eval_split" -> (q39TrainEvalSplit _),
    "q40_stratified_sample" -> (q40StratifiedSample _),
    "q41_value_histogram" -> (q41ValueHistogram _),
    "q66_sequence_packing" -> (q66SequencePacking _),
    "q100_nextfit_pack" -> (q100NextfitPack _),
    "q105_train_shuffle" -> (q105TrainShuffle _),
  )

  val oracle: Map[String, String] = Map(
    "q124_weighted_sample" -> q124Sql,
    "q47_curation_pipeline" -> q47Sql,
    "q39_train_eval_split" -> q39Sql,
    "q40_stratified_sample" -> q40Sql,
    "q41_value_histogram" -> q41Sql,
    "q66_sequence_packing" -> q66Sql,
    "q100_nextfit_pack" -> q100Sql,
    "q105_train_shuffle" -> q105Sql,
  )
}
