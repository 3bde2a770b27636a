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
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_train_eval_split" -> (q39TrainEvalSplit _),
    "q40_stratified_sample" -> (q40StratifiedSample _),
    "q41_value_histogram" -> (q41ValueHistogram _),
  )

  val oracle: Map[String, String] = Map(
    "q39_train_eval_split" -> q39Sql,
    "q40_stratified_sample" -> q40Sql,
    "q41_value_histogram" -> q41Sql,
  )
}
