package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (the reference's long→wide pivot pipeline) on
    * /root/testdata/sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q02ShapePivot(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ QueriesRel.all ++ QueriesText.all ++ QueriesDedup.all ++
      QueriesSim.all ++ QueriesMm.all ++ QueriesTile.all ++
      QueriesStream.all ++ QueriesCuration.all ++ QueriesCorpus.all ++
      QueriesBpe.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Queries.oracle ++ QueriesRel.oracle ++ QueriesText.oracle ++
      QueriesDedup.oracle ++ QueriesSim.oracle ++ QueriesMm.oracle ++
      QueriesTile.oracle ++ QueriesStream.oracle ++ QueriesCuration.oracle ++
      QueriesCorpus.oracle ++ QueriesBpe.oracle
}
