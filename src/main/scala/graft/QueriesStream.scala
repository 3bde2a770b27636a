package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Streaming-twin query batch: the batch formulations of the streaming
  * tier's transforms (SURVEY.md §2.9), oracle-checked. The streaming
  * variants run the same code over `readStream` (see StreamingSpec).
  */
object QueriesStream {
  import Tables._

  // Batch sessionization: 30-minute inactivity gap per user.
  def q34Sessionize(s: SparkSession, d: String): DataFrame =
    Streaming.sessionizeBatch(
        events(s, d).select("user_id", "ts", "value"), gapMs = 30 * 60 * 1000L)
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("s_end"),
        col("n_events"), col("total"))
      .orderBy("user_id", "s_start")

  val q34Sql: String =
    """WITH m AS (
      | SELECT user_id, ts, value,
      |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |       THEN 1 ELSE 0 END AS new_session
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      | SELECT user_id, ts, value,
      |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      | FROM m)
      |SELECT user_id,
      | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
      | strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS s_end,
      | count(*) AS n_events, round(sum(value), 2) AS total
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, s_start""".stripMargin

  // G7 distinct / count-distinct: exact per-group distinct counts
  // (oracle-checked); the HLL approx_count_distinct scale path is
  // asserted within 5% of exact in ExtensionOperatorsSpec.
  def q35CountDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  val q35Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      | count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_sessionize" -> (q34Sessionize _),
    "q35_count_distinct" -> (q35CountDistinct _),
  )

  val oracle: Map[String, String] = Map(
    "q34_sessionize" -> q34Sql,
    "q35_count_distinct" -> q35Sql,
  )
}
