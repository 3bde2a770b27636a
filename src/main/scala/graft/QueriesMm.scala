package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal query batch (SURVEY.md §7.2 M8): opaque-binary media
  * columns with typed metadata, stubbed decode behind the production
  * `mapPartitions` batching contract, and frame-sample fan-out.
  */
object QueriesMm {
  import Tables._

  // ---------------------------------------------------------------------
  // Typed decode path: synthetic media → mapPartitions feature extraction
  // (STUB codec, real plumbing) → per-kind rollup. Not SQL-expressible
  // (typed Scala decode) → no oracle entry; the driver records a
  // rows-only check.
  def q29MultimodalDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.syntheticMedia(documents(s, d))
      .as[Multimodal.MediaRow]
    Multimodal.decodeFeatures(media, targetFrames = 4)
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        round(avg("mean_byte"), 6).as("avg_byte"),
        sum("frames_sampled").as("total_frames"),
        round(avg(element_at(col("feature"), 1)), 6).as("avg_f0"))
      .orderBy("kind")
  }

  // ---------------------------------------------------------------------
  // Frame-sample fan-out: one row per sampled video frame (every 500 ms),
  // image/audio pass through as frame 0. Pure relational fan-out —
  // oracle-checked.
  def q30FrameSample(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.syntheticMedia(documents(s, d))
    Multimodal.sampleFrames(media, everyMs = 500)
      .orderBy("media_id", "frame_idx")
  }

  val q30Sql: String =
    """WITH media AS (
      | SELECT doc_id AS media_id,
      |  (['image', 'audio', 'video'])[doc_id % 3 + 1] AS kind,
      |  n_chars * 10 AS duration_ms
      | FROM documents)
      |SELECT media_id, kind, CAST(t.frame_idx AS INT) AS frame_idx,
      |       CAST(t.frame_idx * 500 AS INT) AS frame_ms
      |FROM media, UNNEST(
      |  CASE WHEN kind = 'video'
      |       THEN range(0, greatest(CAST(floor(duration_ms / 500) AS INT) - 1, 0) + 1)
      |       ELSE [CAST(0 AS BIGINT)] END) AS t(frame_idx)
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------------
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal_decode" -> (q29MultimodalDecode _),
    "q30_frame_sample" -> (q30FrameSample _),
  )

  val oracle: Map[String, String] = Map(
    "q30_frame_sample" -> q30Sql,
  )
}
