package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Multimodal query batch (SURVEY.md §7.2 M8): opaque-binary media
  * columns with typed metadata, stubbed decode behind the production
  * `mapPartitions` batching contract, and frame-sample fan-out.
  */
object QueriesMm {
  import Tables._

  // ---------------------------------------------------------------------
  // Typed decode path, REAL since r9: synthetic payloads are valid P6
  // PPM / PPM-stream / RIFF-WAVE containers, and the mapPartitions
  // decoder genuinely parses them (magic, header fields, chunk walk) —
  // no stub left in the path. Per-kind rollup over container-derived
  // stats; every decoded quantity is re-derivable in SQL from
  // `documents` (the payloads cycle the text's md5 digest), so the
  // query is fully oracle-checked: a parser that misread a header
  // field, miscounted frames, or sliced pixels wrong hash-mismatches.
  // Averages divide ONE integer sum at the end (content_sum/n_content
  // ride as exact longs) — engine-order-independent, the ADC
  // micro-distance discipline.
  def q29MultimodalDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.syntheticFormatMedia(documents(s, d))
      .as[Multimodal.MediaRow]
    Multimodal.decodeMedia(media)
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_media"),
        round(sum("px_w").cast("double") / count(lit(1)), 6).as("avg_w"),
        round(sum("px_h").cast("double") / count(lit(1)), 6).as("avg_h"),
        sum("n_frames").cast("bigint").as("total_frames"),
        max("sample_rate").as("sample_rate"),
        round(sum("content_sum").cast("double") / sum("n_content"), 6)
          .as("avg_content_byte"))
      .orderBy("kind")
  }

  val q29Sql: String =
    """WITH m AS (
      | SELECT doc_id,
      |  (['image', 'audio', 'video'])[doc_id % 3 + 1] AS kind,
      |  n_chars % 8 + 2 AS w, n_chars % 6 + 2 AS h,
      |  n_chars % 3 + 1 AS f,
      |  list_transform(range(0, 16),
      |    i -> CAST('0x' || substr(md5(text), i * 2 + 1, 2) AS INT)) AS db
      | FROM documents),
      |c AS (
      | SELECT kind,
      |  CASE WHEN kind = 'audio' THEN 0 ELSE w END AS px_w,
      |  CASE WHEN kind = 'audio' THEN 0 ELSE h END AS px_h,
      |  CASE kind WHEN 'image' THEN 1 WHEN 'video' THEN f ELSE 0 END AS n_frames,
      |  CASE WHEN kind = 'audio' THEN 8000 ELSE 0 END AS sample_rate,
      |  CASE kind WHEN 'audio' THEN 64
      |            WHEN 'image' THEN w * h * 3
      |            ELSE f * w * h * 3 END AS n_content,
      |  -- pixel/sample bytes cycle the 16-byte digest: sum = full
      |  -- cycles * digest sum + the partial-cycle prefix sum
      |  CASE kind
      |   WHEN 'audio' THEN 4 * list_sum(db)
      |   ELSE (CASE kind WHEN 'image' THEN 1 ELSE f END)
      |        * ((w * h * 3 // 16) * list_sum(db)
      |           + coalesce(list_sum(db[1 : w * h * 3 % 16]), 0))
      |  END AS content_sum
      | FROM m)
      |SELECT kind, count(*) AS n_media,
      | round(CAST(sum(px_w) AS DOUBLE) / count(*), 6) AS avg_w,
      | round(CAST(sum(px_h) AS DOUBLE) / count(*), 6) AS avg_h,
      | CAST(sum(n_frames) AS BIGINT) AS total_frames,
      | max(sample_rate) AS sample_rate,
      | round(CAST(sum(content_sum) AS DOUBLE) / sum(n_content), 6)
      |   AS avg_content_byte
      |FROM c GROUP BY kind ORDER BY kind""".stripMargin

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
  // q61 payload near-dup: byte chunk-shingle MinHash over the binary
  // payload feeding the SAME LSH/band/verify machinery as text near-dup
  // (Dedup.lshNearDupPairs is payload-agnostic) — the codec-free
  // perceptual-dedup stand-in. Injected positives: every media_id % 9
  // == 0 payload re-inserted (id + 500000) with its last 8 of 128 bytes
  // replaced — 14 of 15 chunk windows shared (Jaccard 0.875). Oracle
  // mirrors the chunking in hex-string space (DuckDB cannot slice or
  // md5 blobs): hex(substring(bytes, p, l)) IS a substring of the
  // payload's hex form, so the values are identical by construction.
  private val ChunkBytes = 16
  private val ChunkStride = 8
  private val MmNumHashes = 12
  private val MmBands = 4
  private val MmRowsPerBand = 3
  private val MmMaxBucket = 1 << 10

  private def payloadCorpus(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.syntheticMedia(documents(s, d))
      .select("media_id", "bytes")
    media.unionByName(
      media.filter(col("media_id") % 9 === 0)
        .select((col("media_id") + 500000).as("media_id"),
          concat(substring(col("bytes"), 1, 120),
            unhex(repeat(lit("ab"), 8))).as("bytes")))
  }

  def q61PayloadNeardup(s: SparkSession, d: String): DataFrame =
    Dedup.lshNearDupPairs(
      payloadCorpus(s, d).withColumn("sh",
        Multimodal.byteChunkHashes(col("bytes"), ChunkBytes, ChunkStride)),
      "media_id", "sh", MmNumHashes, MmBands, MmRowsPerBand,
      minJaccard = 0.5, maxBucket = MmMaxBucket)

  val q61Sql: String = {
    val p = Dedup.MinhashP
    // hex-space payload: upper(repeat(md5(text), 8)) = hex(bytes);
    // chunk i covers hex chars [i*2*stride+1, +2*chunk)
    val hexCorpus =
      """SELECT doc_id AS media_id, upper(repeat(md5(text), 8)) AS hx
        |FROM documents
        |UNION ALL
        |SELECT doc_id + 500000 AS media_id,
        | upper(substr(repeat(md5(text), 8), 1, 240) || repeat('ab', 8)) AS hx
        |FROM documents WHERE doc_id % 9 = 0""".stripMargin
    val sigExprs = (0 until MmNumHashes).map { i =>
      val (a, b) = Dedup.minhashCoeffs(i)
      s"list_min(list_transform(sh, h -> ((h % $p) * $a + $b) % $p)) AS sig$i"
    }.mkString(",\n ")
    val bandSelects = (0 until MmBands).map { b =>
      val cols = (0 until MmRowsPerBand)
        .map(r => s"CAST(sig${b * MmRowsPerBand + r} AS VARCHAR)").mkString(", ")
      s"SELECT media_id, $b AS band, md5(concat_ws(',', $cols)) AS bucket FROM sig"
    }.mkString("\n UNION ALL ")
    // byte-window start offsets, mirroring Multimodal.byteChunkHashes:
    // the strided grid plus one tail window when the payload length is
    // not stride-aligned (inert for this 128-byte fixture, mirrored so
    // the twins stay semantically identical)
    val nSql = "(len(hx) // 2)"
    val nWinSql =
      s"greatest(($nSql - $ChunkBytes) // $ChunkStride + 1, 1)"
    val gridSql =
      s"list_transform(range(0, $nWinSql), i -> i * $ChunkStride)"
    val startsSql =
      s"""CASE WHEN ($nSql - $ChunkBytes) > ($nWinSql - 1) * $ChunkStride
         |    THEN list_append($gridSql, $nSql - $ChunkBytes)
         |    ELSE $gridSql END""".stripMargin
    s"""WITH media AS ($hexCorpus),
       |sh AS (SELECT media_id,
       |  list_distinct(list_transform($startsSql,
       |    s -> CAST(('0x' || substr(md5(substr(hx, s * 2 + 1,
       |           ${2 * ChunkBytes})), 1, 15)) AS BIGINT))) AS sh
       | FROM media),
       |sig AS (SELECT media_id, sh,
       | $sigExprs
       | FROM sh),
       |allbuckets AS ($bandSelects),
       |buckets AS (
       | SELECT media_id, band, bucket FROM (
       |  SELECT media_id, band, bucket,
       |   row_number() OVER (PARTITION BY band, bucket ORDER BY media_id) AS rn
       |  FROM allbuckets)
       | WHERE rn <= $MmMaxBucket),
       |pairs AS (
       | SELECT DISTINCT x.media_id AS a, y.media_id AS b
       | FROM buckets x JOIN buckets y
       |   ON x.band = y.band AND x.bucket = y.bucket AND x.media_id < y.media_id),
       |verified AS (
       | SELECT p.a, p.b,
       |  round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |        / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
       | FROM pairs p
       |  JOIN sh sa ON sa.media_id = p.a
       |  JOIN sh sb ON sb.media_id = p.b)
       |SELECT a, b, jaccard FROM verified WHERE jaccard >= 0.5
       |ORDER BY a, b""".stripMargin
  }

  // ---------------------------------------------------------------------
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal_decode" -> (q29MultimodalDecode _),
    "q30_frame_sample" -> (q30FrameSample _),
    "q61_payload_neardup" -> (q61PayloadNeardup _),
  )

  val oracle: Map[String, String] = Map(
    "q29_multimodal_decode" -> q29Sql,
    "q30_frame_sample" -> q30Sql,
    "q61_payload_neardup" -> q61Sql,
  )
}
