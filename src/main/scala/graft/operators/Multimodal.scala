package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline tier: treat
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * run decode / feature-extract / resize / frame-sample as partition-wise
  * batch functions.
  *
  * The DECODE STEP IS A STUB — real image/audio codecs are not available
  * in this environment, so `decodeStub` derives deterministic fake
  * features from the payload bytes. Everything around it (schema, typed
  * row classes, `mapPartitions` batching, partition sizing) is the real
  * production plumbing and is exercised by tests.
  *
  * Spark-first design notes (100 TB scale):
  *  - media payloads stay in ONE binary column; all shuffles operate on
  *    (id, meta, features) projections — never shuffle the bytes unless
  *    the operator consumes them (decode runs map-side, pre-shuffle).
  *  - `mapPartitions` processes rows in micro-batches (`batchSize`) the
  *    way an Arrow/pandas UDF would, amortizing per-batch codec setup;
  *    in PySpark the same surface is `mapInPandas` with an identical
  *    schema contract.
  *  - partitions should be sized by BYTES not rows for media tables —
  *    `repartitionByPayload` targets a per-partition payload budget.
  */
object Multimodal {

  /** Typed media row: the canonical multimodal schema. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      width: Int, height: Int, duration_ms: Int)

  /** Extracted features per media item (decode output contract). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           mean_byte: Double, frames_sampled: Int,
                           feature: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", IntegerType, nullable = false)))

  /** Deterministic synthetic media table derived from `documents`: the
    * payload is the repeated md5 of the text (fake pixels), metadata from
    * doc stats. Kind cycles image/audio/video.
    */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      unhex(repeat(md5(col("text").cast("binary")), 8)).as("bytes"),
      (col("n_chars") % 640 + 32).cast("int").as("width"),
      (col("n_chars") % 480 + 32).cast("int").as("height"),
      (col("n_chars") * 10).cast("int").as("duration_ms"))

  /** STUB decode: deterministic fake feature extraction from payload
    * bytes (mean byte value + an 8-dim "embedding" from byte strides).
    * A real deployment replaces ONLY this function body with a codec
    * call; the batching contract is unchanged.
    */
  def decodeStub(m: MediaRow, targetFrames: Int): MediaFeatures = {
    val bs = m.bytes
    val mean = if (bs.isEmpty) 0.0
      else bs.map(b => (b & 0xff).toDouble).sum / bs.length
    val frames = m.kind match {
      case "video" => math.min(targetFrames, math.max(1, m.duration_ms / 1000))
      case _ => 1
    }
    val feat = (0 until 8).map { i =>
      if (bs.isEmpty) 0f
      else (bs((i * 37) % bs.length) & 0xff).toFloat / 255f
    }.toArray
    MediaFeatures(m.media_id, m.kind, bs.length, mean, frames, feat)
  }

  /** Partition-wise decode with micro-batching: the production
    * `mapPartitions` shape (grouped iterator = one codec setup per
    * batch, like an Arrow batch in `mapInPandas`).
    */
  def decodeFeatures(media: Dataset[MediaRow], targetFrames: Int = 4,
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec init would happen here
        batch.iterator.map(decodeStub(_, targetFrames))
      }
    }
  }

  /** Repartition a media table so each partition carries roughly
    * `targetBytes` of payload (bytes-aware sizing; row-count sizing is
    * wrong for media).
    *
    * Total payload size is ESTIMATED, cheapest source first — partition
    * sizing needs the right order of magnitude, not an exact byte
    * count:
    *  1. file-level metadata when the table is file-backed (sum of
    *     input file lengths from the filesystem — a driver-side
    *     metadata listing, ZERO data I/O). Compressed whole-row bytes
    *     under-estimate raw payload bytes somewhat, but on a media
    *     table the payload column dominates the file and media codecs
    *     rarely re-compress, so the magnitude is right.
    *  2. a deterministic row sample (`sampleFraction`, seed-pinned)
    *     when there is no file backing (views, in-memory frames). Note
    *     this still READS the payload column — `sample()` filters rows
    *     after the columnar scan, which cannot prune pages for a row
    *     sample — it only saves deserialization/compute, and a small
    *     sample has high variance; the metadata path above exists
    *     because of exactly that.
    *  3. the exact sum when the sample comes back empty (tiny table,
    *     where a full scan is by definition cheap).
    */
  def repartitionByPayload(media: DataFrame, byteCol: String,
                           targetBytes: Long,
                           sampleFraction: Double = 0.01): DataFrame = {
    // The metadata shortcut is only valid for a BARE scan: inputFiles
    // reflects the backing table regardless of filters/projections, so
    // a filtered frame (say 1% of rows kept) would be sized to the
    // whole table. Anything but a leaf (modulo aliases) falls through
    // to the row sample, which sees the filtered rows.
    val bareScan = {
      import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
      def unwrap(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
          : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = p match {
        case SubqueryAlias(_, c) => unwrap(c)
        case other => other
      }
      unwrap(media.queryExecution.analyzed).children.isEmpty
    }
    val fileBytes: Option[Long] = {
      val files =
        if (!bareScan) Array.empty[String]
        else try media.inputFiles catch { case _: Exception => Array.empty[String] }
      if (files.isEmpty) None
      else {
        val conf = media.sparkSession.sessionState.newHadoopConf()
        Some(files.iterator.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).getFileStatus(p).getLen
        }.sum)
      }
    }
    val total = fileBytes.getOrElse {
      val sampled = media.sample(withReplacement = false, sampleFraction, seed = 42)
        .select(sum(length(col(byteCol)))).head()
      if (sampled.isNullAt(0)) { // empty sample: table is tiny, scan it
        val full = media.select(sum(length(col(byteCol)))).head()
        if (full.isNullAt(0)) 0L else full.getLong(0)
      } else math.round(sampled.getLong(0) / sampleFraction)
    }
    val parts = math.max(1, (total / targetBytes).toInt)
    media.repartition(parts, col("media_id"))
  }

  /** STUB resize: recomputes metadata for a target box (aspect-preserving
    * fit) and re-stamps the payload deterministically. A real deployment
    * replaces the payload transform with a codec resize; the metadata
    * arithmetic and column contract are the production shape.
    */
  def resizeStub(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW.toDouble) / col("width"),
      least(lit(maxH.toDouble) / col("height"), lit(1.0)))
    media
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
      // stub payload transform: real code re-encodes pixels here
      .withColumn("bytes", expr("substring(bytes, 1, greatest(out_width, 16))"))
  }

  /** Distinct 60-bit hashes of overlapping byte-chunk "shingles" of a
    * binary payload — the perceptual-dedup stand-in that needs no codec
    * (real perceptual hashing swaps into the same column contract).
    * Feed the result straight into the payload-agnostic near-dup
    * machinery: [[Dedup.minhashSignature]] / [[Dedup.lshBuckets]] /
    * [[Dedup.lshCandidatePairs]], or the whole
    * [[Dedup.lshNearDupPairs]] pipeline.
    *
    * Windows are `chunkBytes` wide starting every `stride` bytes
    * (stride < chunkBytes = overlapping, boundary-shift tolerant);
    * payloads shorter than one chunk hash as a single whole-payload
    * chunk. Chunk identity is the hash of the chunk's HEX form:
    * binary slicing is engine-universal but blob hashing is not
    * (DuckDB's md5 only takes VARCHAR), and the hex detour keeps the
    * value oracle-reproducible under [[TextStats.HashMode.OracleMd5]].
    * Composed codegen'd built-ins (substr/hex per window) — a native
    * one-pass expression over the raw bytes is the same upgrade path as
    * [[graft.functions.WordShingleHashExpr]] if payload hashing ever
    * dominates a profile (payload DECODE dwarfs it in practice).
    */
  def byteChunkHashes(bytes: Column, chunkBytes: Int, stride: Int,
      mode: TextStats.HashMode = TextStats.HashMode.OracleMd5): Column = {
    require(chunkBytes >= 1 && stride >= 1, "chunkBytes and stride must be >= 1")
    val n = length(bytes)
    val nWin = greatest(
      floor((n - lit(chunkBytes)).cast("double") / stride).cast("int") + 1,
      lit(1))
    // when (n - chunkBytes) is not a stride multiple, the strided grid
    // stops short of the payload end — add one tail window anchored at
    // n - chunkBytes so a tail-only edit still changes the shingle set
    // (no-op for aligned lengths and for payloads under one chunk)
    val lastGridStart = (nWin - 1) * stride
    val tailStart = greatest(n - chunkBytes, lit(0))
    val starts = transform(sequence(lit(0), nWin - 1), i => i * stride)
    val allStarts = when(tailStart > lastGridStart,
      concat(starts, array(tailStart))).otherwise(starts)
    array_distinct(transform(allStarts,
      s => TextStats.hash60(hex(bytes.substr(s + 1, lit(chunkBytes))), mode)))
  }

  /** Frame-sample fan-out for video rows: one output row per sampled
    * frame index (deterministic stride), non-video rows pass with frame
    * 0. The real pipeline decodes the frame bytes here.
    */
  def sampleFrames(media: DataFrame, everyMs: Int): DataFrame =
    media.withColumn("frame_idx",
        explode(when(col("kind") === "video",
            sequence(lit(0),
              greatest(floor(col("duration_ms") / everyMs).cast("int") - 1, lit(0))))
          .otherwise(array(lit(0)))))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        (col("frame_idx") * everyMs).cast("int").as("frame_ms"))
}
