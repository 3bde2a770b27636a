package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline tier: treat
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * run decode / feature-extract / resize / frame-sample as partition-wise
  * batch functions.
  *
  * DECODE IS REAL (r9): pure-JVM codecs for offline-safe formats —
  * binary P6 PPM for images, a concatenated-P6 "PPM stream" for video
  * frames, RIFF/WAVE PCM for audio — parse the actual container bytes
  * (magic, header fields, chunk walk) and fail loudly on malformed
  * input. A production deployment swaps the codec bodies for JPEG/MP4
  * libraries; the schema, typed row classes, `mapPartitions`
  * micro-batching, and partition sizing are unchanged by that swap.
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

  /** Real-decode output contract: container-derived dimensions, frame
    * count, sample rate, and EXACT integer content statistics.
    * `content_sum` is the integer sum of decoded content bytes (pixels
    * across all frames, or PCM samples) so downstream averages divide
    * once at the end — integer partial sums are associative in any
    * aggregation order, the engine-parity discipline float means would
    * break.
    */
  case class DecodedMedia(media_id: Long, kind: String, px_w: Int,
                          px_h: Int, n_frames: Int, sample_rate: Int,
                          n_content: Int, content_sum: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", IntegerType, nullable = false)))

  /** Deterministic OPAQUE-payload media table derived from `documents`:
    * the payload is the repeated md5 of the text, metadata from doc
    * stats. Kind cycles image/audio/video. Used by the codec-free
    * operators (byte-chunk near-dup, frame-sample fan-out) whose
    * oracles mirror the payload in hex space; the decodable-format
    * twin is [[syntheticFormatMedia]].
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

  // ------------------------------------------------------- real codecs

  /** 8-bit mono PCM WAV parameters for the synthetic audio payloads. */
  val WavSamples = 64
  val WavSampleRate = 8000

  private def le32hex(v: Int): String =
    f"${v & 0xff}%02x${(v >> 8) & 0xff}%02x${(v >> 16) & 0xff}%02x${(v >> 24) & 0xff}%02x"
  private def le16hex(v: Int): String =
    f"${v & 0xff}%02x${(v >> 8) & 0xff}%02x"
  private def asciiHex(s: String): String =
    s.map(c => f"${c.toInt}%02x").mkString

  /** Canonical 44-byte RIFF/WAVE header (hex) for [[WavSamples]] 8-bit
    * mono samples at [[WavSampleRate]] Hz — constant because the
    * synthetic sample count is fixed, which keeps the builder a pure
    * column expression; the DECODER never assumes it and walks the
    * chunk list for real.
    */
  private[graft] val WavHeaderHex: String =
    asciiHex("RIFF") + le32hex(36 + WavSamples) + asciiHex("WAVE") +
      asciiHex("fmt ") + le32hex(16) + le16hex(1) + le16hex(1) +
      le32hex(WavSampleRate) + le32hex(WavSampleRate) + le16hex(1) +
      le16hex(8) + asciiHex("data") + le32hex(WavSamples)

  /** Deterministic DECODABLE media table: every payload is a valid
    * instance of a real container format —
    *  - image: binary P6 PPM (`P6\nW H\n255\n` + W·H·3 pixel bytes),
    *  - video: a "PPM stream" of F identical concatenated P6 frames,
    *  - audio: RIFF/WAVE 8-bit mono PCM, [[WavSamples]] samples.
    * Pixel/sample bytes cycle the md5 digest of the doc text, so a
    * SQL oracle can re-derive every decoded statistic from `documents`
    * alone (the hex-space mirror q61 uses). Dimensions are small
    * (w ∈ [2,9], h ∈ [2,7], frames ∈ [1,3]) — the point is container
    * correctness, not payload volume.
    */
  def syntheticFormatMedia(documents: DataFrame): DataFrame = {
    val w = (col("n_chars") % 8 + 2).cast("int")
    val h = (col("n_chars") % 6 + 2).cast("int")
    val f = (col("n_chars") % 3 + 1).cast("int")
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    val dgHex = repeat(md5(col("text").cast("binary")), 12)
    val header = format_string("P6\n%d %d\n255\n", w, h).cast("binary")
    val pixels = unhex(dgHex.substr(lit(1), w * h * lit(6)))
    val frame = concat(header, pixels)
    val video = when(f === 1, frame)
      .when(f === 2, concat(frame, frame))
      .otherwise(concat(frame, frame, frame))
    val audio = concat(unhex(lit(WavHeaderHex)),
      unhex(repeat(md5(col("text").cast("binary")), WavSamples / 16)))
    documents.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      when(kind === lit("image"), frame)
        .when(kind === lit("video"), video)
        .otherwise(audio).as("bytes"),
      w.as("width"), h.as("height"),
      (f * 1000).cast("int").as("duration_ms"))
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r'

  /** Parse one binary-P6 header at `off`: returns (w, h, pixelOffset).
    * Real parser semantics — magic check, whitespace/comment skipping,
    * decimal fields, the single post-maxval whitespace — and loud
    * failure on anything malformed.
    */
  private[graft] def ppmFrameHeader(bs: Array[Byte], off: Int): (Int, Int, Int) = {
    require(off + 2 <= bs.length && bs(off) == 'P' && bs(off + 1) == '6',
      s"not a P6 PPM at offset $off")
    var i = off + 2
    def skipWs(): Unit = {
      while (i < bs.length && isWs(bs(i))) i += 1
      while (i < bs.length && bs(i) == '#') { // comment to end of line
        while (i < bs.length && bs(i) != '\n') i += 1
        while (i < bs.length && isWs(bs(i))) i += 1
      }
    }
    def readInt(): Int = {
      skipWs()
      require(i < bs.length && bs(i) >= '0' && bs(i) <= '9',
        s"expected integer in PPM header at offset $i")
      var v = 0
      while (i < bs.length && bs(i) >= '0' && bs(i) <= '9') {
        v = v * 10 + (bs(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    require(w > 0 && h > 0, s"bad PPM dimensions ${w}x$h")
    require(maxv == 255, s"only maxval 255 supported, got $maxv")
    require(i < bs.length && isWs(bs(i)), "missing whitespace after maxval")
    i += 1 // exactly ONE whitespace byte, then binary pixel data
    (w, h, i)
  }

  /** Decode every P6 frame in a PPM stream (a plain P6 file is a
    * 1-frame stream): Seq of (w, h, pixels). Throws on truncation or
    * trailing garbage.
    */
  def decodePpmFrames(bs: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    require(bs.nonEmpty, "empty PPM payload")
    val out = Seq.newBuilder[(Int, Int, Array[Byte])]
    var off = 0
    while (off < bs.length) {
      val (w, h, px) = ppmFrameHeader(bs, off)
      val n = w * h * 3
      require(px + n <= bs.length,
        s"truncated PPM pixel data: need $n bytes at $px of ${bs.length}")
      out += ((w, h, java.util.Arrays.copyOfRange(bs, px, px + n)))
      off = px + n
    }
    out.result()
  }

  /** Minimal RIFF/WAVE PCM reader: walks the chunk list (word-aligned
    * sizes), reads `fmt ` and `data`; returns (sampleRate, bits,
    * channels, pcmBytes). PCM-only, loud failure otherwise.
    */
  def decodeWav(bs: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    def le32(o: Int): Int = (bs(o) & 0xff) | (bs(o + 1) & 0xff) << 8 |
      (bs(o + 2) & 0xff) << 16 | (bs(o + 3) & 0xff) << 24
    def le16(o: Int): Int = (bs(o) & 0xff) | (bs(o + 1) & 0xff) << 8
    def tag(o: Int): String = new String(bs, o, 4, "US-ASCII")
    require(bs.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    var off = 12; var sr = 0; var bits = 0; var ch = 0
    var data: Array[Byte] = null
    while (off + 8 <= bs.length) {
      val id = tag(off); val sz = le32(off + 4)
      require(sz >= 0 && off + 8 + sz <= bs.length,
        s"WAV chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          require(le16(off + 8) == 1, "only PCM WAV supported")
          ch = le16(off + 10); sr = le32(off + 12); bits = le16(off + 22)
        case "data" =>
          data = java.util.Arrays.copyOfRange(bs, off + 8, off + 8 + sz)
        case _ => () // unknown chunks skip cleanly, per spec
      }
      off += 8 + sz + (sz & 1)
    }
    require(sr > 0 && data != null, "WAV missing fmt /data chunk")
    (sr, bits, ch, data)
  }

  /** Decode one media row through the real codecs. */
  def decodeRow(m: MediaRow): DecodedMedia = m.kind match {
    case "image" | "video" =>
      val frames = decodePpmFrames(m.bytes)
      val (w, h, _) = frames.head
      var sum = 0L; var n = 0
      for ((_, _, px) <- frames; b <- px) { sum += (b & 0xff); n += 1 }
      DecodedMedia(m.media_id, m.kind, w, h, frames.size, 0, n, sum)
    case "audio" =>
      val (sr, _, _, pcm) = decodeWav(m.bytes)
      var sum = 0L
      for (b <- pcm) sum += (b & 0xff)
      DecodedMedia(m.media_id, m.kind, 0, 0, 0, sr, pcm.length, sum)
    case other =>
      throw new IllegalArgumentException(s"unknown media kind '$other'")
  }

  /** Partition-wise decode with micro-batching: the production
    * `mapPartitions` shape (grouped iterator = one codec setup per
    * batch, like an Arrow batch in `mapInPandas`). Decode runs
    * map-side, pre-shuffle; only the (id, stats) projection moves on.
    */
  def decodeMedia(media: Dataset[MediaRow],
                  batchSize: Int = 64): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec init would happen here
        batch.iterator.map(decodeRow)
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

  /** Re-encode a pixel frame as binary P6. */
  def encodePpm(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == w * h * 3, "pixel buffer does not match dimensions")
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px
  }

  /** REAL resize: decode the PPM / PPM-stream payload, nearest-neighbor
    * resample each frame into an aspect-preserving fit of maxW×maxH
    * (never upscales), re-encode as P6. Output is itself a valid PPM
    * stream — resize composes with [[decodePpmFrames]].
    */
  def resizePpmNearest(bs: Array[Byte], maxW: Int, maxH: Int): Array[Byte] = {
    require(maxW >= 1 && maxH >= 1, "target box must be positive")
    decodePpmFrames(bs).map { case (w, h, px) =>
      val scale = math.min(1.0,
        math.min(maxW.toDouble / w, maxH.toDouble / h))
      val ow = math.max(1, math.floor(w * scale).toInt)
      val oh = math.max(1, math.floor(h * scale).toInt)
      val out = new Array[Byte](ow * oh * 3)
      var y = 0
      while (y < oh) {
        val sy = y * h / oh
        var x = 0
        while (x < ow) {
          val sx = x * w / ow
          var c = 0
          while (c < 3) {
            out((y * ow + x) * 3 + c) = px((sy * w + sx) * 3 + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      encodePpm(ow, oh, out)
    }.reduce(_ ++ _)
  }

  /** Dataset-level resize (decode → resample → re-encode), micro-
    * batched like [[decodeMedia]]; audio rows pass through untouched.
    * Metadata (width/height) is re-stamped from the DECODED output —
    * container truth, not input metadata.
    */
  def resizeMedia(media: Dataset[MediaRow], maxW: Int, maxH: Int,
                  batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          if (m.kind == "audio") m
          else {
            val out = resizePpmNearest(m.bytes, maxW, maxH)
            val (w, h, _) = ppmFrameHeader(out, 0)
            m.copy(bytes = out, width = w, height = h)
          }
        }
      }
    }
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
