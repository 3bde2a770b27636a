package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming tier (SURVEY.md §2.9).
  *
  * The reference is batch-only — its "streaming" is chunked CSV IO that
  * still materializes everything (`shape-data.js:74,84-95`). This module
  * provides the streaming seam the rebuild was designed around: the SAME
  * transform serves `spark.read` (batch, oracle-checked as q06) and
  * `spark.readStream` (incremental with watermark), because both are
  * `DataFrame => DataFrame` over an event-time column.
  *
  * Scale notes:
  *  - the windowed rollup is a streaming state-store aggregation keyed
  *    (window, event_type); the watermark bounds state size — without it
  *    100 TB of history accumulates in the store.
  *  - sessionization uses `flatMapGroupsWithState` with processing-time
  *    timeout: state is one small case class per active user, evicted on
  *    timeout — the canonical custom-state shape
  *    (`KeyValueGroupedDataset`, SURVEY.md prompt requirement).
  */
object Streaming {

  /** Event-time tumbling rollup; with `watermark` set this is a valid
    * incremental streaming aggregation (append mode after the watermark
    * passes), and with watermark = None it is exactly the batch q06 plan.
    */
  def hourlyRollup(events: DataFrame, watermark: Option[String] = Some("2 hours"),
      slide: Option[String] = None): DataFrame = {
    val src = watermark.map(w => events.withWatermark("ts", w)).getOrElse(events)
    // slide < duration ⇒ HOPPING windows (each event expands into
    // duration/slide overlapping windows map-side) — the q132 shape;
    // state-store keys grow by the same factor, still watermark-bounded
    val w = slide.map(sl => window(col("ts"), "1 hour", sl))
      .getOrElse(window(col("ts"), "1 hour"))
    src.groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))
  }

  /** Streaming rolling-WAU — q139's §2.9 face: sliding 7-day
    * event-time windows (1-day hop) carrying an HLL distinct-user
    * estimate per window. EXACT sliding distinct in a stream needs
    * per-(window, user) state — two chained stateful dedups whose
    * state grows with users; the streaming-native answer is the
    * bounded sketch (one HLL register set per window), the same
    * approximate-face division as q35's approx_count_distinct scale
    * path (accuracy hook: AnalyticsSpec's 4·rsd HLL bound). q139 is
    * the exact batch twin / backfill corrector. `day` = the last day
    * the window covers (q139's trailing-window key); the stream also
    * emits trailing windows past the last event day — a monitoring
    * consumer wants those (activity is still inside the horizon), a
    * backfill report uses the batch twin's dense grid.
    *
    * OUTPUT-MODE contract (state boundedness depends on it): in
    * APPEND mode the watermark EVICTS each window's registers once it
    * closes — state is bounded by open windows (~9 at a 2-day
    * watermark), at the price of each day's row emitting only after
    * the watermark passes its window end. In COMPLETE mode (the
    * snapshot shape the spec uses for deterministic assertion) every
    * window ever opened stays in the state store — fine for tests and
    * bounded replays, NOT the unbounded-production mode.
    */
  def wauStream(events: DataFrame,
                watermark: Option[String] = Some("2 days"),
                rsd: Double = 0.02): DataFrame = {
    val src = watermark.map(w => events.withWatermark("ts", w))
      .getOrElse(events)
    src.groupBy(window(col("ts"), "7 days", "1 day").as("w"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("wau_approx"))
      .select(date_format(expr("w.end - INTERVAL 1 DAY"), "yyyy-MM-dd")
        .as("day"), col("wau_approx"))
  }

  /** `event_id` is the corpus's stable tie-breaker (same role as in
    * q141's window order): only [[attributionStep]] consults it, so
    * fixtures that exercise other operators may leave the default.
    */
  case class Event(user_id: Long, ts: Timestamp, event_type: String,
                   value: Double, event_id: Long = 0L)
  case class SessionState(start: Long, lastSeen: Long, nEvents: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long, total: Double)

  /** One state-machine step of sessionization: the timed-out branch
    * flushes the open session and REMOVES the state (without eviction,
    * state grows with every user ever seen — the 100 TB state blow-up);
    * the data branch merges events within `gapMs`, emits closed
    * sessions, and re-arms the timeout when `armTimeout`. Exposed for
    * direct unit testing via `TestGroupState`.
    */
  def sessionStep(gapMs: Long, armTimeout: Boolean)(
      userId: Long, it: Iterator[Event], state: GroupState[SessionState])
      : Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val flushed = state.getOption.map(s =>
        SessionOut(userId, new Timestamp(s.start),
          new Timestamp(s.lastSeen), s.nEvents, s.total))
      state.remove()
      flushed.iterator
    } else {
      val sorted = it.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      for (e <- sorted) {
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastSeen <= gapMs =>
            cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1,
              total = s.total + e.value))
          case Some(s) =>
            out += SessionOut(userId, new Timestamp(s.start),
              new Timestamp(s.lastSeen), s.nEvents, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        if (armTimeout) state.setTimeoutDuration(gapMs)
      }
      out.iterator
    }
  }

  /** Stateful sessionization: events within `gapMs` of each other belong
    * to one session; a closed session emits one row. In production
    * (default) idle users time out after `gapMs` of processing time:
    * their open session flushes and the state is evicted. Tests pass
    * `NoTimeout` so `processAllAvailable` settles deterministically (a
    * processing-time timeout keeps the micro-batch trigger busy); the
    * timeout branch itself is unit-tested with `TestGroupState`.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 timeout: GroupStateTimeout =
                   GroupStateTimeout.ProcessingTimeTimeout()): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val arm = timeout == GroupStateTimeout.ProcessingTimeTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeout)(sessionStep(gapMs, arm))
  }

  /** Batch twin of [[sessionize]] — windowed gap detection, same output
    * contract, for backfills over historical data (one shuffle + sort
    * instead of state).
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val us = unix_micros(col("ts")) // exact integer microseconds
    val marked = events
      .withColumn("prev_us", lag(us, 1).over(w))
      .withColumn("new_session",
        (col("prev_us").isNull || (us - col("prev_us") > gapMs * 1000L)).cast("int"))
      .withColumn("session_id",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
      .drop("session_id")
  }

  case class FunnelState(anchors: Seq[Long])
  case class FunnelHit(user_id: Long, stage_idx: Int, stage: String,
                       ts: Timestamp)

  /** One state-machine step of the streaming funnel — q123's
    * first-match + per-stage-window semantics as per-user state: one
    * FIXED-SIZE anchor array per active user (first qualifying
    * completion time per stage, in event-time micros), so state is
    * bounded by active users whatever the event volume, and the
    * timeout branch evicts idle users entirely (their anchor windows
    * are long past). A stage anchors only once (first match — a later
    * re-entry never re-opens the window, the q123 contract) and only
    * when it lands strictly after and within `windowMs` of the
    * PREVIOUS stage's anchor. Each new anchor emits one append-mode
    * transition row — the output is a conversion event stream, which
    * downstream counts per stage without ever storing raw events.
    *
    * Stream ≡ batch (`QueriesStream.q123Funnel`) under event-time-
    * ordered delivery: processing in ts order makes greedy
    * first-qualifying identical to the batch window-min. A late event
    * arriving BEHIND an already-set anchor does not re-anchor —
    * the batch twin is the backfill corrector, the same division of
    * labor as every stream/batch pair in this module.
    */
  def funnelStep(stages: Seq[String], windowMs: Long, armTimeout: Boolean,
      evictMs: Long)(
      userId: Long, it: Iterator[Event], state: GroupState[FunnelState])
      : Iterator[FunnelHit] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      def micros(t: Timestamp): Long =
        t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
      // the stages list is part of the query's identity: a restored
      // anchor array of another length means the checkpoint was taken
      // under a DIFFERENT funnel definition — fail loudly (an index
      // walk over the stale array would either AIOOBE or silently
      // misattribute anchors to reordered stages)
      state.getOption.foreach(st =>
        require(st.anchors.size == stages.size,
          s"funnel stages changed across restart (state has " +
            s"${st.anchors.size} anchors, query has ${stages.size}) — " +
            "start a new checkpoint"))
      // unset-stage sentinel: Long.MinValue, NOT -1 — a pre-1970
      // event time is legitimate negative micros and must not read as
      // "stage never anchored" (MinValue is unreachable: it would be
      // year −290308, far outside Timestamp's range). MIGRATION: a
      // checkpoint written before this change stored -1 for unset
      // stages (and, because -1 then MEANT unset, never as a real
      // anchor) — map restored -1 anchors to the new sentinel so old
      // state resumes correctly. Cost: an anchor at exactly
      // 1969-12-31T23:59:59.999999 written by the NEW code is
      // indistinguishable from the legacy sentinel on restart; that
      // single microsecond is accepted and documented.
      val Unset = Long.MinValue
      val anchors = state.getOption
        .map(_.anchors.map(a => if (a == -1L) Unset else a).toArray)
        .getOrElse(Array.fill(stages.size)(Unset))
      val out = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
      for (e <- it.toSeq.sortBy(e => micros(e.ts))) {
        val i = stages.indexOf(e.event_type)
        if (i >= 0 && anchors(i) == Unset) {
          val t = micros(e.ts)
          val qualifies =
            if (i == 0) true
            else anchors(i - 1) != Unset && t > anchors(i - 1) &&
              t <= anchors(i - 1) + windowMs * 1000L
          if (qualifies) {
            anchors(i) = t
            out += FunnelHit(userId, i, stages(i), e.ts)
          }
        }
      }
      state.update(FunnelState(anchors.toSeq))
      if (armTimeout) state.setTimeoutDuration(evictMs)
      out.iterator
    }
  }

  /** Streaming ordered-funnel tracking — the §2.9 face of q123: per-user
    * stage anchors in `flatMapGroupsWithState`, emitting an append-only
    * stream of first-time stage completions. Timeout handling mirrors
    * [[sessionize]]: production arms a processing-time eviction, tests
    * pass `NoTimeout` so `processAllAvailable` settles.
    */
  def funnelStream(events: Dataset[Event], stages: Seq[String],
      windowMs: Long, evictMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    val arm = timeout == GroupStateTimeout.ProcessingTimeTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append(), timeout)(
        funnelStep(stages, windowMs, arm, evictMs))
  }

  case class AttrState(lastClickUs: Long)
  case class AttributionHit(user_id: Long, ts: Timestamp,
                            attributed: Boolean)

  /** One state step of the streaming last-touch attribution (q141's
    * §2.9 face): per-user state is ONE long — the latest click's
    * event-time micros seen so far (Long.MinValue = none, the funnel
    * sentinel discipline) — so state is bounded by active users
    * whatever the event volume; each conversion emits one append-mode
    * row with its attribution verdict. Stream ≡ batch under
    * event-time-ordered delivery (the funnelStream contract): within
    * a batch events process in `(ts, event_id)` order — EXACTLY the
    * batch twin q141's window order — so the running max IS the batch
    * window's running max, including same-microsecond click/conversion
    * ties (a click whose event_id precedes the conversion's is visible
    * to it; one that follows is not — whichever way the corpus ordered
    * them). A late-arriving click behind an already-emitted conversion
    * does not retro-attribute — the batch twin is the backfill
    * corrector; that cross-batch caveat is the only remaining
    * divergence surface.
    */
  def attributionStep(clickType: String, convType: String, windowUs: Long,
      armTimeout: Boolean, evictMs: Long)(
      userId: Long, it: Iterator[Event], state: GroupState[AttrState])
      : Iterator[AttributionHit] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      def micros(t: Timestamp): Long =
        t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
      val Unset = Long.MinValue
      var last = state.getOption.map(_.lastClickUs).getOrElse(Unset)
      val out = scala.collection.mutable.ArrayBuffer.empty[AttributionHit]
      // the batch twin's exact order: (micros, event_id) — see scaladoc
      for (e <- it.toSeq.sortBy(e => (micros(e.ts), e.event_id))) {
        val t = micros(e.ts)
        if (e.event_type == clickType) {
          last = if (last == Unset) t else math.max(last, t)
        } else if (e.event_type == convType) {
          out += AttributionHit(userId, e.ts,
            last != Unset && t >= last && t - last <= windowUs)
        }
      }
      state.update(AttrState(last))
      if (armTimeout) state.setTimeoutDuration(evictMs)
      out.iterator
    }
  }

  /** Streaming last-touch attribution — conversions stream out with
    * their verdict as they arrive; timeout handling mirrors
    * [[sessionize]] (tests pass `NoTimeout` so `processAllAvailable`
    * settles).
    */
  def attributionStream(events: Dataset[Event], clickType: String,
      convType: String, windowUs: Long, evictMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[AttributionHit] = {
    import events.sparkSession.implicits._
    val arm = timeout == GroupStateTimeout.ProcessingTimeTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttributionHit](
        OutputMode.Append(), timeout)(
        attributionStep(clickType, convType, windowUs, arm, evictMs))
  }

  /** Streaming exact dedup — the §2.9 face of
    * [[graft.operators.Dedup.exactDedup]]: re-deliveries of the same
    * normalized-text digest are dropped within the watermark horizon
    * (`dropDuplicatesWithinWatermark`, the bounded-state streaming dedup
    * idiom). State is one 32-char digest per distinct document inside
    * the horizon and is evicted as the watermark passes — without the
    * watermark the dedup store grows with every document ever seen.
    * `mode` selects the digest engine like the batch operator.
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String,
                  mode: graft.operators.TextStats.HashMode =
                    graft.operators.TextStats.HashMode.OracleMd5): DataFrame =
    docs.withColumn("text_md5",
        graft.operators.TextStats.textDigest(col(textCol), mode))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_md5")

  case class BucketHit(band: Int, bucket: String, id: Long, ts: Timestamp)
  case class AnchorState(minId: Long, lastSeenMs: Long)
  case class PairOut(a: Long, b: Long, band: Int, bucket: String)

  /** One state step of the streaming near-dup: state per (band, bucket)
    * is ONE anchor id (the minimum seen inside the horizon) — bounded
    * to two longs per active bucket, never a member list. A hit equal
    * to the anchor emits nothing (re-delivery of the anchor is
    * absorbed); a larger id emits its pair against the anchor; a
    * SMALLER id becomes the new anchor and emits against the old one.
    * The timed-out branch evicts the anchor — without eviction the
    * store grows with every bucket ever seen (the 100 TB blow-up, same
    * argument as [[sessionStep]]). Exposed for `TestGroupState` unit
    * testing like [[sessionStep]].
    */
  def nearDupStep(horizonMs: Long, armTimeout: Boolean)(
      key: (Int, String), it: Iterator[BucketHit],
      state: GroupState[AnchorState]): Iterator[PairOut] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val hits = it.toSeq.sortBy(h => (h.ts.getTime, h.id))
      var cur = state.getOption
      val out = scala.collection.mutable.ArrayBuffer.empty[PairOut]
      var maxTs = Long.MinValue
      for (h <- hits) {
        maxTs = math.max(maxTs, h.ts.getTime)
        cur match {
          case None =>
            cur = Some(AnchorState(h.id, h.ts.getTime))
          case Some(s) if h.id == s.minId =>
            cur = Some(s.copy(lastSeenMs = math.max(s.lastSeenMs, h.ts.getTime)))
          case Some(s) =>
            out += PairOut(math.min(s.minId, h.id), math.max(s.minId, h.id),
              key._1, key._2)
            cur = Some(AnchorState(math.min(s.minId, h.id),
              math.max(s.lastSeenMs, h.ts.getTime)))
        }
      }
      cur.foreach { s =>
        state.update(s)
        if (armTimeout) state.setTimeoutTimestamp(maxTs + horizonMs)
      }
      out.iterator
    }
  }

  /** Streaming near-dup candidate pairs — the §2.9 face of the batch
    * MinHash+LSH tier (q23, [[graft.operators.Dedup.lshNearDupPairs]]):
    * each arriving document is shingled, MinHash-signed, and banded
    * MAP-SIDE (the same native expressions as the batch path — no
    * state touched yet), then its (band, bucket) hits run through
    * [[nearDupStep]]'s anchor state. Emitted pairs are LSH CANDIDATES
    * (the batch path's pre-Jaccard stage); a deployment verifies
    * exact similarity downstream where both texts are at hand.
    *
    * Anchor-star semantics: each bucket emits pairs against its
    * running minimum id, not the full clique — state stays O(1) per
    * bucket where a clique would need the member list. When ids
    * arrive in ascending order this equals the batch anchor-star
    * ([[bucketAnchorPairsBatch]], the StreamingSpec twin check);
    * out-of-order arrival still pairs every member to SOME anchor.
    * Re-deliveries may duplicate a pair row (consumers `distinct()`
    * the tiny pair stream; the anchor itself is absorbed statefully).
    *
    * `timeout`: event-time eviction after `watermark` of bucket
    * inactivity in production; tests pass `NoTimeout` so
    * `processAllAvailable` settles deterministically (the
    * [[sessionize]] pattern).
    */
  def nearDupPairsStream(docs: DataFrame, textCol: String, idCol: String,
                         tsCol: String, watermark: String,
                         k: Int, numHashes: Int, bands: Int, rowsPerBand: Int,
                         mode: graft.operators.TextStats.HashMode =
                           graft.operators.TextStats.HashMode.EngineXx,
                         timeout: GroupStateTimeout =
                           GroupStateTimeout.EventTimeTimeout()): Dataset[PairOut] = {
    import docs.sparkSession.implicits._
    import graft.operators.Dedup
    // Only event-time eviction (or none, for deterministic tests) is
    // supported: nearDupStep arms event-time timeouts off the watermark,
    // so a ProcessingTimeTimeout would silently never evict (the
    // unbounded-store blow-up nearDupStep's doc warns about).
    require(timeout == GroupStateTimeout.EventTimeTimeout()
      || timeout == GroupStateTimeout.NoTimeout(),
      s"nearDupPairsStream supports EventTimeTimeout or NoTimeout, got $timeout")
    val horizonMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    // months are calendar-relative (28-31 days) and cannot convert to a
    // fixed millisecond horizon — reject rather than silently drop them
    require(horizonMs.months == 0,
      s"watermark interval must not carry a months component, got '$watermark'")
    val horizon = horizonMs.days * 86400000L + horizonMs.microseconds / 1000L
    val arm = timeout == GroupStateTimeout.EventTimeTimeout()
    val shingled = docs
      .withColumn("sh", Dedup.hashedWordShingles(textCol, k, mode))
    val withSig = Dedup.minhashSignature(col("sh"), numHashes)
      .foldLeft(shingled) { case (df, (n, c)) => df.withColumn(n, c) }
      .withColumn("buckets", Dedup.lshBuckets(bands, rowsPerBand, mode))
    val hits = withSig
      .withWatermark(tsCol, watermark)
      .select(explode(col("buckets")).as("bb"), col(idCol).as("id"),
        col(tsCol).as("ts"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("id"), col("ts"))
      .as[BucketHit]
    hits.groupByKey(h => (h.band, h.bucket))
      .flatMapGroupsWithState[AnchorState, PairOut](
        OutputMode.Append(), timeout)(nearDupStep(horizon, arm))
  }

  /** Streaming test-set decontamination — the §2.9 face of
    * [[graft.operators.Dedup.contaminatedIds]]: drop arriving documents
    * sharing any word k-gram with the (static, tiny) benchmark set.
    * The eval side collapses to a driver-side distinct hash set ONCE
    * and ships as a literal — the q55 asymmetry taken to its stateless
    * conclusion: the filter is a pure map-side projection
    * (`arrays_overlap` over the native one-pass shingle hashes), no
    * state store, no watermark, trivially valid under `readStream`.
    * Re-learning a GROWING eval set means restarting the stream with a
    * new literal — the right trade for a set that changes per release,
    * not per record.
    */
  def decontaminateStream(docs: DataFrame, textCol: String, evalDocs: DataFrame,
                          k: Int,
                          mode: graft.operators.TextStats.HashMode =
                            graft.operators.TextStats.HashMode.EngineXx): DataFrame = {
    import graft.operators.Dedup
    val evalHashes = evalDocs
      .select(explode(Dedup.hashedWordShingles(textCol, k, mode)).as("h"))
      .distinct().collect().map(_.getLong(0)).sorted
    val evalArr = array(evalHashes.toIndexedSeq.map(lit): _*)
    docs.filter(!arrays_overlap(
      Dedup.hashedWordShingles(textCol, k, mode), evalArr))
  }

  /** Streaming face of BLOOM decontamination — [[decontaminateStream]]'s
    * scale path for an eval set too large to ship as a literal hash
    * array (the same regime split as
    * [[graft.operators.Dedup.contaminatedIdsBloom]] vs
    * `contaminatedIds`). The frozen Bloom bit array
    * ([[graft.operators.Dedup.bloomBits]], built ONCE at stream setup —
    * an index-version artifact like a quantizer codebook) rides the
    * native [[graft.functions.BloomAnyExpr]] as a pure map-side
    * projection, so the face is stateless and stream ≡ batch.
    *
    * Output ROUTES rather than drops: `maybe_contaminated = false` is
    * DEFINITE-clean (no false negatives — those rows are safe to pass
    * straight to the training sink), `true` marks the small suspect
    * slice for exact adjudication. The exact confirm is a join against
    * the full eval shingle set, which a stream cannot anti-join
    * statelessly — deployment runs `contaminatedIdsBloom`'s confirm
    * stage over the suspect partition in `foreachBatch` (or offline),
    * which is exactly the compaction-style division of labor: cheap
    * definite answers in-stream, bounded exact work behind them.
    */
  def bloomRouteStream(docs: DataFrame, textCol: String, k: Int,
                       bits: Array[Long], mBits: Int, numProbes: Int,
                       mode: graft.operators.TextStats.HashMode =
                         graft.operators.TextStats.HashMode.EngineXx): DataFrame =
    docs.withColumn("maybe_contaminated",
      graft.functions.BloomAnyExpr.bloomAny(
        graft.operators.Dedup.hashedWordShingles(textCol, k, mode),
        bits, mBits, numProbes))

  /** Batch twin of [[nearDupPairsStream]]'s anchor-star: every bucket
    * member pairs against the bucket's minimum id — the contract the
    * StreamingSpec re-delivery test checks the stream against.
    */
  def bucketAnchorPairsBatch(docs: DataFrame, textCol: String, idCol: String,
                             k: Int, numHashes: Int, bands: Int, rowsPerBand: Int,
                             mode: graft.operators.TextStats.HashMode =
                               graft.operators.TextStats.HashMode.EngineXx): DataFrame = {
    import graft.operators.Dedup
    val shingled = docs
      .withColumn("sh", Dedup.hashedWordShingles(textCol, k, mode))
    val withSig = Dedup.minhashSignature(col("sh"), numHashes)
      .foldLeft(shingled) { case (df, (n, c)) => df.withColumn(n, c) }
      .withColumn("buckets", Dedup.lshBuckets(bands, rowsPerBand, mode))
    val hits = withSig
      .select(explode(col("buckets")).as("bb"), col(idCol).as("id"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
    hits.withColumn("__min", min("id").over(w))
      .filter(col("id") =!= col("__min"))
      .select(col("__min").as("a"), col("id").as("b"),
        col("band"), col("bucket"))
      .distinct()
  }

  /** Streaming face of the PQ index-UPDATE path: encode arriving
    * vectors to (id, sub, cid) code rows against an immutable registry
    * codebook. A deployment's ANN index ingests this way — the index
    * BUILD (q82's persisted code table) and the continuous append for
    * new corpus rows are the same expression, because
    * [[graft.operators.Pq.encodeCodes]] is a pure projection: window
    * functions are unsupported on streaming frames, projections are
    * (that constraint is why the map-side encoder exists). Stateless —
    * no watermark, no state store; each micro-batch encodes
    * independently and appends, and codebooks never change under an
    * index version (re-training is a new index, the model-registry
    * discipline).
    */
  def pqEncodeStream(vectors: DataFrame, idCol: String, vecCol: String,
                     codebook: Seq[(Int, Int, Array[Double])]): DataFrame =
    graft.operators.Pq.codeRowsMapSide(vectors, idCol, vecCol, codebook)

  /** Streaming face of the SQ8 index append — [[pqEncodeStream]]'s twin
    * for the scalar-quantized index: arriving vectors encode to
    * (id, codes) rows against immutable learned ranges.
    * [[graft.operators.Sq.encodeCodes]] is a pure projection, so the
    * same stateless batch ≡ stream contract holds (ranges never change
    * under an index version; re-learning is a new index).
    */
  def sqEncodeStream(vectors: DataFrame, idCol: String, vecCol: String,
                     ranges: graft.operators.Sq.Ranges): DataFrame =
    vectors.select(col(idCol).as("id"),
      graft.operators.Sq.encodeCodes(col(vecCol), ranges).as("codes"))

  /** Streaming face of the IVF LIST APPEND — the coarse-quantizer
    * third of the continuous index-ingest family next to
    * [[pqEncodeStream]] (codes) and [[sqEncodeStream]] (scalar codes):
    * arriving vectors assign to their inverted list against an
    * IMMUTABLE persisted coarse quantizer (an index version freezes
    * its centroids; re-learning is a new index version).
    * [[graft.operators.Similarity.assignClusters]] is a pure
    * literal-centroid argmin projection, so the same stateless
    * batch ≡ stream contract holds — appending (id, cid) rows to the
    * persisted list-assignment table is all a serving IVF needs to
    * make new vectors searchable.
    */
  def ivfAssignStream(vectors: DataFrame, idCol: String, vecCol: String,
                      centroids: Seq[(Int, Array[Double])]): DataFrame =
    graft.operators.Similarity
      .assignClusters(vectors, centroids, idCol, vecCol)
      .select(col(idCol).as("id"), col("cid"))

  /** Streaming face of the INCREMENTAL SEMANTIC DEDUP verdict
    * ([[graft.operators.Similarity.incrementalSemanticDedup]] under
    * `readStream`): arriving vectors assign to their cell against the
    * frozen coarse quantizer (pure literal-centroid argmin — the
    * [[ivfAssignStream]] projection), stream-static LEFT join the
    * PRE-PACKED anchor table
    * ([[graft.operators.Similarity.packedAnchors]] — one row per cell,
    * ≤ maxCluster anchors in an array), and fold the best anchor with
    * an in-row `aggregate` over that bounded array: max rounded
    * cosine, ties to the lowest anchor id — the batch operator's
    * semantics exactly, recomputed as a STATELESS projection (no
    * window, no groupBy, no watermark state; batch ≡ stream pinned in
    * StreamingSpec). The fold keeps the max of the TOTAL order
    * (cos desc, id asc), so the collect_list order of the packed array
    * is immaterial. A vector landing in a cell with no registry rows
    * (left-join miss) verdicts kept with null best_cos — same as
    * batch. Cosines use the hoisted-norm form over norms computed once
    * per row/anchor.
    */
  def semDedupVerdictStream(vectors: DataFrame, packedAnchors: DataFrame,
                            centroids: Seq[(Int, Array[Double])],
                            idCol: String, vecCol: String, tau: Double,
                            roundTo: Int = 6): DataFrame = {
    val assigned = graft.operators.Similarity
      .assignClusters(vectors, centroids, idCol, vecCol)
      .withColumn("__bnorm", sqrt(
        graft.functions.DotProductExpr.dotp(col(vecCol), col(vecCol))))
    val zero = struct(lit(null).cast("double").as("c"),
      lit(null).cast("long").as("a"))
    def fold(acc: Column, x: Column): Column = {
      val cand = round(
        graft.functions.DotProductExpr.dotp(x.getField("__avec"), col(vecCol))
          / (x.getField("__anorm") * col("__bnorm")), roundTo)
      val take = acc.getField("c").isNull ||
        cand > acc.getField("c") ||
        (cand === acc.getField("c") &&
          x.getField("__a") < acc.getField("a"))
      when(take, struct(cand.as("c"), x.getField("__a").cast("long").as("a")))
        .otherwise(acc)
    }
    assigned
      .join(packedAnchors, Seq("cid"), "left")
      .withColumn("__best", aggregate(col("__anchs"), zero, fold))
      .select(col(idCol), col("cid"),
        when(col("__best.c").isNotNull && col("__best.c") >= tau,
          col("__best.a")).as("dup_of"),
        col("__best.c").as("best_cos"),
        (col("__best.c").isNull || col("__best.c") < tau).as("kept"))
  }

  /** Streaming face of the TOMBSTONE REGISTRY APPEND — the delete half
    * of the continuous index lifecycle, next to the three append faces
    * ([[pqEncodeStream]] / [[sqEncodeStream]] / [[ivfAssignStream]]):
    * delete events arrive as (id, event-time) rows and project into
    * the registry's ids-only format. Repeated deletes of the same id
    * inside the watermark horizon collapse to one registry row
    * (`dropDuplicatesWithinWatermark` — bounded state, the q06 dedup
    * contract; deletes are idempotent so a re-delivery past the
    * horizon appending a second row is harmless — the serving
    * anti-join and the compaction filter are set-semantics). Serving
    * applies the registry as q108's broadcast LeftAnti before any
    * distance work, so a delete is visible at the next micro-batch
    * commit with zero index rebuild; `compactDropTombstones`
    * physically drops the rows and resets the registry.
    */
  def tombstoneStream(deletes: DataFrame, idCol: String, tsCol: String,
                      watermark: String): DataFrame =
    deletes.withWatermark(tsCol, watermark)
      .select(col(idCol).as("del_id"), col(tsCol))
      .dropDuplicatesWithinWatermark("del_id")
      .select("del_id")

  /** Streaming face of the HEAVY-HITTER candidate sketch (q110's pass
    * 1 under `readStream`): a Complete-mode global aggregation whose
    * state is the bounded Misra–Gries k-counter buffer — each
    * micro-batch folds its items into the store-persisted summary, so
    * the emitted candidate array always covers every θ-frequent item
    * of the WHOLE stream so far (the mergeable-summaries bound is
    * partition- and batch-order-free). Downstream, each emission feeds
    * the exact confirm count in `foreachBatch` — q110's second pass,
    * the same suspect-then-confirm shape as [[bloomRouteStream]].
    * Continuous vocabulary/domain monitoring without ever shuffling
    * or storing the raw token stream.
    */
  def heavyHitterCandidatesStream(items: DataFrame, itemCol: String,
                                  k: Int): DataFrame =
    items.agg(graft.functions.MisraGriesCandidates
      .mg(col(itemCol), lit(1L), k).as("cands"))

  /** Streaming per-group distinct sketches: [[graft.functions.KmvSketch]]
    * as a streaming aggregation (complete/update mode). State per group
    * is the ≤ k-long bottom-k set — bounded however long the stream
    * runs — and the sketch algebra (union / intersection / Jaccard
    * estimates, q120's panel) applies to any snapshot of the output
    * without touching the raw id stream. Continuous audience-overlap
    * monitoring: the streaming twin of q120's sketch-build pass.
    */
  def kmvSketchStream(items: DataFrame, groupCol: String, hashCol: String,
                      k: Int): DataFrame =
    items.groupBy(col(groupCol))
      .agg(graft.functions.Kmv.sketch(xxhash64(col(hashCol)), k).as("sk"))

  /** Streaming per-group Count–Min sketches
    * ([[graft.functions.CountMinSketchAgg]], complete/update mode) —
    * the frequency face next to [[kmvSketchStream]]'s distinct face and
    * [[heavyHitterCandidatesStream]]'s candidate face. State per group
    * is the fixed d·w cell array — bounded however long the stream runs
    * and however many distinct items pass — and because the cells are
    * element-wise additive, any snapshot of the output merges with
    * batch-built shard sketches by plain vector add (q147's audit
    * arithmetic applies unchanged to the streamed cells).
    */
  def cmSketchStream(items: DataFrame, groupCol: String, itemCol: String,
                     d: Int, w: Int, engineXx: Boolean = false): DataFrame =
    items.groupBy(col(groupCol))
      .agg(graft.functions.CountMinSketchAgg
        .cm(col(itemCol), lit(1L), d, w, engineXx).as("cells"))

  /** Streaming maintenance of the drift family's TOKEN-COUNT artifact
    * ([[graft.operators.TextStats.tokenCounts]] under `readStream`):
    * arriving documents tokenize map-side and fold into the
    * (group, tok, cnt) state — the exact summary every drift face
    * serves from, kept live instead of re-learned per generation.
    * State is vocab×groups rows (the bounded summary, NOT the corpus);
    * at the regime where even that is too large, [[cmSketchStream]] is
    * the fixed-memory stand-in — the same exact/sketch division as the
    * batch family. Complete/update mode; stream-final counts equal the
    * batch tokenCounts of everything delivered (StreamingSpec), so a
    * snapshot of this state IS the artifact the batch faces consume.
    */
  def tokenCountStream(docs: DataFrame, groupCol: String,
                       textCol: String): DataFrame =
    graft.operators.TextStats.tokenCounts(docs, groupCol, textCol)

  /** LIVE drift monitoring against a frozen snapshot — the deployment
    * shape q149 is designed for, as a stream: per group, the
    * Jensen–Shannon divergence between a FROZEN reference sketch
    * (batch-built cells, e.g. last generation's corpus — passed in as
    * a driver-side map, the broadcast-scale d·w-per-group artifact a
    * registry serves) and the [[cmSketchStream]] state accumulated
    * over everything delivered so far (complete/update mode). Each
    * emission is q149's exact arithmetic ([[TextStats.cmJsFromCells]]
    * — integer-pico JS lower bound, max over the d rows), so a
    * delivered prefix's readout equals the batch face on the same
    * rows: the stream ≡ batch contract every other streaming twin in
    * this file carries, pinned by StreamingSpec.
    *
    * Groups are driven by the STREAM side: a frozen group with no
    * arrivals yet has no row (a monitor liveness question, not a
    * divergence one — it surfaces the moment its first item lands, at
    * the ln 2 boundary if its vocabulary moved entirely); a streamed
    * group absent from the frozen map diffs against the all-zero
    * sketch, the same one-sided contract as the batch full-outer.
    */
  def cmJsShiftStream(items: DataFrame, groupCol: String, itemCol: String,
                      frozen: Map[String, Seq[Long]], d: Int,
                      w: Int): DataFrame = {
    frozen.values.foreach(c => require(c.length == d * w,
      s"frozen cells must be d*w = ${d * w} long, got ${c.length}"))
    graft.operators.TextStats.cmJsFromCells(
      cmSketchStream(items, groupCol, itemCol, d, w)
        .withColumnRenamed("cells", "cells_n")
        .withColumn("cells_o",
          coalesce(element_at(typedLit(frozen), col(groupCol)),
            expr(s"array_repeat(0L, ${d * w})"))),
      groupCol, d, w)
  }

  /** Stream-STREAM interval join — the q43 attribution semantics
    * (each left event pairs with the right events of the same key
    * whose timestamp lands in `[leftTs, leftTs + maxDelta]`) when
    * BOTH sides arrive as streams. This is the one Structured
    * Streaming shape where state lives on both sides: Spark buffers
    * each side's rows in the state store until the OTHER side's
    * watermark plus the range bound proves no future match can
    * arrive, then evicts — so the two `withWatermark` calls and the
    * event-time range predicate are not optional tuning but the
    * state-size contract (without them an inner stream-stream join
    * buffers both streams forever; SPARK docs call this out as the
    * unbounded-state mode).
    *
    * Contrast with the batch twin [[graft.operators.Joins.rangeJoin]]:
    * batch turns the range predicate into a bucketed EQUI-join because
    * a batch range join would otherwise plan as a nested loop; the
    * stream side needs no bucket trick — micro-batch arrival already
    * bounds the probe set, and the state store is the "bucket".
    * Output columns = left columns then right columns (callers
    * project/rename); inner join, append mode.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         leftTs: String, rightTs: String, maxDelta: String,
                         leftDelay: String, rightDelay: String): DataFrame = {
    // the LEFT side buffers waiting for right rows up to maxDelta
    // newer, so its eviction horizon is rightDelay + maxDelta — pass
    // leftDelay accordingly (e.g. maxDelta "1 hour", delays
    // "2 hours"/"1 hour"); Spark derives the actual state-cleanup
    // point from the watermarks AND the range predicate together
    val l = left.withWatermark(leftTs, leftDelay).alias("l")
    val r = right.withWatermark(rightTs, rightDelay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $maxDelta"))
  }
}
