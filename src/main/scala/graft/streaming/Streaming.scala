package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
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
  def hourlyRollup(events: DataFrame, watermark: Option[String] = Some("2 hours"))
      : DataFrame = {
    val src = watermark.map(w => events.withWatermark("ts", w)).getOrElse(events)
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))
  }

  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
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
}
