package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{coalesce, col, element_at, explode, expr, lit, typedLit, xxhash64}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming
import graft.streaming.Streaming.Event

/** Streaming tier tests: the windowed rollup and sessionization run for
  * real under `readStream` via MemoryStream, and the streaming
  * sessionizer agrees with its batch twin.
  */
class StreamingSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private val evts = Seq(
    Event(1L, ts(0), "click", 1.0),
    Event(1L, ts(10), "click", 2.0),   // same session (gap 30m)
    Event(1L, ts(60), "view", 4.0),    // new session
    Event(2L, ts(5), "click", 8.0))

  test("hourlyRollup runs incrementally under readStream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(evts: _*)
    val q = Streaming.hourlyRollup(stream.toDF(), watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("rollup_out")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("rollup_out").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 4)
    // batch twin produces the same aggregate
    val batch = Streaming.hourlyRollup(evts.toDF(), watermark = None).collect()
    assert(batch.map(_.getAs[Long]("n")).sum == 4)
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ==
      batch.map(r => (r.getString(0), r.getString(1))).toSet)
  }

  test("hopping rollup (slide < duration): stream-final equals batch, events double-count") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(evts: _*)
    val q = Streaming.hourlyRollup(stream.toDF(), watermark = Some("2 hours"),
        slide = Some("30 minutes"))
      .writeStream.format("memory").queryName("hop_out")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("hop_out").collect()
    // 1h windows every 30m: each event lands in exactly 2 windows
    assert(rows.map(_.getAs[Long]("n")).sum == 8,
      s"each of the 4 events must count in 2 overlapping windows: ${rows.toSeq}")
    val batch = Streaming.hourlyRollup(evts.toDF(), watermark = None,
      slide = Some("30 minutes")).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"))).toSet ==
      batch.map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"))).toSet,
      "hopping stream must fold to the exact batch rollup")
  }

  test("rollup streams to a parquet file sink with checkpointing") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream").toString
    val stream = MemoryStream[Event]
    stream.addData(evts: _*)
    val q = Streaming.hourlyRollup(stream.toDF(), watermark = Some("0 seconds"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // advance the watermark past all events so windows finalize
      stream.addData(Event(9L, ts(10 * 60), "tick", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() >= 2) // the first two hourly windows emitted
    assert(new java.io.File(s"$dir/ckpt").exists) // checkpoint written
  }

  test("dedupStream drops re-delivered digests within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamingSpec.Doc]
    val t0 = 1700000000000L
    def doc(id: Long, text: String, offSec: Int) =
      StreamingSpec.Doc(id, text, new java.sql.Timestamp(t0 + offSec * 1000L))
    val q = Streaming.dedupStream(stream.toDF(), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // "B " re-delivers A's normalized text; doc 4 re-delivers doc 2's
      stream.addData(doc(1, "alpha beta", 0), doc(2, "gamma", 1),
        doc(3, "Alpha  Beta ", 2))
      q.processAllAvailable()
      stream.addData(doc(4, "GAMMA", 60), doc(5, "fresh text", 61))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup_out").collect()
    assert(out.length == 3, s"expected 3 survivors, got ${out.length}")
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 5L))
    // digests unique among survivors
    val digests = out.map(_.getAs[String]("text_md5"))
    assert(digests.distinct.length == digests.length)
  }

  test("tombstoneStream dedups re-delivered delete events; ids-only registry rows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamingSpec.Doc]
    val t0 = 1700000000000L
    def del(id: Long, offSec: Int) = StreamingSpec.Doc(id, "",
      new java.sql.Timestamp(t0 + offSec * 1000L))
    val q = Streaming.tombstoneStream(stream.toDF(), "doc_id", "ts",
        "10 minutes")
      .writeStream.format("memory").queryName("tomb_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // id 7 delivered twice in-horizon: one registry row
      stream.addData(del(7, 0), del(9, 1), del(7, 2))
      q.processAllAvailable()
      stream.addData(del(11, 60))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("tomb_out")
    assert(out.columns.toSeq == Seq("del_id"),
      "registry rows must be ids-only (broadcast-small contract)")
    val ids = out.collect().map(_.getAs[Long]("del_id")).toSeq
    assert(ids.sorted == Seq(7L, 9L, 11L), s"got $ids")
  }

  test("tombstoneStream registry composes with index serving: streamed deletes never surface") {
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val stream = MemoryStream[StreamingSpec.Doc]
    val t0 = 1700000000000L
    // stream the q108 rule's ids (vec_id % 17 == 5) as delete events —
    // the registry a deployment accumulates between compactions
    val delIds = spark.read.parquet(s"$d/embeddings.parquet")
      .where(expr("vec_id % 17 = 5"))
      .select("vec_id").collect().map(_.getLong(0))
    val q = Streaming.tombstoneStream(stream.toDF(), "doc_id", "ts",
        "10 minutes")
      .writeStream.format("memory").queryName("tomb_reg")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(delIds.map(id => StreamingSpec.Doc(id, "",
        new java.sql.Timestamp(t0))).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val registry = spark.table("tomb_reg")
    // serving through the STREAMED registry must equal q108 (which
    // derives the same registry relationally)
    val viaStream = QueriesSim.sqServeTopK(spark, d,
      QueriesSim.sqMergedIndex(spark, d)
        .join(org.apache.spark.sql.functions.broadcast(registry),
          col("nid") === col("del_id"), "left_anti")).collect().toSeq
    val viaQuery = QueriesSim.all("q108_tombstoned_serve")(spark, d)
      .collect().toSeq
    assert(viaStream == viaQuery,
      "streamed tombstone registry must serve identically to q108")
  }

  test("heavyHitterCandidatesStream: MG state folds across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val q = Streaming.heavyHitterCandidatesStream(
        stream.toDF().toDF("w"), "w", 10)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      // batch 1: 'alpha' heavy, 60 rare singletons
      stream.addData(Seq.fill(40)("alpha") ++ (1 to 60).map(i => s"r$i"): _*)
      q.processAllAvailable()
      // batch 2: 'beta' becomes heavy only ACROSS the whole stream
      stream.addData(Seq.fill(50)("beta") ++ (61 to 120).map(i => s"r$i"): _*)
      q.processAllAvailable()
    } finally q.stop()
    val cands = spark.table("hh_out")
      .select(explode(col("cands"))).as[String].collect().toSet
    // N = 210, k = 10 → threshold N/(k+1) ≈ 19: both heavies must be
    // candidates of the stream-wide summary
    assert(Set("alpha", "beta").subsetOf(cands), s"got $cands")
    assert(cands.size <= 10, "capacity bound must hold in the state store")
  }

  test("kmvSketchStream: stream-final sketches equal the batch sketches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val q = Streaming.kmvSketchStream(
        stream.toDF().toDF("grp", "uid"), "grp", "uid", 64)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode(OutputMode.Complete()).start()
    val b1 = (1 to 80).map(i => ("a", (i % 50).toLong)) ++
      (1 to 30).map(i => ("b", i.toLong))
    val b2 = (1 to 40).map(i => ("a", (i % 90).toLong)) ++
      (1 to 20).map(i => ("b", (i + 25).toLong))
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("kmv_out")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val batch = (b1 ++ b2).toDF("grp", "uid")
      .groupBy("grp")
      .agg(graft.functions.Kmv.sketch(xxhash64(col("uid")), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got == batch,
      "micro-batched state must fold to the exact batch sketch")
    // group b saw 45 distinct ids < k: the sketch is exact there
    assert(got("b").size == 45)
  }

  test("cmSketchStream: stream-final cells equal the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val (d, w) = (3, 97)
    val stream = MemoryStream[(String, String)]
    val q = Streaming.cmSketchStream(
        stream.toDF().toDF("grp", "item"), "grp", "item", d, w)
      .writeStream.format("memory").queryName("cm_out")
      .outputMode(OutputMode.Complete()).start()
    val b1 = (1 to 60).map(i => ("a", s"tok${i % 15}")) ++
      (1 to 25).map(i => ("b", s"tok${i % 7}"))
    val b2 = (1 to 40).map(i => ("a", s"tok${i % 25}"))
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cm_out")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val batch = (b1 ++ b2).toDF("grp", "item")
      .groupBy("grp")
      .agg(graft.functions.CountMinSketchAgg
        .cm(col("item"), lit(1L), d, w).as("cells"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got == batch,
      "micro-batched CM state must fold to the exact batch cells")
    // mass conservation per row over the streamed state
    assert((0 until d).forall(r =>
      got("a").slice(r * w, (r + 1) * w).sum == 100L))
  }

  test("tokenCountStream: stream-final counts ARE the batch artifact") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val q = Streaming.tokenCountStream(
        stream.toDF().toDF("source", "text"), "source", "text")
      .writeStream.format("memory").queryName("tokcnt_out")
      .outputMode(OutputMode.Complete()).start()
    val b1 = Seq(("a", "x y  x"), ("b", "z"), ("a", "y v2"))
    val b2 = Seq(("a", "x"), ("c", "w w w"))
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("tokcnt_out").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.TextStats
      .tokenCounts((b1 ++ b2).toDF("source", "text"), "source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch,
      "a snapshot of the streamed state must equal the batch artifact")
    // double-space tokenization edge rode through (empty tokens dropped)
    assert(got(("a", "x")) == 3L && !got.keySet.exists(_._2 == ""))
  }

  test("cmJsShiftStream: live divergence vs a frozen sketch equals the batch face") {
    implicit val sqlCtx = spark.sqlContext
    val (d, w) = (3, 97)
    // frozen reference: last generation's per-group sketches, batch-built
    val oldRows = (1 to 60).map(i => ("a", s"tok${i % 15}")) ++
      (1 to 25).map(i => ("b", s"tok${i % 7}")) ++
      (1 to 10).map(i => ("gone", s"tok${i % 3}")) // frozen-only group
    val frozen = oldRows.toDF("grp", "item")
      .groupBy("grp")
      .agg(graft.functions.CountMinSketchAgg
        .cm(col("item"), lit(1L), d, w).as("cells"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val stream = MemoryStream[(String, String)]
    val q = Streaming.cmJsShiftStream(
        stream.toDF().toDF("grp", "item"), "grp", "item", frozen, d, w)
      .writeStream.format("memory").queryName("cmjs_out")
      .outputMode(OutputMode.Complete()).start()
    val b1 = (1 to 40).map(i => ("a", s"tok${i % 25}")) ++
      (1 to 25).map(i => ("b", s"tok${i % 7}"))
    val b2 = (1 to 30).map(i => ("a", s"vnew${i % 9}")) ++
      (1 to 12).map(i => ("c", s"tok${i % 5}")) // group NEW to the stream
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cmjs_out")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // batch twin on the SAME delivered rows: frozen cells vs the cm
    // sketch of b1++b2, through the identical cell-JS arithmetic —
    // stream-driven groups only (the documented contract: 'gone' has
    // no arrivals, so no row yet)
    val delivered = (b1 ++ b2).toDF("grp", "item")
      .groupBy("grp")
      .agg(graft.functions.CountMinSketchAgg
        .cm(col("item"), lit(1L), d, w).as("cells_n"))
      .withColumn("cells_o",
        coalesce(element_at(typedLit(frozen), col("grp")),
          expr(s"array_repeat(0L, ${d * w})")))
    val batch = graft.operators.TextStats
      .cmJsFromCells(delivered, "grp", d, w)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == batch,
      s"stream readout must equal the batch face on delivered data: $got vs $batch")
    assert(got.keySet == Set("a", "b", "c"), "stream-driven groups only")
    // 'c' diffs against the all-zero sketch: the one-KL-term boundary,
    // exactly 0.5*ln(2) in picos (every bucket one-sided)
    assert(got("c")._1 == 0L && got("c")._2 == 12L)
    // per-bucket pico rounding can drift the sum a few picos off the
    // closed form (5 occupied buckets, each rounds within ±0.5 pico)
    assert(math.abs(got("c")._3 - 0.5 * math.log(2.0) * 1e12) <= 5,
      "a stream-only group must surface at the half-ln-2 boundary")
    // 'b' streamed the same distribution as its frozen reference:
    // identical cells, zero divergence
    assert(got("b")._3 == 0L, "identical distributions must read 0")
  }

  test("sessionStep timeout branch flushes the open session and evicts state") {
    import org.apache.spark.sql.streaming.TestGroupState
    val open = Streaming.SessionState(start = 1000L, lastSeen = 2000L,
      nEvents = 3L, total = 7.5)
    val state = TestGroupState.create[Streaming.SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(open),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 10000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out = Streaming.sessionStep(gapMs = 1000L, armTimeout = true)(
      1L, Iterator.empty, state).toSeq
    assert(out.map(s => (s.user_id, s.n_events, s.total)) == Seq((1L, 3L, 7.5)))
    assert(state.isRemoved, "idle user's state must be evicted")
  }

  test("wauStream: sliding-window HLL estimates track exact trailing WAU") {
    implicit val sqlCtx = spark.sqlContext
    val day = 24 * 3600L * 1000
    val t0 = 1700000000000L - (1700000000000L % day) // midnight-aligned
    // 5 users across 10 days with revisits and an interior gap day
    val fixture = for {
      (u, ds) <- Seq(1L -> Seq(0, 1, 8), 2L -> Seq(0, 4), 3L -> Seq(1, 9),
        4L -> Seq(4), 5L -> Seq(8, 9))
      dd <- ds
    } yield Event(u, new Timestamp(t0 + dd * day + 3600 * 1000), "view", 1.0)
    val stream = MemoryStream[Event]
    stream.addData(fixture: _*)
    val q = Streaming.wauStream(stream.toDF())
      .writeStream.format("memory").queryName("wau_out")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("wau_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact trailing-7-day WAU per day, scala-side
    val byDay = fixture.groupBy(e =>
      ((e.ts.getTime - t0) / day).toInt).view.mapValues(_.map(_.user_id).toSet)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    for (d <- 0 to 9) {
      val exact = (math.max(0, d - 6) to d).flatMap(x =>
        byDay.getOrElse(x, Set.empty)).toSet.size.toLong
      val key = fmt.format(new java.util.Date(t0 + d * day))
      if (exact > 0) {
        val est = got.getOrElse(key, fail(s"stream missing day $key: $got"))
        assert(math.abs(est - exact) <= math.max(1L, math.ceil(4 * 0.02 * exact).toLong),
          s"day $key: est $est vs exact $exact")
      }
    }
    // the interior gap day (d=2: no events, but d0/d1 users in horizon)
    val gapKey = fmt.format(new java.util.Date(t0 + 2 * day))
    assert(got.contains(gapKey),
      "a zero-event day inside the horizon must still report a window")
  }

  test("wauStream Append mode: closed windows emit ONCE and their state evicts") {
    // the production contract the scaladoc pins (Streaming.scala):
    // Append + watermark = each sliding window's HLL registers leave
    // the state store once the watermark passes its end — state is
    // bounded by OPEN windows, not windows-ever-opened. The r14
    // verdict flagged this as documented-but-untested.
    implicit val sqlCtx = spark.sqlContext
    val day = 24 * 3600L * 1000
    val t0 = 1700000000000L - (1700000000000L % day)
    def e(u: Long, d: Int) =
      Event(u, new Timestamp(t0 + d * day + 3600 * 1000), "view", 1.0)
    val stream = MemoryStream[Event]
    val q = Streaming.wauStream(stream.toDF(), watermark = Some("0 seconds"))
      .writeStream.format("memory").queryName("wau_append_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(e(1, 0), e(2, 0), e(3, 1))
      q.processAllAvailable()
      // the batch-1 watermark (day 1, zero delay) closes ONLY the key-0
      // window (its end is exactly day 1); keys 1..7 must still be open
      assert(spark.table("wau_append_out").count() <= 1,
        "Append must hold windows open until the watermark closes them")
      // day-20 event pushes the watermark past every day-0/1 window end
      stream.addData(e(9, 20))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("wau_append_out").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // exactly-once: one row per closed window, no re-emission
    assert(rows.map(_._1).distinct.length == rows.length,
      s"closed windows must emit once: ${rows.toSeq.sorted}")
    // day-0/1 events populate sliding windows with day keys 0..7; the
    // day-20 windows (keys 20..26) are still open and must NOT emit
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    def key(d: Int) = fmt.format(new java.util.Date(t0 + d * day))
    assert(rows.map(_._1).toSet == (0 to 7).map(key).toSet, rows.toSeq.sorted)
    // HLL at this cardinality is exact: key0 = {1,2}, 1..6 = {1,2,3}, 7 = {3}
    val byKey = rows.toMap
    assert(byKey(key(0)) == 2 && byKey(key(7)) == 1)
    assert((1 to 6).forall(d => byKey(key(d)) == 3))
    // eviction proof: only the 7 windows covering the day-20 event may
    // remain in the store; without eviction the 16 day-0/1 windows
    // would still be there too
    val stateRows = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsTotal).lastOption.getOrElse(Long.MaxValue)
    assert(stateRows <= 8,
      s"watermark must drain closed windows from the store, held $stateRows")
  }

  test("attributionStream: cross-batch last-click state matches the batch rollup") {
    implicit val sqlCtx = spark.sqlContext
    val H = 3600L * 1000
    val t0 = 1700000000000L
    var nextEid = 0L
    def e(u: Long, t: String, off: Long) = {
      nextEid += 1
      Event(u, new Timestamp(t0 + off), t, 1.0, event_id = nextEid)
    }
    // u1: click then purchase inside 24h (attributed), later purchase
    // 30h after the SECOND click... u2: purchase with no click ever;
    // u3: click in batch 1, purchase in batch 2 within window (the
    // cross-batch state case); u3's second purchase outside 24h
    val b1 = Seq(e(1, "click", 0), e(1, "purchase", 2 * H),
      e(2, "purchase", 1 * H), e(3, "click", 3 * H))
    val b2 = Seq(e(1, "click", 5 * H), e(1, "purchase", 40 * H),
      e(3, "purchase", 20 * H), e(3, "purchase", 40 * H))
    val stream = MemoryStream[Event]
    val q = Streaming.attributionStream(stream.toDS(),
        clickType = "click", convType = "purchase",
        windowUs = 24 * H * 1000L, evictMs = 24 * H,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("attr_out").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("ts").getTime - t0, r.getAs[Boolean]("attributed")))
      .toSet
    assert(hits == Set((1L, 2 * H, true), (1L, 40 * H, false),
      (2L, 1 * H, false), (3L, 20 * H, true), (3L, 40 * H, false)),
      s"per-conversion verdicts: $hits")
    // batch twin: q141's per-day rollup over the same rows must agree
    val dir = java.nio.file.Files.createTempDirectory("attr_stream").toString
    (b1 ++ b2).toDF()
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = QueriesStream.q141Attribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val streamRollup = spark.table("attr_out").collect()
      .map(r => (new java.text.SimpleDateFormat("yyyy-MM-dd") {
        setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      }.format(r.getAs[Timestamp]("ts")),
        r.getAs[Boolean]("attributed")))
      .groupBy(_._1).map { case (day, xs) =>
        (day, xs.length.toLong, xs.count(_._2).toLong) }.toSet
    assert(streamRollup == batch,
      s"stream rollup $streamRollup must equal batch $batch")
  }

  test("attributionStream: same-microsecond ties break by event_id, matching q141") {
    // the r15 advice's remaining caveat, now a contract: a click and a
    // conversion on the SAME microsecond resolve by event_id in both
    // faces — u1's click precedes its purchase (attributed), u2's
    // purchase precedes its click (not attributed). Delivered in
    // REVERSED arrival order so only the (micros, event_id) sort — not
    // arrival luck — can produce the verdicts.
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val T = new Timestamp(t0)
    val evs = Seq(
      Event(1L, T, "click", 1.0, event_id = 10),
      Event(1L, T, "purchase", 1.0, event_id = 11),
      Event(2L, T, "purchase", 1.0, event_id = 20),
      Event(2L, T, "click", 1.0, event_id = 21))
    val stream = MemoryStream[Event]
    val q = Streaming.attributionStream(stream.toDS(),
        clickType = "click", convType = "purchase",
        windowUs = 1000000L, evictMs = 60000L,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("attr_tie")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(evs.reverse: _*)
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.table("attr_tie").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Boolean]("attributed"))
      .toMap
    assert(verdicts == Map(1L -> true, 2L -> false), verdicts.toString)
    // and q141 over the same rows agrees: 2 purchases, 1 attributed
    val dir = java.nio.file.Files.createTempDirectory("attr_tie").toString
    evs.toDF().selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = QueriesStream.q141Attribution(spark, dir).collect()
    assert(batch.length == 1 &&
      batch(0).getLong(1) == 2L && batch(0).getLong(2) == 1L,
      batch.mkString(";"))
  }

  test("funnelStream: cross-batch anchors + re-delivery match the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    val H = 3600L * 1000
    val t0 = 1700000000000L
    def e(u: Long, t: String, off: Long) =
      Event(u, new Timestamp(t0 + off), t, 1.0)
    // u1 full funnel across batches; u2's click precedes their first
    // view (stage 1 only); u3's click lands outside the 24h window
    val b1 = Seq(e(1, "view", 0), e(1, "click", 2 * H),
      e(2, "click", 0), e(3, "view", 0))
    val b2 = Seq(e(1, "purchase", 4 * H), e(1, "view", 0), // re-delivery
      e(2, "view", 1 * H), e(3, "click", 30 * H), e(3, "purchase", 31 * H))
    val stream = MemoryStream[Event]
    val q = Streaming.funnelStream(stream.toDS(),
        stages = Seq("view", "click", "purchase"),
        windowMs = 24 * H, evictMs = 24 * H,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("funnel_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("stage")))
    assert(hits.length == hits.distinct.length,
      "a stage must anchor (and emit) at most once per user")
    val byStage = hits.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // batch twin over the same rows
    val dir = java.nio.file.Files.createTempDirectory("funnel_stream").toString
    (b1 ++ b2).toDF()
      .selectExpr("monotonically_increasing_id() AS event_id", "ts",
        "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = QueriesStream.q123Funnel(spark, dir).head()
    assert(byStage("view").size.toLong == batch.getLong(0), "n_view")
    assert(byStage.getOrElse("click", Set.empty).size.toLong ==
      batch.getLong(1), "n_view_click")
    assert(byStage.getOrElse("purchase", Set.empty).size.toLong ==
      batch.getLong(2), "n_full_funnel")
    assert(byStage("view") == Set(1L, 2L, 3L) &&
      byStage("click") == Set(1L) && byStage("purchase") == Set(1L))
  }

  test("funnelStep timeout branch evicts the idle user's anchors") {
    import org.apache.spark.sql.streaming.TestGroupState
    val state = TestGroupState.create[Streaming.FunnelState](
      optionalState = org.apache.spark.api.java.Optional.of(
        Streaming.FunnelState(Seq(1000L, -1L, -1L))),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 10000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out = Streaming.funnelStep(Seq("view", "click", "purchase"),
      windowMs = 1000L, armTimeout = true, evictMs = 1000L)(
      1L, Iterator.empty, state).toSeq
    assert(out.isEmpty, "eviction emits nothing — anchors are not sessions")
    assert(state.isRemoved, "idle user's anchor state must be evicted")
  }

  test("nearDupPairsStream matches the batch anchor-star; re-delivery adds nothing") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    def doc(id: Long, text: String, offSec: Int) =
      StreamingSpec.Doc(id, text, new java.sql.Timestamp(t0 + offSec * 1000L))
    // 1, 2, 4 share the same text (all bands collide); 3 is unrelated
    val d1 = doc(1, "a b c d e f g h", 0)
    val d2 = doc(2, "a b c d e f g h", 1)
    val d3 = doc(3, "totally different words live here", 2)
    val d4 = doc(4, "a b c d e f g h", 60)
    val stream = MemoryStream[StreamingSpec.Doc]
    val q = Streaming.nearDupPairsStream(stream.toDF(), "text", "doc_id", "ts",
        watermark = "10 minutes", k = 2, numHashes = 4, bands = 2, rowsPerBand = 2,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(d1, d2, d3)
      q.processAllAvailable()
      // second micro-batch: a new member of the cluster + re-delivery of
      // the ANCHOR (absorbed statefully — must emit nothing new for it)
      stream.addData(d4, d1)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("neardup_out")
      .select("a", "b").distinct().as[(Long, Long)].collect().toSet
    assert(streamed == Set((1L, 2L), (1L, 4L)), streamed.toString)
    // ids arrived in ascending order, so the stream must equal the batch
    // anchor-star over the same four docs
    val batch = Streaming.bucketAnchorPairsBatch(
        Seq(d1, d2, d3, d4).toDF(), "text", "doc_id",
        k = 2, numHashes = 4, bands = 2, rowsPerBand = 2)
      .select("a", "b").distinct().as[(Long, Long)].collect().toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("decontaminateStream drops contaminated docs under readStream; batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val t0 = 1700000000000L
    def doc(id: Long, text: String, offSec: Int) =
      StreamingSpec.Doc(id, text, new java.sql.Timestamp(t0 + offSec * 1000L))
    val d1 = doc(1, "prefix quick brown fox jumps over inner suffix", 0) // 5-gram hit
    val d2 = doc(2, "quick brown fox only three shared", 1)              // no 5-gram
    val d3 = doc(3, "completely unrelated text entirely", 2)
    val stream = MemoryStream[StreamingSpec.Doc]
    stream.addData(d1, d2, d3)
    val q = Streaming.decontaminateStream(stream.toDF(), "text", evalDocs, k = 5)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("decon_out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), kept.toString)
    // batch twin flags exactly the complement
    val flagged = graft.operators.Dedup.contaminatedIds(
        Seq(d1, d2, d3).toDF(), evalDocs, "text", "doc_id", k = 5,
        mode = graft.operators.TextStats.HashMode.EngineXx)
      .as[Long].collect().toSet
    assert(flagged == Set(1L))
  }

  test("bloomRouteStream: definite-clean never false, suspects cover all hits") {
    implicit val sqlCtx = spark.sqlContext
    val mode = graft.operators.TextStats.HashMode.EngineXx
    val evalDocs = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val evalSh = evalDocs.select(
      org.apache.spark.sql.functions.explode(
        graft.operators.Dedup.hashedWordShingles("text", 5, mode)).as("h"))
      .distinct()
    val (bits, mBits) = graft.operators.Dedup.bloomBits(evalSh, "h", 7)
    val t0 = 1700000000000L
    def doc(id: Long, text: String, offSec: Int) =
      StreamingSpec.Doc(id, text, new java.sql.Timestamp(t0 + offSec * 1000L))
    val docs = Seq(
      doc(1, "prefix quick brown fox jumps over inner suffix", 0), // true hit
      doc(2, "quick brown fox only three shared", 1),
      doc(3, "completely unrelated text entirely", 2))
    val stream = MemoryStream[StreamingSpec.Doc]
    stream.addData(docs.take(1): _*)
    val q = Streaming.bloomRouteStream(stream.toDF(), "text", 5,
        bits, mBits, 7, mode)
      .writeStream.format("memory").queryName("bloom_route_out")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      stream.addData(docs.drop(1): _*)
      q.processAllAvailable()
    } finally q.stop()
    val routed = spark.table("bloom_route_out")
      .select("doc_id", "maybe_contaminated").as[(Long, Boolean)]
      .collect().toMap
    assert(routed.keySet == Set(1L, 2L, 3L))
    // no false negatives: every true contamination must be a suspect
    val truly = graft.operators.Dedup.contaminatedIds(
        docs.toDF(), evalDocs, "text", "doc_id", k = 5, mode = mode)
      .as[Long].collect().toSet
    assert(truly.forall(routed(_)),
      "a truly contaminated doc routed definite-clean breaks the contract")
    // and the batch face of the same projection agrees exactly
    val batch = Streaming.bloomRouteStream(docs.toDF(), "text", 5,
        bits, mBits, 7, mode)
      .select("doc_id", "maybe_contaminated").as[(Long, Boolean)]
      .collect().toMap
    assert(batch == routed, "stream must equal the batch projection")
  }

  test("nearDupStep timeout branch evicts the bucket anchor") {
    import org.apache.spark.sql.streaming.TestGroupState
    val state = TestGroupState.create[Streaming.AnchorState](
      optionalState = org.apache.spark.api.java.Optional.of(
        Streaming.AnchorState(7L, 1000L)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 10000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(9000L),
      hasTimedOut = true)
    val out = Streaming.nearDupStep(horizonMs = 1000L, armTimeout = true)(
      (0, "bkt"), Iterator.empty, state).toSeq
    assert(out.isEmpty)
    assert(state.isRemoved, "idle bucket's anchor must be evicted")
  }

  test("pqEncodeStream code rows match the batch index build across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(29)
    val rows = (0 until 30).map(i =>
      StreamingSpec.Vec(i.toLong, Seq.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val batchDf = rows.toDF()
    val cb = graft.operators.Pq.learnCodebooks(
      batchDf, "vec_id", "embedding", m = 2, k = 2, iters = 2)
    val stream = MemoryStream[StreamingSpec.Vec]
    val q = Streaming.pqEncodeStream(stream.toDF(), "vec_id", "embedding", cb)
      .writeStream.format("memory").queryName("pq_codes_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows.take(15): _*)
      q.processAllAvailable()
      stream.addData(rows.drop(15): _*) // late corpus rows append codes
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getInt(1), r.getInt(2))
    val streamed = spark.table("pq_codes_out").collect().map(key)
    val batch = graft.operators.Pq.codeRows(batchDf, "vec_id", "embedding", cb)
      .collect().map(key)
    assert(streamed.length == 60, "30 vectors x m=2 code rows")
    assert(streamed.toSet == batch.toSet,
      "streamed codes must equal the batch window-path index build")
  }

  test("sqEncodeStream codes match the batch SQ8 encode across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val rows = (0 until 30).map(i =>
      StreamingSpec.Vec(i.toLong, Seq.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val batchDf = rows.toDF()
    val r = graft.operators.Sq.learnRanges(batchDf, "embedding")
    val stream = MemoryStream[StreamingSpec.Vec]
    val q = Streaming.sqEncodeStream(stream.toDF(), "vec_id", "embedding", r)
      .writeStream.format("memory").queryName("sq_codes_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows.take(10): _*)
      q.processAllAvailable()
      stream.addData(rows.drop(10): _*)
      q.processAllAvailable()
    } finally q.stop()
    def key(row: org.apache.spark.sql.Row) =
      (row.getLong(0), row.getSeq[Int](1))
    val streamed = spark.table("sq_codes_out").collect().map(key)
    val batch = batchDf.select(col("vec_id").as("id"),
        graft.operators.Sq.encodeCodes(col("embedding"), r).as("codes"))
      .collect().map(key)
    assert(streamed.length == 30)
    assert(streamed.toSet == batch.toSet,
      "streamed SQ8 codes must equal the batch encode")
  }

  test("ivfAssignStream list assignment matches the batch path across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(47)
    val rows = (0 until 30).map(i =>
      StreamingSpec.Vec(i.toLong, Seq.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val batchDf = rows.toDF()
    // frozen coarse quantizer: 4 centroids with non-contiguous ids
    val cents = Seq(
      (3, Array(0.5, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (7, Array(-0.5, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (11, Array(0.0, -0.5, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (19, Array(0.0, 0.0, -0.5, -0.5, 0.0, 0.0, 0.0, 0.0)))
    val stream = MemoryStream[StreamingSpec.Vec]
    val q = Streaming.ivfAssignStream(stream.toDF(), "vec_id", "embedding", cents)
      .writeStream.format("memory").queryName("ivf_assign_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows.take(10): _*)
      q.processAllAvailable()
      stream.addData(rows.drop(10): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ivf_assign_out").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val batch = graft.operators.Similarity
      .assignClusters(batchDf, cents, "vec_id", "embedding")
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(streamed.length == 30)
    assert(streamed.toSet == batch.toSet,
      "streamed IVF list assignment must equal the batch path")
    // caller cids survive (non-contiguous centroid ids keep labels)
    assert(streamed.map(_._2).toSet.subsetOf(Set(3, 7, 11, 19)))
  }

  test("sessionize (flatMapGroupsWithState) matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(evts: _*)
    val q = Streaming.sessionize(stream.toDS(), gapMs = 30 * 60 * 1000L,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    // only CLOSED sessions emit: user 1's first session closed by the 60m event
    val emitted = spark.table("sessions_out").collect()
    assert(emitted.length == 1)
    val s = emitted(0)
    assert(s.getAs[Long]("user_id") == 1L)
    assert(s.getAs[Long]("n_events") == 2L)
    assert(s.getAs[Double]("total") == 3.0)
    // batch twin sees all three sessions (it has no notion of "open")
    val batch = Streaming.sessionizeBatch(evts.toDF(), 30 * 60 * 1000L)
      .orderBy("user_id", "session_start").collect()
    assert(batch.length == 3)
    assert(batch.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L, 1L))
  }

  test("intervalJoinStream (stream-stream) matches the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingSpec.Stamped
    // purchases at t0/t45/t200; clicks land 0..60m after some of them
    val purchases = Seq(
      Stamped(100L, 1L, ts(0)), Stamped(101L, 1L, ts(45)),
      Stamped(102L, 2L, ts(200)))
    val clicks = Seq(
      Stamped(900L, 1L, ts(30)),   // within 1h of p100 AND p101? p101 is at 45 — no (before it)
      Stamped(901L, 1L, ts(70)),   // within 1h of p101 (45+60=105 ≥ 70), outside p100's (0+60=60)
      Stamped(902L, 2L, ts(199)),  // before p102 — no match
      Stamped(903L, 3L, ts(10)))   // no purchase for user 3
    val ps = MemoryStream[Stamped]; ps.addData(purchases: _*)
    val cs = MemoryStream[Stamped]; cs.addData(clicks: _*)
    val joined = Streaming.intervalJoinStream(
        ps.toDF().withColumnRenamed("event_id", "p_eid"),
        cs.toDF().withColumnRenamed("event_id", "c_eid"),
        key = "user_id", leftTs = "ts", rightTs = "ts",
        maxDelta = "1 hour", leftDelay = "2 hours", rightDelay = "1 hour")
      .select(col("p_eid"), col("c_eid"))
    val q = joined.writeStream.format("memory").queryName("attrib_out")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attrib_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin over the same rows (timestamps as micros)
    val toUs = (s: Seq[Stamped], eid: String) => s.toDF()
      .select(col("user_id"), col("event_id").as(eid),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as(eid + "_us"))
    val batch = graft.operators.Joins.rangeJoin(
        toUs(purchases, "p_eid"), toUs(clicks, "c_eid"),
        "user_id", "p_eid_us", "c_eid_us", maxDeltaUs = 3600L * 1000000L)
      .select("p_eid", "c_eid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch)
    assert(got == Set((100L, 900L), (101L, 901L)))
  }

  test("semDedupVerdictStream matches the batch incremental verdict across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Similarity
    // the q119 unit fixture: anchors 1,2 (cap=2), id 3 beyond the cap,
    // cell 2 empty; batch classes dup / kept / cap-twin / no-cell / tie
    val registry = Seq(
      StreamingSpec.RegRow(1L, 1, Seq(1f, 0f, 0f)),
      StreamingSpec.RegRow(2L, 1, Seq(0f, 1f, 0f)),
      StreamingSpec.RegRow(3L, 1, Seq(0f, 0f, 1f))).toDF()
    val centroids = Seq(1 -> Array(1.0, 0.0, 0.0), 2 -> Array(-1.0, 0.0, 0.0))
    val vecs = Seq(
      StreamingSpec.Vec(100L, Seq(0.9f, 0.1f, 0f)),
      StreamingSpec.Vec(101L, Seq(0.5f, 0f, 0.87f)),
      StreamingSpec.Vec(102L, Seq(0.1f, 0f, 1f)),
      StreamingSpec.Vec(103L, Seq(-1f, 0f, 0f)),
      StreamingSpec.Vec(104L, Seq(1f, 1f, 0f)))
    val packed = Similarity.packedAnchors(
      registry, "vec_id", "embedding", maxCluster = 2)
    val stream = MemoryStream[StreamingSpec.Vec]
    val q = Streaming.semDedupVerdictStream(stream.toDF(), packed,
        centroids, "vec_id", "embedding", tau = 0.5)
      .writeStream.format("memory").queryName("semdedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(vecs.take(2): _*)
      q.processAllAvailable()
      stream.addData(vecs.drop(2): _*) // later micro-batch, same registry
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))
    val streamed = spark.table("semdedup_out").collect().map(key).toSet
    val batch = Similarity.incrementalSemanticDedup(vecs.toDF(), registry,
        centroids, "vec_id", "embedding", tau = 0.5, maxCluster = 2)
      .collect().map(key).toSet
    assert(streamed == batch,
      s"stream verdicts must equal the batch operator:\n$streamed\nvs\n$batch")
    // the fixture's intended classes actually exercised
    assert(streamed.count(!_._5) == 2, "100 and 104 drop")
    assert(streamed.exists(r => r._1 == 103L && r._4.isEmpty && r._5),
      "no-anchor cell verdicts kept with null cosine")
  }
}

object StreamingSpec {
  case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)
  case class Vec(vec_id: Long, embedding: Seq[Float])
  case class Stamped(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
  case class RegRow(vec_id: Long, cid: Int, embedding: Seq[Float])
}
