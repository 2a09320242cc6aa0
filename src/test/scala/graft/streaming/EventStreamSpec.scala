package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  /** Copy the driver fixture's events.parquet VERBATIM into a temp dir
    * and return a thunk producing a file-source stream over it, `ts`
    * normalized exactly as TableCatalog.load does. The raw-bytes copy
    * means the REAL physical ts encoding (timestamp[us]/NTZ since r8)
    * is what the file source resolves — and the r8 encoding drift is
    * why this normalization must live in exactly ONE place (guards
    * VERDICT r8 item 6 for every file-source e2e below). */
  private def fixtureStream(name: String): () => org.apache.spark.sql.DataFrame = {
    val dir = tmpDir(name)
    new java.io.File(s"$dir/in").mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/in/events.parquet"))
    val schema = spark.read.parquet(s"$dir/in").schema
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    () => {
      val df = spark.readStream.schema(schema).parquet(s"$dir/in")
      if (df.schema("ts").dataType == TimestampNTZType)
        df.withColumn("ts", col("ts").cast(TimestampType))
      else df
    }
  }

  test("windowedCounts: same code runs batch and stream, same results") {
    import spark.implicits._
    val rows = Seq(
      (ts("2026-01-01T00:10:00Z"), "click", 1L, 1.0),
      (ts("2026-01-01T05:00:00Z"), "click", 2L, 2.0),
      (ts("2026-01-02T00:00:30Z"), "view", 1L, 5.0))
    val batch = rows.toDF("ts", "event_type", "user_id", "value")
    val batchRes = EventStream.windowedCounts(batch)
      .orderBy("window_start", "event_type")
      .select("event_type", "n", "total_value")
      .as[(String, Long, Double)].collect()
    assert(batchRes === Array(("click", 2L, 3.0), ("view", 1L, 5.0)))

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "user_id", "value")
    val q = EventStream.windowedCounts(streamDf)
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("update").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamRes = spark.table("wincounts")
        .orderBy("window_start", "event_type")
        .select("event_type", "n", "total_value")
        .as[(String, Long, Double)].collect()
      assert(streamRes === batchRes)
    } finally q.stop()
  }

  test("file stream over the events table matches the batch backfill") {
    // watermarks must behave identically on the normalized column
    // regardless of the fixture's encoding generation (fixtureStream)
    val stream = fixtureStream("evstream")()
    val q = EventStream.windowedCounts(stream)
      .writeStream.format("memory").queryName("evfile")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("evfile")
        .select("window_start", "event_type", "n", "total_value")
      val batch = EventStream.windowedCounts(
          graft.catalog.TableCatalog.load(spark, "/root/testdata/sf0.001", "events"))
        .select("window_start", "event_type", "n", "total_value")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      assert(batch.count() > 0)
    } finally q.stop()
  }

  test("file stream e2e: windowed DDSketch over the real fixture matches batch on closed windows") {
    // the streaming-quantile tier driven through a TRUE file source over
    // the driver fixture's raw bytes, not just MemoryStream: append mode
    // emits exactly the batch cells for every window the final watermark
    // provably closed
    val stream = fixtureStream("evstream_dd")()
    val q = EventStream.windowedDdBuckets(stream)
      .writeStream.format("memory").queryName("evfile_dd")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("evfile_dd")
        .select("window_start", "bucket", "cnt")
      val batchEv = graft.catalog.TableCatalog.load(
        spark, "/root/testdata/sf0.001", "events")
      val batch = EventStream.windowedDdBuckets(batchEv)
        .select("window_start", "bucket", "cnt")
      // a 1-day window closes once watermark (= max ts − 1 h) passes its
      // end: window_start ≤ maxTs − 1 day − 1 h
      val maxTs = batchEv.agg(max(col("ts"))).head.getTimestamp(0)
      val closeBefore =
        new java.sql.Timestamp(maxTs.getTime - 3600000L - 86400000L)
      val closedBatch = batch.filter(col("window_start") <= closeBefore)
      assert(closedBatch.count() > 0)
      assert(closedBatch.exceptAll(streamed).isEmpty,
        "every provably-closed batch bucket must be emitted by the stream")
      assert(streamed.exceptAll(batch).isEmpty,
        "the stream must not emit any cell the batch sketch does not have")
    } finally q.stop()
  }

  test("file stream e2e: watermarked sessionization over the real fixture matches batch") {
    // VERDICT r9 item 6: drive the EVENT-TIME stateful transforms through
    // a true file source over the driver fixture's raw bytes (real
    // physical ts encoding), not just MemoryStream. Streaming emits every
    // straddle-closed session the batch run emits, PLUS sessions the
    // final watermark provably closed — each extra must satisfy
    // last_ts + gap <= watermark.
    import spark.implicits._
    import EventStream.{ClosedSession, Event}
    val stream = fixtureStream("evstream_sess")()
    def toEvents(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("ts"), col("value")).as[Event]
    val batchEv = graft.catalog.TableCatalog.load(
      spark, "/root/testdata/sf0.001", "events")
    val q = EventStream.sessionizeEventTime(toEvents(stream))
      .writeStream.format("memory").queryName("evfile_sess")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val cols = Seq("user_id", "n_events", "total", "session_start", "session_end")
      val streamed = spark.table("evfile_sess").select(cols.head, cols.tail: _*)
      val batchClosed = EventStream.sessionizeEventTime(toEvents(batchEv))
        .toDF().select(cols.head, cols.tail: _*)
      assert(batchClosed.count() > 0)
      assert(batchClosed.exceptAll(streamed).isEmpty,
        "every straddle-closed batch session must be emitted by the stream")
      // every extra streamed session was provably closed by the final
      // watermark (max event time - 1 hour)
      val wmMicros = batchEv.agg(max(unix_micros(col("ts")))).head.getLong(0) -
        3600000000L
      val extras = streamed.exceptAll(batchClosed)
        .select(unix_micros(col("session_end")).as("endUs"))
        .as[Long].collect()
      assert(extras.forall(_ + 3600000000L <= wmMicros),
        "stream must only add sessions the watermark proved closed")
    } finally q.stop()
  }

  test("file stream e2e: stream-stream interval join over the real fixture matches batch") {
    val src = fixtureStream("evstream_ij")
    val batchEv = graft.catalog.TableCatalog.load(
      spark, "/root/testdata/sf0.001", "events")
    val q = EventStream.intervalJoin(
        src().filter(col("event_type") === "purchase"),
        src().filter(col("event_type") === "click"))
      .writeStream.format("memory").queryName("evfile_ij")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("evfile_ij")
      val batch = EventStream.intervalJoin(
        batchEv.filter(col("event_type") === "purchase"),
        batchEv.filter(col("event_type") === "click"))
      assert(batch.count() > 0)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "inner interval join must emit exactly the batch result")
    } finally q.stop()
  }

  test("windowedCmsCells: stream (append, watermark-closed windows) matches the batch sketch") {
    import spark.implicits._
    val rows = Seq(
      (ts("2026-01-01T00:10:00Z"), 1L), (ts("2026-01-01T00:20:00Z"), 1L),
      (ts("2026-01-01T01:00:00Z"), 2L), (ts("2026-01-01T05:00:00Z"), 1L))
    val batch = EventStream.windowedCmsCells(
        rows.toDF("ts", "user_id"), width = 64, depth = 3)
      .select("window_start", "row_idx", "bucket", "cnt")
    // per-window cell mass = depth × window events (each event lands in
    // exactly one bucket per row)
    val mass = batch.filter(col("window_start") === ts("2026-01-01T00:00:00Z"))
      .agg(sum("cnt")).head.getLong(0)
    assert(mass === 3L * 4) // 4 events on day one × depth 3... per-row: 3 rows × 4 events
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val q = EventStream.windowedCmsCells(
        mem.toDF.toDF("ts", "user_id"), width = 64, depth = 3)
      .writeStream.format("memory").queryName("cms_win")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // advance the watermark far past the first day so its windows close
      mem.addData((ts("2026-01-03T00:00:00Z"), 9L))
      q.processAllAvailable()
      q.processAllAvailable()
      val streamed = spark.table("cms_win")
        .select("window_start", "row_idx", "bucket", "cnt")
      val closedBatch = batch.filter(col("window_start") < ts("2026-01-02T00:00:00Z"))
      assert(closedBatch.exceptAll(streamed).isEmpty,
        "every closed-window batch cell must be emitted by the stream")
      assert(closedBatch.count() > 0)
    } finally q.stop()
  }

  test("windowedDdBuckets: stream (append, watermark-closed windows) matches the batch sketch") {
    import spark.implicits._
    val rows = Seq(
      (ts("2026-01-01T00:10:00Z"), 1.5), (ts("2026-01-01T00:20:00Z"), 1.5),
      (ts("2026-01-01T01:00:00Z"), 250.0), (ts("2026-01-01T05:00:00Z"), 0.02),
      (ts("2026-01-01T06:00:00Z"), 0.0)) // non-positive: excluded
    val batch = EventStream.windowedDdBuckets(rows.toDF("ts", "value"))
      .select("window_start", "bucket", "cnt")
    // day one: 4 positive values in 3 distinct buckets (the 1.5 pair
    // shares one), the zero row contributes nothing
    val day1 = batch.filter(col("window_start") === ts("2026-01-01T00:00:00Z"))
    assert(day1.count() === 3)
    assert(day1.agg(sum("cnt")).head.getLong(0) === 4L)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = EventStream.windowedDdBuckets(mem.toDF.toDF("ts", "value"))
      .writeStream.format("memory").queryName("dd_win")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // advance the watermark far past the first day so its windows close
      mem.addData((ts("2026-01-03T00:00:00Z"), 9.0))
      q.processAllAvailable()
      q.processAllAvailable()
      val streamed = spark.table("dd_win")
        .select("window_start", "bucket", "cnt")
      val closedBatch = batch.filter(col("window_start") < ts("2026-01-02T00:00:00Z"))
      assert(closedBatch.exceptAll(streamed).isEmpty,
        "every closed-window batch bucket must be emitted by the stream")
      assert(closedBatch.count() > 0)
    } finally q.stop()
  }

  test("windowedHllRegisters: stream matches batch; duplicate keys cannot move a register") {
    import spark.implicits._
    val rows = Seq(
      (ts("2026-01-01T00:10:00Z"), 1L), (ts("2026-01-01T00:20:00Z"), 1L),
      (ts("2026-01-01T01:00:00Z"), 2L), (ts("2026-01-01T05:00:00Z"), 3L))
    val batch = EventStream.windowedHllRegisters(rows.toDF("ts", "user_id"))
      .select("window_start", "j", "m_j")
    // duplicates are absorbed by max: day one has 3 DISTINCT users -> at
    // most 3 register rows, and re-sending user 1 changes nothing
    val day1 = batch.filter(col("window_start") === ts("2026-01-01T00:00:00Z"))
    assert(day1.count() <= 3)
    val withDup = EventStream.windowedHllRegisters(
        (rows :+ ((ts("2026-01-01T07:00:00Z"), 1L))).toDF("ts", "user_id"))
      .select("window_start", "j", "m_j")
    assert(batch.exceptAll(withDup).isEmpty && withDup.exceptAll(batch).isEmpty)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val q = EventStream.windowedHllRegisters(mem.toDF.toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("hll_win")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((ts("2026-01-03T00:00:00Z"), 9L))
      q.processAllAvailable()
      q.processAllAvailable()
      val streamed = spark.table("hll_win").select("window_start", "j", "m_j")
      val closedBatch = batch.filter(col("window_start") < ts("2026-01-02T00:00:00Z"))
      assert(closedBatch.exceptAll(streamed).isEmpty,
        "every closed-window batch register must be emitted by the stream")
      assert(closedBatch.count() > 0)
    } finally q.stop()
  }

  test("dedupStream drops redelivered event ids within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF.toDF("event_id", "ts", "payload")
    val q = EventStream.dedupStream(df)
      .writeStream.format("memory").queryName("dedup_ev")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2026-01-01T00:00:00Z"), "a"),
        (1L, ts("2026-01-01T00:00:01Z"), "a-redelivered"),
        (2L, ts("2026-01-01T00:00:02Z"), "b"))
      q.processAllAvailable()
      mem.addData((2L, ts("2026-01-01T00:10:00Z"), "b-redelivered"))
      q.processAllAvailable()
      val ids = spark.table("dedup_ev").select("event_id").as[Long].collect().sorted
      assert(ids === Array(1L, 2L))
    } finally q.stop()
  }

  test("intervalJoin: stream-stream join matches the batch backfill") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val pRows = Seq(
      (10L, 1L, ts("2026-01-01T01:00:00Z")),
      (11L, 2L, ts("2026-01-01T02:00:00Z")))
    val cRows = Seq(
      (20L, 1L, ts("2026-01-01T00:30:00Z")), // within 1h of purchase 10
      (21L, 1L, ts("2025-12-31T23:50:00Z")), // outside lookback — hits watermark-bounded state
      (22L, 2L, ts("2026-01-01T01:59:00Z")), // within 1h of purchase 11
      (23L, 2L, ts("2026-01-01T02:30:00Z"))) // after the purchase — excluded
    val pBatch = pRows.toDF("event_id", "user_id", "ts")
    val cBatch = cRows.toDF("event_id", "user_id", "ts")
    val batchRes = EventStream.intervalJoin(pBatch, cBatch)
      .select("p_event_id", "c_event_id").as[(Long, Long)].collect().sorted
    assert(batchRes === Array((10L, 20L), (11L, 22L)))

    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStream.intervalJoin(
        pMem.toDF.toDF("event_id", "user_id", "ts"),
        cMem.toDF.toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("ivjoin")
      .outputMode("append").start()
    try {
      pMem.addData(pRows: _*)
      cMem.addData(cRows: _*)
      q.processAllAvailable()
      val streamRes = spark.table("ivjoin")
        .select("p_event_id", "c_event_id").as[(Long, Long)].collect().sorted
      assert(streamRes === batchRes)
    } finally q.stop()
  }

  test("intervalJoin left_outer: unattributed purchase emits nulls after the watermark passes") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val pMem = MemoryStream[(Long, Long, Timestamp)]
    val cMem = MemoryStream[(Long, Long, Timestamp)]
    val q = EventStream.intervalJoin(
        pMem.toDF.toDF("event_id", "user_id", "ts"),
        cMem.toDF.toDF("event_id", "user_id", "ts"),
        joinType = "left_outer")
      .writeStream.format("memory").queryName("ivjoin_outer")
      .outputMode("append").start()
    try {
      // purchase with NO click; engine cannot emit the null row until
      // the watermark proves no in-range click can still arrive
      pMem.addData((10L, 1L, ts("2026-01-01T01:00:00Z")))
      cMem.addData((20L, 2L, ts("2026-01-01T01:00:00Z"))) // other user
      q.processAllAvailable()
      // advance event time on BOTH streams well past p_ts + lookback
      pMem.addData((11L, 1L, ts("2026-01-01T09:00:00Z")))
      cMem.addData((21L, 2L, ts("2026-01-01T09:00:00Z")))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("ivjoin_outer")
        .select("p_event_id", "c_event_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      assert(rows.contains((10L, None))) // the watermark-gated null emission
    } finally q.stop()
  }

  test("sessionizeEventTime: sessions close on in-batch gap straddle AND on watermark timeout") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeEventTime(mem.toDS())
      .writeStream.format("memory").queryName("et_sessions")
      .outputMode("append").start()
    try {
      // session 1 for user 1: two events 10s apart
      mem.addData(
        EventStream.Event(1L, ts("2026-01-01T00:00:00Z"), 1.0),
        EventStream.Event(1L, ts("2026-01-01T00:00:10Z"), 2.0))
      q.processAllAvailable()
      assert(spark.table("et_sessions").isEmpty) // still open — nothing emitted
      // an event > 1h later straddles the gap in-handler: session 1 closes
      mem.addData(EventStream.Event(1L, ts("2026-01-01T03:00:00Z"), 5.0))
      q.processAllAvailable()
      val closed1 = spark.table("et_sessions").as[EventStream.ClosedSession].collect()
      assert(closed1.length === 1)
      assert(closed1.head.n_events === 2L && closed1.head.total === 3.0)
      assert(closed1.head.session_end === ts("2026-01-01T00:00:10Z"))
      // advance the watermark past 03:00 + gap via another user's event:
      // wm = 05:30 - 1h = 04:30 > 04:00 → user 1's open session times out
      mem.addData(EventStream.Event(2L, ts("2026-01-01T05:30:00Z"), 9.0))
      q.processAllAvailable()
      mem.addData(EventStream.Event(2L, ts("2026-01-01T05:30:01Z"), 1.0))
      q.processAllAvailable()
      val closed2 = spark.table("et_sessions").as[EventStream.ClosedSession].collect()
      assert(closed2.exists(s => s.user_id === 1L && s.n_events === 1L && s.total === 5.0))
    } finally q.stop()
  }

  test("sessionize: flatMapGroupsWithState accumulates per user") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(
        EventStream.Event(1L, ts("2026-01-01T00:00:00Z"), 1.0),
        EventStream.Event(1L, ts("2026-01-01T00:00:10Z"), 2.0),
        EventStream.Event(2L, ts("2026-01-01T00:00:20Z"), 7.0))
      q.processAllAvailable()
      val byUser = spark.table("sessions").as[EventStream.Session]
        .collect().groupBy(_.user_id)
      assert(byUser(1L).map(_.n_events).max === 2L)
      assert(byUser(1L).map(_.total).max === 3.0)
      assert(byUser(2L).map(_.total).max === 7.0)
    } finally q.stop()
  }

  test("watermark drops late data: an event older than the watermark never surfaces") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "user_id", "value")
    // 10-minute windows, 10-minute watermark, APPEND mode: a window only
    // emits once the watermark passes its end, and later rows below the
    // watermark must be discarded — the state-bounding contract that
    // keeps a 100 TB/day stream's store finite.
    val q = EventStream.windowedCounts(streamDf,
        windowLen = "10 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      mem.addData((ts("2026-01-01T00:01:00Z"), "click", 1L, 1.0))
      q.processAllAvailable()
      // advance event time far past 00:10 + watermark -> first window closes
      mem.addData((ts("2026-01-01T01:00:00Z"), "click", 1L, 1.0))
      q.processAllAvailable()
      val closed = spark.table("late_drop")
        .filter(col("window_start") === ts("2026-01-01T00:00:00Z"))
        .select("n").as[Long].collect()
      assert(closed === Array(1L))
      // a late event inside the CLOSED window (far below the watermark)
      mem.addData((ts("2026-01-01T00:02:00Z"), "click", 1L, 99.0))
      q.processAllAvailable()
      val after = spark.table("late_drop")
        .filter(col("window_start") === ts("2026-01-01T00:00:00Z"))
        .select("n").as[Long].collect()
      assert(after === Array(1L), "late row must be dropped, not re-emitted")
    } finally q.stop()
  }

  test("session_window parity precondition: no exact-gap event pair in the gate data") {
    // st_session_window's oracle (lag formulation, > gap starts new) and
    // Spark's session_window (strict <, exact-gap starts new) disagree
    // ONLY for two events exactly 1 h apart. Assert that holds for the
    // data the driver gates on, so a generator change fails HERE with an
    // explanation instead of as an opaque oracle hash mismatch.
    import org.apache.spark.sql.expressions.Window
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val ev = graft.catalog.TableCatalog.load(spark, s"/root/testdata/$sf", "events")
      val w = Window.partitionBy("user_id").orderBy("ts")
      val exact = ev
        .withColumn("gap", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("gap") === 3600000000L)
        .count()
      assert(exact === 0L,
        s"$sf has $exact exact-1h-gap event pairs; st_session_window's oracle " +
          "and session_window diverge at that boundary — re-pin the semantics")
    }
  }

  test("streamUpsert: per-micro-batch MERGE keeps the table continuously current") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val path = tmpDir("stream_upsert") + "/t"
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.streamUpsert(mem.toDF.toDF("k", "v"), path, Seq("k"))
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.read.parquet(path).as[(Long, String)].collect().sorted
        === Array((1L, "a"), (2L, "b")))
      mem.addData((1L, "a2"), (3L, "c")) // update existing key + insert new
      q.processAllAvailable()
      assert(spark.read.parquet(path).as[(Long, String)].collect().sorted
        === Array((1L, "a2"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("enrichedWindowedCounts: stream-static join matches batch, unmatched -> UNKNOWN") {
    import spark.implicits._
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val rows = Seq(
      (ts("2026-01-01T00:10:00Z"), "click", 1L, 1.0),
      (ts("2026-01-01T01:00:00Z"), "click", 2L, 2.0),
      (ts("2026-01-01T02:00:00Z"), "view", 99L, 5.0)) // no dim row
    val batch = EventStream.enrichedWindowedCounts(
        rows.toDF("ts", "event_type", "user_id", "value"), dim)
      .orderBy("segment")
      .select("segment", "n", "total_value")
      .as[(String, Long, Double)].collect()
    assert(batch === Array(("BUILDING", 1L, 1.0),
      ("MACHINERY", 1L, 2.0), ("UNKNOWN", 1L, 5.0)))

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "user_id", "value")
    val q = EventStream.enrichedWindowedCounts(streamDf, dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("update").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamRes = spark.table("enriched").orderBy("segment")
        .select("segment", "n", "total_value")
        .as[(String, Long, Double)].collect()
      assert(streamRes === batch)
    } finally q.stop()
  }

  test("hoppingWindowedCounts: each event lands in len/slide windows, stream matches batch") {
    import spark.implicits._
    val rows = Seq(
      (ts("2026-01-01T13:00:00Z"), "click", 1L, 1.0), // in [01-01 00:00, +1d) and [01-01 12:00, +1d)
      (ts("2026-01-01T03:00:00Z"), "click", 2L, 2.0),
      (ts("2026-01-02T01:00:00Z"), "view", 1L, 5.0))
    val batch = rows.toDF("ts", "event_type", "user_id", "value")
    val batchRes = EventStream.hoppingWindowedCounts(batch)
      .orderBy("window_start", "event_type")
      .select("window_start", "event_type", "n", "total_value")
    // every event appears in exactly 2 windows (1 day len / 12 h slide)
    import org.apache.spark.sql.functions.{sum => fsum}
    assert(batchRes.agg(fsum($"n")).as[Long].head() === rows.size * 2L)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long, Double)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "user_id", "value")
    val q = EventStream.hoppingWindowedCounts(streamDf)
      .writeStream.format("memory").queryName("hopwin")
      .outputMode("update").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamRes = spark.table("hopwin")
        .orderBy("window_start", "event_type")
        .select("window_start", "event_type", "n", "total_value")
      assert(streamRes.collect().toSeq === batchRes.collect().toSeq)
    } finally q.stop()
  }

  test("latestPerKey: streaming CDC keep-latest converges to the batch compaction") {
    import spark.implicits._
    import EventStream.KeyedEvent
    val rows = Seq(
      KeyedEvent(1L, "click", 10L, ts("2026-01-01T00:10:00Z"), 1.0),
      KeyedEvent(1L, "click", 11L, ts("2026-01-01T02:00:00Z"), 2.0),
      KeyedEvent(1L, "view", 12L, ts("2026-01-01T01:00:00Z"), 3.0),
      // out-of-order late arrival must NOT displace the 02:00 winner
      KeyedEvent(1L, "click", 13L, ts("2026-01-01T01:30:00Z"), 4.0),
      KeyedEvent(2L, "click", 14L, ts("2026-01-01T00:00:00Z"), 5.0))
    val batch = EventStream.latestPerKeyBatch(
        rows.toDF("user_id", "event_type", "event_id", "ts", "value"))
      .orderBy("user_id", "event_type")
      .as[KeyedEvent].collect()
    assert(batch.map(_.event_id).toSeq === Seq(11L, 12L, 14L))

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = EventStream.latestPerKey(mem.toDS())
      .writeStream.format("memory").queryName("cdclatest")
      .outputMode("update").start()
    try {
      mem.addData(rows.take(3): _*) // two micro-batches: winners must survive
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
      // Update-mode sink appends every emitted winner; the CONVERGED state
      // per key is the winner with the max event time (keep-latest state is
      // monotone in ts), so max over struct(ts, …) selects it without any
      // reliance on monotonically_increasing_id ordering across
      // micro-batches — the same fix the quota test below uses.
      val current = spark.table("cdclatest")
        .groupBy("user_id", "event_type")
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("w"))
        .select(col("user_id"), col("event_type"), col("w.event_id"),
          col("w.ts"), col("w.value"))
        .orderBy("user_id", "event_type")
        .as[KeyedEvent].collect()
      assert(current.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("quotaCounts: watermark expiry actually drops (user, hour) counters") {
    import spark.implicits._
    import EventStream.KeyedEvent
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = EventStream.quotaCounts(mem.toDS(), n = 3)
      .writeStream.format("memory").queryName("quotaexpiry")
      .outputMode("update").start()
    try {
      // 3 users x hour 10 -> 3 state rows
      mem.addData(
        KeyedEvent(1L, "view", 1L, ts("2026-01-01T10:00:00Z"), 1.0),
        KeyedEvent(2L, "view", 2L, ts("2026-01-01T10:10:00Z"), 1.0),
        KeyedEvent(3L, "view", 3L, ts("2026-01-01T10:20:00Z"), 1.0))
      q.processAllAvailable()
      def stateRows: Long = q.recentProgress
        .flatMap(p => p.stateOperators.map(_.numRowsTotal)).lastOption.getOrElse(-1L)
      assert(stateRows === 3L)
      // advance the watermark far past the end of hour 10 (wm = max - 1h)
      // -> the three hour-10 counters time out and are REMOVED; only the
      // new event's own counter remains
      mem.addData(KeyedEvent(9L, "view", 9L, ts("2026-01-01T14:00:00Z"), 1.0))
      q.processAllAvailable()
      q.processAllAvailable() // timeout fires on the no-data batch after wm advance
      assert(stateRows === 1L,
        s"expired hour counters must leave the state store, got $stateRows rows")
    } finally q.stop()
  }

  test("quotaCounts: streaming quota accounting converges to the batch aggregate") {
    import spark.implicits._
    import EventStream.{KeyedEvent, QuotaRow}
    // user 1: 5 events in hour H (2 over budget), 1 in hour H+1; user 2: 1.
    val rows = Seq(
      KeyedEvent(1L, "view", 1L, ts("2026-01-01T10:00:00Z"), 1.0),
      KeyedEvent(1L, "view", 2L, ts("2026-01-01T10:10:00Z"), 1.0),
      KeyedEvent(1L, "view", 3L, ts("2026-01-01T10:20:00Z"), 1.0),
      KeyedEvent(1L, "view", 4L, ts("2026-01-01T10:30:00Z"), 1.0),
      KeyedEvent(1L, "view", 5L, ts("2026-01-01T10:40:00Z"), 1.0),
      KeyedEvent(1L, "view", 6L, ts("2026-01-01T11:05:00Z"), 1.0),
      KeyedEvent(2L, "view", 7L, ts("2026-01-01T10:15:00Z"), 1.0))
    val batch = EventStream.quotaCountsBatch(
        rows.toDF("user_id", "event_type", "event_id", "ts", "value"), n = 3)
      .orderBy("user_id", "hr").as[QuotaRow].collect()
    assert(batch.map(r => (r.user_id, r.n_events, r.n_kept, r.n_dropped)).toSeq ===
      Seq((1L, 5L, 3L, 2L), (1L, 1L, 1L, 0L), (2L, 1L, 1L, 0L)))

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = EventStream.quotaCounts(mem.toDS(), n = 3)
      .writeStream.format("memory").queryName("quotacounts")
      .outputMode("update").start()
    try {
      mem.addData(rows.take(2): _*) // split MID-hour: the counter must carry
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      // n_events is monotone per key, so the CONVERGED row is the max of
      // (n_events, n_kept, n_dropped) — no reliance on
      // monotonically_increasing_id ordering across micro-batches, which
      // is not guaranteed and made this selection flaky
      val current = spark.table("quotacounts")
        .groupBy("user_id", "hr")
        .agg(max(struct(col("n_events"), col("n_kept"),
          col("n_dropped"))).as("w"))
        .select(col("user_id"), col("hr"), col("w.n_events"),
          col("w.n_kept"), col("w.n_dropped"))
        .orderBy("user_id", "hr")
        .as[QuotaRow].collect()
      assert(current.toSeq === batch.toSeq)
    } finally q.stop()
  }
}
