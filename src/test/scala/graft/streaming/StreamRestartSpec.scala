package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Checkpoint-restart e2e for the streaming tier (verdict r12 item 5):
  * a file-source stream of windowed aggregates feeding
  * [[EventStream.streamUpsert]] is STOPPED between micro-batches and
  * resumed from its checkpoint with new input present. The exactly-once
  * contract foreachBatch + a checkpoint is supposed to give:
  *  - no window LOST: aggregation state (and the source offsets) survive
  *    the restart, so windows whose events straddle the stop boundary
  *    still reach their full batch-parity counts;
  *  - no batch DOUBLE-MERGED: the resumed query continues at the next
  *    batchId — committed batches are never re-fed (asserted on the
  *    recorded progress batchIds of both runs);
  *  - final table = the batch backfill, hash-compared column-for-column.
  */
class StreamRestartSpec extends SparkSpec {

  private lazy val events =
    graft.catalog.TableCatalog.load(spark, "/root/testdata/sf0.001", "events")

  /** Four deterministic EVENT-TIME quartiles of the real fixture; each
    * becomes ONE input file so maxFilesPerTrigger=1 yields one
    * micro-batch per slice. Time-ordered slices are the real CDC feed
    * shape — an id-interleaved slicing would make every batch-2 row
    * LATE (batch 1 spans the whole month, so the watermark jumps to
    * month-end and event-time state drops the rest by design).
    * Returns the per-slice writer into `in`. */
  private def quartileSlicer(dir: String, in: String,
                             src: => org.apache.spark.sql.DataFrame = events): Int => Unit = {
    new java.io.File(in).mkdirs()
    val quartiled = src.withColumn("__q", ntile(4).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    (i: Int) => {
      val tmp = s"$dir/_tmp$i"
      quartiled.filter(col("__q") === i + 1).drop("__q")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$in/slice$i.parquet"))
    }
  }

  test("streamUpsert: kill-and-resume from checkpoint keeps batch parity") {
    val dir = tmpDir("upsert_restart")
    val in = s"$dir/in"; val cp = s"$dir/cp"; val table = s"$dir/table"
    val ev = events
    val addSlice = quartileSlicer(dir, in)
    addSlice(0); addSlice(1)
    val schema = spark.read.parquet(in).schema

    def start() = EventStream.streamUpsert(
      EventStream.windowedCounts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)),
      table, Seq("window_start", "event_type"), Some(cp))

    // run 1: two micro-batches, then a stop BETWEEN batches (the restart
    // point a killed driver would resume from — offsets + window state
    // live in the checkpoint, not the JVM)
    val q1 = start()
    val ids1 = try { q1.processAllAvailable()
      q1.recentProgress.map(_.batchId).toSeq } finally q1.stop()
    assert(ids1.nonEmpty, "run 1 processed no batches")
    val partial = spark.read.parquet(table)
    assert(partial.count() > 0, "run 1 left no upserted state")

    // new input arrives while the query is down
    addSlice(2); addSlice(3)

    // run 2: SAME checkpoint — must resume at the next batchId and fold
    // the new slices into the windows run 1 left open
    val q2 = start()
    val ids2 = try { q2.processAllAvailable()
      q2.recentProgress.map(_.batchId).toSeq } finally q2.stop()
    assert(ids2.nonEmpty, "run 2 processed no batches")
    assert(ids2.min > ids1.max,
      s"resume must continue past run 1's committed batches (no re-feed / " +
        s"double-merge): run1=$ids1 run2=$ids2")

    // final table = batch backfill, exactly
    val cols = Seq("window_start", "event_type", "n", "total_value")
    val got = spark.read.parquet(table).select(cols.head, cols.tail: _*)
    val want = EventStream.windowedCounts(ev).select(cols.head, cols.tail: _*)
    assert(want.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "restarted stream's upserted table must equal the batch backfill " +
        "(a lost window or a partial count would differ)")
  }

  test("append-mode windowed DDSketch into a parquet file sink survives restart exactly-once") {
    // the NATIVE file sink's exactly-once contract (its commit manifest)
    // across a checkpoint restart, on a finite-state sketch stream:
    // windows the final watermark provably closed are emitted exactly
    // once in total across BOTH runs — none lost at the stop boundary,
    // none double-appended on resume
    val dir = tmpDir("dd_restart")
    val in = s"$dir/in"; val cp = s"$dir/cp"; val out = s"$dir/out"
    val addSlice = quartileSlicer(dir, in)
    addSlice(0); addSlice(1)
    val schema = spark.read.parquet(in).schema

    def start() = EventStream.windowedDdBuckets(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in))
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp).option("path", out)
      .format("parquet").start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    addSlice(2); addSlice(3)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out).select("window_start", "bucket", "cnt")
    val batchEv = events
    val batch = EventStream.windowedDdBuckets(batchEv)
      .select("window_start", "bucket", "cnt")
    // a 1-day window is provably closed once watermark (max ts − 1 h)
    // passes its end: window_start ≤ maxTs − 1 day − 1 h
    val maxTs = batchEv.agg(max(col("ts"))).head.getTimestamp(0)
    val closeBefore =
      new java.sql.Timestamp(maxTs.getTime - 3600000L - 86400000L)
    val closedBatch = batch.filter(col("window_start") <= closeBefore)
    assert(closedBatch.count() > 0)
    assert(closedBatch.exceptAll(got).isEmpty,
      "every provably-closed batch bucket must be in the file sink " +
        "(a bucket lost at the restart boundary would be missing)")
    assert(got.exceptAll(batch).isEmpty,
      "the file sink must hold no cell the batch sketch does not have " +
        "(a double-append on resume would duplicate rows)")
  }

  test("flatMapGroupsWithState sessionization survives restart: custom state recovered, sessions exactly-once") {
    // the third state type across a restart: CUSTOM GroupState (open
    // per-user session accumulators + event-time timeouts), not engine
    // window state. Sessions OPEN at the stop boundary must close
    // correctly after resume from their checkpointed accumulators —
    // lost state would shear every boundary-straddling session in two
    // (and the halves would fail the batch-parity subset checks below).
    import spark.implicits._
    import EventStream.Event
    val dir = tmpDir("sess_restart")
    val in = s"$dir/in"; val cp = s"$dir/cp"; val out = s"$dir/out"
    val addSlice = quartileSlicer(dir, in)
    addSlice(0); addSlice(1)
    val schema = spark.read.parquet(in).schema

    def start() = EventStream.sessionizeEventTime(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in)
          .select(col("user_id"), col("ts"), col("value")).as[Event])
      .toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp).option("path", out)
      .format("parquet").start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    addSlice(2); addSlice(3)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val cols = Seq("user_id", "n_events", "total", "session_start", "session_end")
    val got = spark.read.parquet(out).select(cols.head, cols.tail: _*)
    val batchEv = events
    val batchClosed = EventStream.sessionizeEventTime(
        batchEv.select(col("user_id"), col("ts"), col("value")).as[Event])
      .toDF().select(cols.head, cols.tail: _*)
    assert(batchClosed.count() > 0)
    // every straddle-closed batch session appears exactly once in the sink
    assert(batchClosed.exceptAll(got).isEmpty,
      "a batch-closed session missing from the sink = state lost at restart")
    // no duplicates at all in the sink (exactly-once across both runs)
    val dups = got.groupBy(cols.head, cols.tail: _*).count()
      .filter(col("count") > 1).count()
    assert(dups === 0L, "a session emitted twice = double-append on resume")
    // every extra sink session was provably closed by the final watermark
    val wmMicros = batchEv.agg(max(unix_micros(col("ts")))).head.getLong(0) -
      3600000000L
    val extras = got.exceptAll(batchClosed)
      .select(unix_micros(col("session_end")).as("endUs")).as[Long].collect()
    assert(extras.forall(_ + 3600000000L <= wmMicros),
      "sink must only add sessions the watermark proved closed")
  }

  test("intervalJoin: stream-stream join survives restart — both sides' buffered state recovered, matches exactly-once") {
    // the fourth (and last MemoryStream-parity-only) stateful family:
    // a stream-STREAM join buffers BOTH inputs in watermark-bounded
    // state. The restart must recover both buffers: a click seen in
    // run 1 must still match a purchase that only arrives in run 2
    // (lost click state = lost attribution), and no match may be
    // re-emitted on resume (double-append).
    val dir = tmpDir("ivjoin_restart")
    val inP = s"$dir/in_p"; val inC = s"$dir/in_c"
    val cp = s"$dir/cp"; val out = s"$dir/out"
    val ev = events
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    val addP = quartileSlicer(dir, inP, purchases)
    val addC = quartileSlicer(dir, inC, clicks)
    addP(0); addP(1); addC(0); addC(1)
    val schema = spark.read.parquet(inP).schema

    def start() = EventStream.intervalJoin(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(inP),
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(inC))
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp).option("path", out)
      .format("parquet").start()

    val q1 = start()
    val ids1 = try { q1.processAllAvailable()
      q1.recentProgress.map(_.batchId).toSeq } finally q1.stop()
    assert(ids1.nonEmpty, "run 1 processed no batches")

    // both sides grow while the query is down
    addP(2); addP(3); addC(2); addC(3)

    val q2 = start()
    val ids2 = try { q2.processAllAvailable()
      q2.recentProgress.map(_.batchId).toSeq } finally q2.stop()
    assert(ids2.nonEmpty, "run 2 processed no batches")
    assert(ids2.min > ids1.max,
      s"resume must continue past run 1's committed batches: run1=$ids1 run2=$ids2")

    // inner interval join emits a match as soon as both rows are seen,
    // and the time-ordered slices keep every click in state until its
    // whole match window has been fed — so the sink must equal the
    // batch backfill EXACTLY (nothing lost at the boundary, nothing
    // duplicated on resume)
    val cols = Seq("p_event_id", "user_id", "p_ts", "c_event_id", "c_ts")
    val got = spark.read.parquet(out).select(cols.head, cols.tail: _*)
    val want = EventStream.intervalJoin(purchases, clicks)
      .select(cols.head, cols.tail: _*)
    assert(want.count() > 0, "fixture must produce attributed purchases")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "restarted stream-stream join must equal the batch backfill")

    // the restart must have been LOAD-BEARING: some click buffered in
    // run 1 matches a purchase that only arrived in run 2 — the pair
    // that dies if the click-side buffer is lost at the boundary
    val run1Clicks = spark.read.parquet(s"$inC/slice0.parquet",
      s"$inC/slice1.parquet").select(col("event_id").as("c_event_id"))
    val run2Purch = spark.read.parquet(s"$inP/slice2.parquet",
      s"$inP/slice3.parquet").select(col("event_id").as("p_event_id"))
    val straddle = want.join(run1Clicks, "c_event_id")
      .join(run2Purch, "p_event_id")
    assert(straddle.count() > 0,
      "fixture slicing must produce at least one boundary-straddling " +
        "match, else this test proves no state recovery")
  }

  test("dropDuplicatesWithinWatermark ingest dedup survives restart: no re-delivered dup admitted, no row lost") {
    // the fifth stateful family (r14 verdict item 5): the seen-id state
    // of dedupStream must survive the checkpoint boundary. An at-least-
    // once source RE-DELIVERS, while the query is down, exact copies of
    // rows it already delivered in run 1 — copies still INSIDE the
    // watermark horizon, so only recovered state (not the late-row
    // cutoff) can suppress them. Batch parity: the fixture's event_ids
    // are unique, so the final sink must equal the fixture exactly.
    val dir = tmpDir("dedup_restart")
    val in = s"$dir/in"; val cp = s"$dir/cp"; val out = s"$dir/out"
    val ev = events
    val addSlice = quartileSlicer(dir, in)
    addSlice(0); addSlice(1)
    val schema = spark.read.parquet(in).schema

    def start() = EventStream.dedupStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in))
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp).option("path", out)
      .format("parquet").start()

    val q1 = start()
    val ids1 = try { q1.processAllAvailable()
      q1.recentProgress.map(_.batchId).toSeq } finally q1.stop()
    assert(ids1.nonEmpty, "run 1 processed no batches")

    // re-delivery while the query is down: exact copies of quartile-2
    // rows from its final hour — above run 1's checkpointed watermark
    // (max(q2 ts) − 1 h), so the first resumed batch must consult the
    // recovered seen-id state to suppress them. Written BEFORE the
    // quartile-3/4 slices so the file source (mod-time order) feeds it
    // first, under the restored watermark.
    val quartiled = ev.withColumn("__q", ntile(4).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    val q2rows = quartiled.filter(col("__q") === 2).drop("__q")
    val maxQ2 = q2rows.agg(max(col("ts"))).head.getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxQ2.getTime - 3600000L)
    val dups = q2rows.filter(col("ts") > horizon)
    assert(dups.count() > 0,
      "fixture must have rows in the final hour of quartile 2")
    val tmp = s"$dir/_tmpdup"
    dups.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$in/slice1b_redelivered.parquet"))
    addSlice(2); addSlice(3)

    val q2 = start()
    val ids2 = try { q2.processAllAvailable()
      q2.recentProgress.map(_.batchId).toSeq } finally q2.stop()
    assert(ids2.nonEmpty, "run 2 processed no batches")
    assert(ids2.min > ids1.max,
      s"resume must continue past run 1's committed batches: run1=$ids1 run2=$ids2")

    val got = spark.read.parquet(out).select("event_id", "ts", "event_type")
    // no duplicate admitted — the re-delivered in-horizon copies must be
    // suppressed by the RECOVERED state
    val dupAdmitted = got.groupBy("event_id").count().filter(col("count") > 1)
    assert(dupAdmitted.isEmpty,
      "a re-delivered id was admitted twice — seen-id state lost at the restart")
    // ...and not over-suppressed: every re-delivered id is in the sink
    // exactly once (run 1's emit survived the restart boundary)
    val dupIds = dups.select("event_id").distinct()
    assert(dupIds.join(got, "event_id").count() === dupIds.count(),
      "a run-1 row whose id was re-delivered is missing from the sink")
    // batch parity: unique fixture ids ⇒ sink == fixture exactly
    val want = ev.select("event_id", "ts", "event_type")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "restarted ingest dedup must equal the batch fixture " +
        "(a lost row or an admitted duplicate would differ)")
  }
}
