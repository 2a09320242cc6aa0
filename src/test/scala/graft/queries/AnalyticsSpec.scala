package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed semantics for the analytics queries whose DuckDB
  * oracles mirror the implementation logic — for these, the real
  * semantic pin is a constructed corpus with known answers, not the
  * cross-engine hash (which two consistent-but-wrong formulations could
  * both satisfy). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel stages are ORDER-sensitive: pre-view clicks don't count") {
    val ev = Seq(
      // user 1: click BEFORE first view -> stage stops at view
      (1L, "click", ts("2026-01-01 09:00:00")),
      (1L, "view", ts("2026-01-01 10:00:00")),
      // user 2: full ordered funnel
      (2L, "view", ts("2026-01-01 10:00:00")),
      (2L, "click", ts("2026-01-01 10:05:00")),
      (2L, "purchase", ts("2026-01-01 10:10:00")),
      // user 3: purchase before click -> stage 2 only
      (3L, "view", ts("2026-01-01 10:00:00")),
      (3L, "purchase", ts("2026-01-01 10:01:00")),
      (3L, "click", ts("2026-01-01 10:02:00")),
      // user 4: never viewed -> absent from the funnel
      (4L, "click", ts("2026-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") >= col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    val stages = v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t_purchase").isNotNull, 3L)
          .when(col("t_click").isNotNull, 2L).otherwise(1L).as("stage"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("stage")).toMap
    assert(stages === Map(1L -> 1L, 2L -> 3L, 3L -> 2L))
  }

  test("peak concurrency: overlap counting, touching sessions, midnight straddle") {
    // sessions: A 10:00-11:00, B 10:30-11:30, C 11:00-11:15 (touches A's
    // end -> all three concurrent at 11:00), D 23:30-00:30 (straddles
    // into day 2, where it is the only session -> base=1 carries it)
    val sess = Seq(
      (1L, ts("2026-01-01 10:00:00"), ts("2026-01-01 11:00:00")),
      (2L, ts("2026-01-01 10:30:00"), ts("2026-01-01 11:30:00")),
      (3L, ts("2026-01-01 11:00:00"), ts("2026-01-01 11:15:00")),
      (4L, ts("2026-01-01 23:30:00"), ts("2026-01-02 00:30:00"))
    ).toDF("user_id", "session_start", "session_end")
    val pts = sess.select(explode(array(
        struct(col("session_start").as("ts"), lit(1L).as("delta")),
        struct(col("session_end").as("ts"), lit(-1L).as("delta")))).as("p"))
      .select(to_date(col("p.ts")).as("day"), col("p.ts").as("ts"), col("p.delta").as("delta"))
    val days = pts.select("day").distinct()
    val base = days.join(sess,
        col("session_start") < col("day").cast("timestamp") &&
          col("session_end") >= col("day").cast("timestamp"), "left")
      .groupBy("day").agg(count(col("user_id")).as("base"))
    val w = Window.partitionBy("day").orderBy(col("ts").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peaks = pts.withColumn("run", sum(col("delta")).over(w))
      .groupBy("day").agg(max(col("run")).as("max_run"))
      .join(base, "day")
      .select(col("day").cast("string"),
        (col("base") + greatest(col("max_run"), lit(0L))).as("peak"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("peak")).toMap
    assert(peaks("2026-01-01") === 3L) // A+B+C at 11:00 (touch counts)
    assert(peaks("2026-01-02") === 1L) // D alone, carried by the base
  }

  test("cohort retention counts DISTINCT users per (cohort, offset)") {
    val ev = Seq(
      // user 1 first seen Jan 1, active Jan 1 (twice) and Jan 3
      (1L, ts("2026-01-01 10:00:00")), (1L, ts("2026-01-01 11:00:00")),
      (1L, ts("2026-01-03 10:00:00")),
      // user 2 same cohort, active Jan 1 only
      (2L, ts("2026-01-01 12:00:00")),
      // user 3 later cohort Jan 2, active Jan 2 and Jan 3
      (3L, ts("2026-01-02 09:00:00")), (3L, ts("2026-01-03 09:00:00"))
    ).toDF("user_id", "ts")
    val first = ev.groupBy("user_id").agg(to_date(min("ts")).as("cohort_day"))
    val r = ev.join(first, "user_id")
      .select(col("cohort_day"),
        datediff(to_date(col("ts")), col("cohort_day")).cast("long").as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(r === Map(
      ("2026-01-01", 0L) -> 2L, // users 1+2 on day 0; user 1's double-visit counts once
      ("2026-01-01", 2L) -> 1L, // user 1 returns on offset 2
      ("2026-01-02", 0L) -> 1L,
      ("2026-01-02", 1L) -> 1L))
  }

  test("gap fill: missing days materialize and carry the last value forward") {
    val daily = Seq(
      (1L, java.sql.Date.valueOf("2026-01-01"), 5.0),
      (1L, java.sql.Date.valueOf("2026-01-04"), 7.0)
    ).toDF("user_id", "day", "day_value")
    val days = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = days.join(daily, Seq("user_id", "day"), "left")
      .select(col("day").cast("string"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("filled")).toMap
    assert(filled === Map(
      "2026-01-01" -> 5.0, "2026-01-02" -> 5.0,
      "2026-01-03" -> 5.0, "2026-01-04" -> 7.0))
  }
}
