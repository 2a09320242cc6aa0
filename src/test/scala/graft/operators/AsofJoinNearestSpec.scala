package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for the round-11 asofJoinNearest hardening: the
  * atomic struct carry (no cross-row field mixing when the nearest row
  * holds NULL value columns), the rightTieCols duplicate-timestamp
  * collapse, and the namespace guards. */
class AsofJoinNearestSpec extends SparkSpec {
  import spark.implicits._

  test("a NULL value column on the true nearest row stays NULL — no backfill from a farther row") {
    // key 1: left at t=10. Right rows: t=9 (label 'near', payload NULL)
    // and t=5 (label 'far', payload 'P'). Nearest is t=9; the old
    // per-column ignoreNulls carry would have emitted payload 'P' from
    // t=5 while taking ts/label from t=9 — mixed rows.
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq(
      (1L, 5L, "far", Option("P")),
      (1L, 9L, "near", Option.empty[String])).toDF("k", "ts", "label", "payload")
    val out = AsofJoin.asofJoinNearest(left, right, Seq("k"), "ts", "ts",
      rightValueCols = Seq("ts", "label", "payload")).collect().head
    assert(out.getAs[Long]("nearest_ts") === 9L)
    assert(out.getAs[String]("nearest_label") === "near")
    assert(out.getAs[String]("nearest_payload") === null)
  }

  test("forward-side nearest with NULLs is equally atomic") {
    // left at t=10; only FORWARD rows exist: t=11 (null payload), t=20
    // (payload set). Nearest is t=11 — payload must be null.
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq(
      (1L, 11L, Option.empty[String]),
      (1L, 20L, Option("Z"))).toDF("k", "ts", "payload")
    val out = AsofJoin.asofJoinNearest(left, right, Seq("k"), "ts", "ts",
      rightValueCols = Seq("ts", "payload")).collect().head
    assert(out.getAs[Long]("nearest_ts") === 11L)
    assert(out.getAs[String]("nearest_payload") === null)
  }

  test("rightTieCols collapses duplicate (key, ts) right rows to the tie-minimal one") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq(
      (1L, 9L, 30L, "c"), (1L, 9L, 20L, "b"), (1L, 9L, 25L, "x"))
      .toDF("k", "ts", "event_id", "v")
    val out = AsofJoin.asofJoinNearest(left, right, Seq("k"), "ts", "ts",
      rightValueCols = Seq("event_id", "v"),
      rightTieCols = Seq("event_id")).collect().head
    assert(out.getAs[Long]("nearest_event_id") === 20L)
    assert(out.getAs[String]("nearest_v") === "b")
  }

  test("equal backward/forward distance resolves to the backward row") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 8L, "back"), (1L, 12L, "fwd")).toDF("k", "ts", "side")
    val out = AsofJoin.asofJoinNearest(left, right, Seq("k"), "ts", "ts",
      rightValueCols = Seq("side")).collect().head
    assert(out.getAs[String]("nearest_side") === "back")
  }

  test("left rows with no right rows at all carry NULLs") {
    val left = Seq((1L, 10L), (2L, 7L)).toDF("k", "ts")
    val right = Seq((1L, 9L, "a")).toDF("k", "ts", "v")
    val out = AsofJoin.asofJoinNearest(left, right, Seq("k"), "ts", "ts",
        rightValueCols = Seq("v"))
      .orderBy("k").collect()
    assert(out(0).getAs[String]("nearest_v") === "a")
    assert(out(1).getAs[String]("nearest_v") === null)
  }

  test("internal-name and output collisions are rejected loudly") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 9L, "a")).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoinNearest(left.withColumn("__ts", lit(1)), right,
        Seq("k"), "ts", "ts", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoinNearest(left.withColumn("nearest_v", lit(1)), right,
        Seq("k"), "ts", "ts", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoinNearest(left, right, Seq("k"), "ts", "ts",
        Seq("v", "v"))
    }
  }
}
