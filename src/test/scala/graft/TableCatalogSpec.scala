package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.catalog.TableCatalog

/** Schema-drift regression for `TableCatalog.load("events")`.
  *
  * The driver's testdata generator has shipped `events.ts` under two
  * different physical parquet encodings across rounds:
  *   (a) int64 nanos-since-epoch (TIMESTAMP(NANOS), surfaced to Spark as
  *       LongType via `spark.sql.legacy.parquet.nanosAsLong`), and
  *   (b) `timestamp[us]` without timezone (resolved as TIMESTAMP_NTZ).
  * Round 8 hard-coded (a) and lost 25 oracle queries when the data moved
  * to (b). This spec writes an events fixture in BOTH encodings and
  * asserts `load` normalizes each to the identical session-UTC
  * TimestampType frame, so the next encoding drift fails here instead of
  * at the gate.
  */
class TableCatalogSpec extends SparkSpec {

  // micros since epoch; includes a sub-millisecond component so a lossy
  // millis round-trip would be caught
  private val micros = Seq(1700000000000001L, 1700003600123456L, 1700007199999999L)

  private def fixtureRows = micros.zipWithIndex.map { case (us, i) =>
    (i.toLong, us, 100L + i, s"type_$i", i * 1.5, s"""{"k":$i}""")
  }

  /** Write an events fixture whose ts column is int64 nanos (encoding a). */
  private def writeNanosLong(dir: String): Unit = {
    val rows = fixtureRows.map { case (id, us, uid, et, v, p) =>
      Row(id, us * 1000L, uid, et, v, p)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Write an events fixture whose ts column is timestamp[us] NTZ (encoding b). */
  private def writeTimestampNtz(dir: String): Unit = {
    val rows = fixtureRows.map { case (id, us, uid, et, v, p) =>
      Row(id, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC),
        uid, et, v, p)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedTs(dir: String): (DataType, Seq[Long]) = {
    val df = TableCatalog.load(spark, dir, "events")
    val dt = df.schema("ts").dataType
    val vals = df.orderBy("event_id").collect().toSeq
      .map(r => r.getAs[Timestamp]("ts"))
      .map(t => t.getTime / 1000L * 1000000L + t.getNanos / 1000L)
    (dt, vals)
  }

  test("load normalizes int64-nanos events.ts to session-UTC timestamp") {
    val dir = tmpDir("cat_nanos")
    writeNanosLong(dir)
    val (dt, vals) = loadedTs(dir)
    assert(dt == TimestampType)
    assert(vals == micros)
  }

  test("load normalizes timestamp[us]/NTZ events.ts to session-UTC timestamp") {
    val dir = tmpDir("cat_ntz")
    writeTimestampNtz(dir)
    val (dt, vals) = loadedTs(dir)
    assert(dt == TimestampType)
    assert(vals == micros)
  }

  test("both encodings load to frames with identical schema and values") {
    val d1 = tmpDir("cat_a"); val d2 = tmpDir("cat_b")
    writeNanosLong(d1); writeTimestampNtz(d2)
    val a = TableCatalog.load(spark, d1, "events").orderBy("event_id").collect().toSeq
    val b = TableCatalog.load(spark, d2, "events").orderBy("event_id").collect().toSeq
    assert(TableCatalog.load(spark, d1, "events").schema ==
      TableCatalog.load(spark, d2, "events").schema)
    assert(a == b)
  }

  test("driver testdata events loads as session-UTC timestamp (current encoding)") {
    val sfDir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$sfDir/events.parquet").exists()) {
      val df = TableCatalog.load(spark, sfDir, "events")
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.limit(5).count() > 0)
    }
  }
}
