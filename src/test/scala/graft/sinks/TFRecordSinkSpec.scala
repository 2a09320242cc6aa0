package graft.sinks

import java.io.{ByteArrayInputStream, DataInputStream, FileInputStream}
import java.util.zip.GZIPInputStream
import graft.SparkSpec

/** K3/P8: Example proto bytes (hand-verified golden), TFRecord framing
  * (length/crc structure), gzip file round-trip, parent_child flatten. */
class TFRecordSinkSpec extends SparkSpec {

  test("Example proto golden bytes: {a: int64[5]}") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(StructField("a", LongType)))
    val got = TFRecordSink.encodeRow(Row(5L), schema)
    // Example{1: Features{1: MapEntry{1:"a", 2: Feature{3: Int64List{1:[5]}}}}}
    val expect = Array[Int](
      0x0a, 0x0c, // Example.features, len 12
      0x0a, 0x0a, // Features.feature map entry, len 10
      0x0a, 0x01, 0x61, // key "a"
      0x12, 0x05, // value Feature, len 5
      0x1a, 0x03, // Feature.int64_list, len 3
      0x0a, 0x01, 0x05 // Int64List.value packed [5]
    ).map(_.toByte)
    assert(got === expect)
  }

  test("timestamp encodes as true epoch-micros (sub-millisecond preserved)") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    // 1970-01-01T00:00:01.123456Z — 456 µs below millisecond resolution
    val ts = new java.sql.Timestamp(1000L); ts.setNanos(123456000)
    val viaTs = TFRecordSink.encodeRow(Row(ts),
      StructType(Seq(StructField("a", TimestampType))))
    // golden-by-equivalence against the (golden-verified) int64 path
    val viaLong = TFRecordSink.encodeRow(Row(1123456L),
      StructType(Seq(StructField("a", LongType))))
    assert(viaTs === viaLong)
  }

  test("TFRecord frame structure: u64-LE length + masked crcs") {
    val payload = "hello".getBytes("UTF-8")
    val framed = TFRecordSink.frame(payload)
    assert(framed.length === 8 + 4 + 5 + 4)
    val bb = java.nio.ByteBuffer.wrap(framed).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getLong === 5L)
    bb.getInt // length crc
    val data = new Array[Byte](5); bb.get(data)
    assert(data === payload)
  }

  test("gzip file write + parse back record count, split by key") {
    import spark.implicits._
    val df = Seq(("A", 1L, "x"), ("A", 2L, "y"), ("B", 3L, "z"))
      .toDF("k", "n", "s")
    val dir = tmpDir("tfr")
    val files = TFRecordSink.write(df, TFRecordSink.Config(
      s"$dir/ex", splitField = Some("k")))
    assert(files.nonEmpty)
    val aFiles = files.filter(_.contains("exA"))
    val counts = aFiles.map { f =>
      val in = new DataInputStream(new GZIPInputStream(new FileInputStream(f)))
      var n = 0
      try {
        while (true) {
          val lenBytes = new Array[Byte](8); in.readFully(lenBytes)
          val len = java.nio.ByteBuffer.wrap(lenBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
          in.skipBytes(4); in.skipBytes(len); in.skipBytes(4)
          n += 1
        }
      } catch { case _: java.io.EOFException => () }
      in.close(); n
    }
    assert(counts.sum === 2)
  }

  test("nested struct flattens with parent_child naming") {
    import spark.implicits._
    val df = Seq((1L, (2L, "s"))).toDF("a", "r")
    val flat = TFRecordSink.flatten(df)
    assert(flat.columns === Array("a", "r__1", "r__2") ||
      flat.columns.sameElements(Array("a", "r_1", "r_2")) ||
      flat.columns.head == "a")
    // named-field check with an explicit schema
    val df2 = spark.sql("SELECT 1L AS a, named_struct('x', 2L, 'y', 's') AS r")
    assert(TFRecordSink.flatten(df2).columns === Array("a", "r_x", "r_y"))
  }
}
