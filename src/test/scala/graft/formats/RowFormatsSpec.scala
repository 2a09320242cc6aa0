package graft.formats

import java.sql.Timestamp
import java.util.Base64
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Golden-string tests from FIXTURES.md §3 (reference
  * `StructToTextDoFnTest.java:55-58,86-91`,
  * `StructAndCsvConverterTest.java:27`). */
class RowFormatsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  test("JSON line golden (flat)") {
    val schema = StructType(Seq(
      StructField("bool", BooleanType), StructField("int", LongType),
      StructField("string", StringType), StructField("float", DoubleType),
      StructField("timestamp", TimestampType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(true, 12L, "string", 10.12, ts("2018-01-19T03:24:13Z"))),
      schema)
    val got = df.select(RowFormats.jsonLine(df).as("j")).head.getString(0)
    assert(got ===
      """{"bool":true,"int":12,"string":"string","float":10.12,"timestamp":"2018-01-19T03:24:13Z"}""")
  }

  test("JSON control chars escape with gson's full writer set (ADVICE r13)") {
    // short forms for the common five, generic \\uXXXX for the rest of
    // U+0000-U+001F (BEL/ESC/NUL/US planted) in values AND field names
    val schema = StructType(Seq(
      StructField("v", StringType), StructField("n\u0007m", StringType)))
    val raw = "a\\b\"c\nd\re\tf\bg\fh\u0000i\u0007j\u001bk\u001fl"
    val df = spark.createDataFrame(java.util.List.of(Row(raw, "x")), schema)
    val got = df.select(RowFormats.jsonLine(df).as("j")).head.getString(0)
    assert(got ===
      "{\"v\":\"a\\\\b\\\"c\\nd\\re\\tf\\bg\\fh" +
        "\\u0000i\\u0007j\\u001bk\\u001fl\",\"n\\u0007m\":\"x\"}")
    // and the escaped line is valid strict JSON: Jackson round-trips it
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(got)
    assert(node.get("v").asText() === raw)
    assert(node.get("n\u0007m").asText() === "x")
  }

  test("JSON null fields serialize as null") {
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", LongType)))
    val df = spark.createDataFrame(java.util.List.of(Row(null, null)), schema)
    val got = df.select(RowFormats.jsonLine(df).as("j")).head.getString(0)
    assert(got === """{"a":null,"b":null}""")
  }

  test("CSV line golden (simpleStruct: bytes base64, null -> empty)") {
    val schema = StructType(Seq(
      StructField("cbf", BooleanType), StructField("cif", LongType),
      StructField("cff", DoubleType), StructField("cdf", DateType),
      StructField("ctf", TimestampType), StructField("csf", StringType),
      StructField("cnf", BinaryType)))
    val bytes = Base64.getDecoder.decode("AAAAAAAAAAAAAAAABfXhAA==")
    val df = spark.createDataFrame(
      java.util.List.of(Row(true, 12L, 0.005, java.sql.Date.valueOf("2018-09-01"),
        ts("2018-09-01T03:00:00Z"), "This is a pen", bytes)),
      schema)
    val got = df.select(RowFormats.csvLine(df).as("c")).head.getString(0)
    assert(got ===
      "true,12,0.005,2018-09-01,2018-09-01T03:00:00Z,This is a pen,AAAAAAAAAAAAAAAABfXhAA==")
  }

  test("CSV quoting: commas and quotes per commons-csv DEFAULT") {
    val schema = StructType(Seq(StructField("s", StringType), StructField("n", LongType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row("""a,b "q" c""", 1L), Row(null, 2L)), schema)
    val got = df.select(RowFormats.csvLine(df).as("c"))
      .collect().map(_.getString(0)).sorted
    assert(got === Array(""""a,b ""q"" c",1""", ",2"))
  }

  test("JSON full nested golden (StructAndJsonConverterTest.java:25)") {
    val simple = StructType(Seq(
      StructField("cbf", BooleanType), StructField("cif", LongType),
      StructField("cff", DoubleType), StructField("cdf", DateType),
      StructField("ctf", TimestampType), StructField("csf", StringType),
      StructField("cnf", BinaryType)))
    val schema = StructType(Seq(
      StructField("bf", BooleanType), StructField("if", LongType),
      StructField("ff", DoubleType), StructField("sf", StringType),
      StructField("df", DateType), StructField("tf", TimestampType),
      StructField("nf", StringType), StructField("lnf", LongType),
      StructField("dnf", DateType), StructField("tnf", TimestampType),
      StructField("rf", simple),
      StructField("arf", ArrayType(simple)),
      StructField("asf", ArrayType(StringType)),
      StructField("aif", ArrayType(LongType)),
      StructField("adf", ArrayType(DateType)),
      StructField("anf", ArrayType(LongType)),
      StructField("amf", ArrayType(LongType)),
      StructField("atf", ArrayType(TimestampType))))
    val bytes = Base64.getDecoder.decode("AAAAAAAAAAAAAAAABfXhAA==")
    val simpleRow = Row(true, 12L, 0.005, java.sql.Date.valueOf("2018-09-01"),
      ts("2018-09-01T03:00:00Z"), "This is a pen", bytes)
    val row = Row(false, -12L, 110.005, "I am a pen",
      java.sql.Date.valueOf("2018-10-01"), ts("2018-10-01T03:00:00Z"),
      null, null, null, null, simpleRow, Seq(simpleRow), Seq("a", "b", "c"),
      Seq(1L, 2L, 3L),
      Seq(java.sql.Date.valueOf("2018-09-01"), java.sql.Date.valueOf("2018-10-01")),
      null, Seq(1L, 2L, 3L),
      Seq(ts("2018-09-01T03:00:00Z"), ts("2018-10-01T03:00:00Z")))
    val df = spark.createDataFrame(java.util.List.of(row), schema)
    val got = df.select(RowFormats.jsonLine(df).as("j")).head.getString(0)
    val simpleJson = """{"cbf":true,"cif":12,"cff":0.005,"cdf":"2018-09-01",""" +
      """"ctf":"2018-09-01T03:00:00Z","csf":"This is a pen","cnf":"AAAAAAAAAAAAAAAABfXhAA=="}"""
    assert(got ===
      s"""{"bf":false,"if":-12,"ff":110.005,"sf":"I am a pen","df":"2018-10-01",""" +
      s""""tf":"2018-10-01T03:00:00Z","nf":null,"lnf":null,"dnf":null,"tnf":null,""" +
      s""""rf":$simpleJson,"arf":[$simpleJson],"asf":["a","b","c"],"aif":[1,2,3],""" +
      s""""adf":["2018-09-01","2018-10-01"],"anf":null,"amf":[1,2,3],""" +
      s""""atf":["2018-09-01T03:00:00Z","2018-10-01T03:00:00Z"]}""")
  }

  test("JSON nested struct + array with null element") {
    val inner = StructType(Seq(StructField("x", LongType)))
    val schema = StructType(Seq(
      StructField("r", inner),
      StructField("aif", ArrayType(LongType, containsNull = true)),
      StructField("anf", ArrayType(LongType), nullable = true)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Row(7L), Seq[Any](null, 2L, 3L), null)), schema)
    val got = df.select(RowFormats.jsonLine(df).as("j")).head.getString(0)
    assert(got === """{"r":{"x":7},"aif":[null,2,3],"anf":null}""")
  }
}
