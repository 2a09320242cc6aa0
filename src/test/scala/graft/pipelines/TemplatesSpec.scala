package graft.pipelines

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.TableCatalog

/** End-to-end template-equivalents on /root/testdata/sf0.001 (t1 smoke
  * scale) — the §3.1 lifecycle: register → SQL (--SPLITTER--, @params) →
  * sink → notify. */
class TemplatesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("SpannerToText equivalent: query -> split json files + notify") {
    TableCatalog.register(spark, sf)
    val dir = tmpDir("t_text")
    val res = Templates.queryToText(spark, Templates.QueryToTextConfig(
      query = "SELECT r_regionkey, r_name FROM region",
      output = s"$dir/regions",
      format = "json",
      splitField = Some("r_name"),
      withoutSharding = true,
      outputNotify = Some(s"$dir/notify.txt")))
    assert(res.files.length === 5)
    assert(res.files.exists(_.endsWith("regionsAFRICA.json")))
    val notify = Files.readAllLines(Paths.get(s"$dir/notify.txt")).asScala
    assert(notify.length === 5)
  }

  test("SpannerToText: --SPLITTER-- + @param binding") {
    TableCatalog.register(spark, sf)
    val dir = tmpDir("t_split")
    val res = Templates.queryToText(spark, Templates.QueryToTextConfig(
      query = "SELECT n_name FROM nation WHERE n_regionkey = @rk " +
        "--SPLITTER-- SELECT r_name AS n_name FROM region WHERE r_regionkey = @rk",
      output = s"$dir/out", format = "csv", withoutSharding = true,
      params = Map("rk" -> 0)))
    val lines = Files.readAllLines(Paths.get(res.files.head)).asScala
    assert(lines.length === 6) // 5 nations + 1 region
  }

  test("SpannerToAvro equivalent round-trips") {
    TableCatalog.register(spark, sf)
    val dir = tmpDir("t_avro")
    val res = Templates.queryToAvro(spark, Templates.QueryToAvroConfig(
      query = "SELECT n_nationkey, n_name FROM nation",
      output = s"$dir/nations"))
    val back = graft.sources.AvroIO.read(spark, res.files.head)
    assert(back.count() === 25)
  }

  test("SpannerToSpanner equivalent: upsert with error branch") {
    TableCatalog.register(spark, sf)
    val dir = tmpDir("t_upsert")
    val r1 = Templates.queryToUpsert(spark, Templates.QueryToUpsertConfig(
      query = "SELECT r_regionkey, r_name FROM region",
      outputTable = s"$dir/region_t", keyFields = Seq("r_regionkey"),
      mutationOp = "INSERT"))
    assert(r1.written === 5 && r1.failed.isEmpty)
    // second INSERT of same keys: all failed, error avro written, count notified
    val r2 = Templates.queryToUpsert(spark, Templates.QueryToUpsertConfig(
      query = "SELECT r_regionkey, r_name FROM region",
      outputTable = s"$dir/region_t", keyFields = Seq("r_regionkey"),
      mutationOp = "INSERT",
      outputError = Some(s"$dir/errors"),
      outputNotify = Some(s"$dir/failed_count.txt")))
    assert(r2.failed.count() === 5)
    assert(graft.sources.AvroIO.read(spark, s"$dir/errors").count() === 5)
    assert(Files.readString(Paths.get(s"$dir/failed_count.txt")) === "5")
  }

  test("SpannerToSpannerDelete equivalent") {
    TableCatalog.register(spark, sf)
    val dir = tmpDir("t_del")
    Templates.queryToUpsert(spark, Templates.QueryToUpsertConfig(
      "SELECT r_regionkey, r_name FROM region", s"$dir/t", Seq("r_regionkey"), "INSERT"))
    Templates.queryToDelete(spark, Templates.QueryToDeleteConfig(
      "SELECT r_regionkey FROM region WHERE r_regionkey < 2", s"$dir/t", Seq("r_regionkey")))
    assert(spark.read.parquet(s"$dir/t").count() === 3)
  }

  test("BigQueryToDatastore equivalent: keyed docs + 1500-byte unindex rule") {
    TableCatalog.register(spark, sf)
    val dir = tmpDir("t_ds")
    spark.sql("SELECT 1L AS id, repeat('x', 2000) AS big, 'small' AS small")
      .createOrReplaceTempView("wide")
    val out = Templates.queryToDocuments(spark, Templates.QueryToDocumentsConfig(
      "SELECT * FROM wide", s"$dir/docs", kind = "Wide", keyField = "id"))
    val row = out.head
    assert(row.getAs[String]("__key__") === "Wide/1")
    assert(row.getAs[Seq[String]]("__unindexed__") === Seq("big"))
  }

  test("Datastore nested shaping: maps expand to {key,value} entity arrays at any depth " +
    "(RecordToEntityConverter.java:219-231)") {
    import org.apache.spark.sql.Row
    val dir = tmpDir("t_dsnest")
    spark.sql(
      """SELECT 1L AS id,
        |  map('b', 2L, 'a', 1L) AS attrs,
        |  named_struct('name', 'inner', 'tags', map('z', 'last', 'y', 'mid')) AS nested,
        |  array(map('k', 9L)) AS arr_of_map""".stripMargin)
      .createOrReplaceTempView("mapped")
    val out = Templates.queryToDocuments(spark, Templates.QueryToDocumentsConfig(
      "SELECT * FROM mapped", s"$dir/docs", kind = "M", keyField = "id"))
    val doc = out.head.getAs[Row]("doc")
    // top-level map -> entity array sorted by key
    assert(doc.getAs[Seq[Row]]("attrs").map(r => (r.getString(0), r.getLong(1)))
      === Seq("a" -> 1L, "b" -> 2L))
    // map nested inside a struct expands too
    val nested = doc.getAs[Row]("nested")
    assert(nested.getAs[String]("name") === "inner")
    assert(nested.getAs[Seq[Row]]("tags").map(r => (r.getString(0), r.getString(1)))
      === Seq("y" -> "mid", "z" -> "last"))
    // and inside array elements
    assert(doc.getAs[Seq[Seq[Row]]]("arr_of_map").head
      .map(r => (r.getString(0), r.getLong(1))) === Seq("k" -> 9L))
  }

  test("Datastore key field must be STRING or INT64 — DOUBLE rejected " +
    "(RecordToEntityConverter.java:238-254)") {
    val dir = tmpDir("t_dskey")
    spark.sql("SELECT CAST(1.5 AS DOUBLE) AS id, 'x' AS v")
      .createOrReplaceTempView("badkey")
    val e = intercept[IllegalArgumentException] {
      Templates.queryToDocuments(spark, Templates.QueryToDocumentsConfig(
        "SELECT * FROM badkey", s"$dir/docs", kind = "K", keyField = "id"))
    }
    assert(e.getMessage.contains("STRING or INT64"))
    // long and string keys remain accepted
    spark.sql("SELECT 7L AS id, 'x' AS v").createOrReplaceTempView("goodkey")
    val out = Templates.queryToDocuments(spark, Templates.QueryToDocumentsConfig(
      "SELECT * FROM goodkey", s"$dir/docs2", kind = "K", keyField = "id"))
    assert(out.head.getAs[String]("__key__") === "K/7")
  }

  test("BigQueryToTFRecord equivalent writes framed gzip files") {
    TableCatalog.register(spark, sf)
    val dir = tmpDir("t_tfr")
    val files = Templates.queryToTFRecord(spark, Templates.QueryToTFRecordConfig(
      "SELECT r_regionkey, r_name FROM region", s"$dir/rec"))
    assert(files.nonEmpty && files.forall(_.endsWith(".tfrecord")))
  }

  test("AvroToSpanner + AvroToDatastore equivalents") {
    TableCatalog.register(spark, sf)
    val dir = tmpDir("t_avro_in")
    // produce avro input first
    Templates.queryToAvro(spark, Templates.QueryToAvroConfig(
      "SELECT n_nationkey, n_name FROM nation", s"$dir/in"))
    val r = Templates.avroToUpsert(spark, Templates.AvroToUpsertConfig(
      s"$dir/in.avro", s"$dir/t", Seq("n_nationkey")))
    assert(r.written === 25)
    val docs = Templates.avroToDocuments(spark, Templates.AvroToDocumentsConfig(
      s"$dir/in.avro", s"$dir/docs", "Nation", "n_nationkey"))
    assert(docs.count() === 25)
  }

  test("incremental corpus update: curate batch then merge, idempotent") {
    val dir = tmpDir("t_corpus")
    val docs = TableCatalog.load(spark, sf, "documents")
    val conf = Templates.CorpusUpdateConfig(s"$dir/corpus")
    val r1 = Templates.corpusUpdate(spark, docs.filter(col("doc_id") < 300), conf)
    assert(r1.written > 0 && r1.failed.isEmpty)
    val sizeAfter1 = spark.read.parquet(s"$dir/corpus").count()
    // second batch overlaps the first -> overlapping ids merge, not duplicate
    val r2 = Templates.corpusUpdate(spark, docs.filter(col("doc_id") < 400), conf)
    val sizeAfter2 = spark.read.parquet(s"$dir/corpus").count()
    assert(sizeAfter2 > sizeAfter1)
    // re-ingesting the same batch is a no-op on row count (idempotent)
    Templates.corpusUpdate(spark, docs.filter(col("doc_id") < 400), conf)
    assert(spark.read.parquet(s"$dir/corpus").count() === sizeAfter2)
  }

  test("DummyToSpanner equivalent: generator -> upsert") {
    val dir = tmpDir("t_dummy")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType)))
    val res = Templates.dummyToUpsert(spark, Templates.DummyToUpsertConfig(
      """tables:
        |  - table: gen1
        |    count: 100
        |    primaryKeys: [id]
        |""".stripMargin,
      dir, Map("gen1" -> schema), parallelNum = 2))
    assert(res("gen1").written === 100)
    assert(spark.read.parquet(s"$dir/gen1").count() === 100)
  }
}
