package graft.mutate

import graft.SparkSpec
import UpsertWriter._

/** K5/P9/P10 mutation semantics incl. REPORT_FAILURES error branch. */
class UpsertWriterSpec extends SparkSpec {

  import spark.implicits._

  private def table(dir: String) = s"$dir/t"

  private def fresh(): String = {
    val dir = tmpDir("upsert")
    val init = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "v")
    val r = UpsertWriter.write(init, table(dir), Insert, Seq("id"))
    assert(r.written === 2 && r.failed.isEmpty)
    dir
  }

  test("INSERT: existing key is a failed row, not an overwrite") {
    val dir = fresh()
    val batch = Seq((2L, "B2", 99L), (3L, "c", 30L)).toDF("id", "name", "v")
    val r = UpsertWriter.write(batch, table(dir), Insert, Seq("id"))
    assert(r.written === 3)
    assert(r.failed.select("id").as[Long].collect() === Array(2L))
    val now = spark.read.parquet(table(dir)).orderBy("id")
      .as[(Long, String, Long)].collect()
    assert(now === Array((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("UPDATE: missing key fails; present key merges columns") {
    val dir = fresh()
    val batch = Seq((1L, 111L), (9L, 999L)).toDF("id", "v")
    val r = UpsertWriter.write(batch, table(dir), Update, Seq("id"))
    assert(r.failed.select("id").as[Long].collect() === Array(9L))
    val now = spark.read.parquet(table(dir)).orderBy("id")
      .as[(Long, String, Long)].collect()
    assert(now === Array((1L, "a", 111L), (2L, "b", 20L))) // name kept
  }

  test("REPLACE: missing source columns become null") {
    val dir = fresh()
    val batch = Seq((1L, 111L)).toDF("id", "v")
    UpsertWriter.write(batch, table(dir), Replace, Seq("id"))
    val row = spark.read.parquet(table(dir)).filter("id = 1").head
    assert(row.isNullAt(row.fieldIndex("name")) && row.getLong(row.fieldIndex("v")) === 111L)
  }

  test("INSERT_OR_UPDATE: upsert keeps unspecified columns") {
    val dir = fresh()
    val batch = Seq((2L, 222L), (5L, 50L)).toDF("id", "v")
    val r = UpsertWriter.write(batch, table(dir), InsertOrUpdate, Seq("id"))
    assert(r.failed.isEmpty)
    val now = spark.read.parquet(table(dir)).orderBy("id")
      .as[(Long, String, Long)].collect()
    assert(now === Array((1L, "a", 10L), (2L, "b", 222L), (5L, null, 50L)))
  }

  test("DELETE by key; null key is a failed row") {
    val dir = fresh()
    val batch = Seq(Some(1L), None).map(Tuple1(_)).toDF("id")
    val r = UpsertWriter.write(batch, table(dir), Delete, Seq("id"))
    assert(r.failed.count() === 1)
    assert(spark.read.parquet(table(dir)).select("id").as[Long].collect() === Array(2L))
  }

  test("DDL builder follows the reference type map") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType), StructField("d", DecimalType(38, 9)),
      StructField("arr", ArrayType(LongType)),
      StructField("nested", StructType(Seq(StructField("x", LongType))))))
    val ddl = TablePrepare.ddl("t", schema, Seq("id"))
    assert(ddl.contains("`id` INT64 NOT NULL"))
    assert(ddl.contains("`s` STRING(MAX)"))
    assert(ddl.contains("`d` STRING(MAX)")) // NUMERIC degrades per :128-130
    assert(ddl.contains("`arr` ARRAY<INT64>"))
    assert(!ddl.contains("nested")) // struct column dropped
    assert(ddl.endsWith("PRIMARY KEY (id)"))
  }
}
