package graft.generate

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.SparkSpec
import DummyGen._

/** S6 / §2.8 generator semantics: yaml config, PK sequencing, ranges,
  * null rate, parallel fan-out. */
class DummyGenSpec extends SparkSpec {

  private val yaml =
    """tables:
      |  - table: mytable
      |    count: 500
      |    randomRate: 20
      |    primaryKeys: [id]
      |    fields:
      |      stringField: [A, B, C, D, E]
      |      intField: [1, 10]
      |      floatField: [-100.0, 100.0]
      |      dateField: [2014-01-01, 2018-01-01]
      |""".stripMargin

  test("yaml subset parses to TableConfig") {
    val cfgs = parseYaml(yaml)
    assert(cfgs.length === 1)
    val c = cfgs.head
    assert(c.table === "mytable" && c.count === 500 && c.randomRate === 20)
    assert(c.primaryKeys === Seq("id"))
    assert(c.fields("stringField").values === Seq("A", "B", "C", "D", "E"))
    assert(c.fields("intField").values === Seq("1", "10"))
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("stringField", StringType),
    StructField("intField", LongType),
    StructField("floatField", DoubleType),
    StructField("dateField", DateType),
    StructField("boolField", BooleanType),
    StructField("tsField", TimestampType)))

  test("generate: count, PK sequential + never null, ranges, null rate") {
    val conf = parseYaml(yaml).head
    val df = generate(spark, schema, conf, parallelNum = 4).cache()
    assert(df.count() === 500)
    // PK = sequential id, never null
    assert(df.filter(col("id").isNull).count() === 0)
    assert(df.agg(min("id"), max("id")).head ===
      org.apache.spark.sql.Row(0L, 499L))
    // value-list strings stay in the list
    val strs = df.filter(col("stringField").isNotNull)
      .select("stringField").distinct().collect().map(_.getString(0)).toSet
    assert(strs.subsetOf(Set("A", "B", "C", "D", "E")))
    // int range respected
    val Array(mn, mx) = df.filter(col("intField").isNotNull)
      .agg(min("intField"), max("intField")).head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(mn >= 1L && mx <= 10L)
    // ~20% nulls (loose band)
    val nulls = df.filter(col("intField").isNull).count()
    assert(nulls > 40 && nulls < 180, s"null count $nulls not near 20%")
    // deterministic: same seed → same data
    val again = generate(spark, schema, conf, parallelNum = 4)
    assert(df.exceptAll(again).isEmpty)
  }

  test("parallelNum controls partitioning without changing results") {
    val conf = parseYaml(yaml).head
    val p1 = generate(spark, schema, conf, parallelNum = 1)
    val p8 = generate(spark, schema, conf, parallelNum = 8)
    assert(p8.rdd.getNumPartitions === 8)
    // ids identical regardless of fan-out (contiguous slices, :281-287)
    assert(p1.select("id").exceptAll(p8.select("id")).isEmpty)
  }
}
