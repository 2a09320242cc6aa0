package graft.formats

import org.apache.spark.sql.types._
import graft.SparkSpec

class WarehouseSchemaSpec extends SparkSpec {

  test("type map + modes: scalars NULLABLE, arrays REPEATED, nested RECORD") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false), // still NULLABLE per policy
      StructField("name", StringType),
      StructField("price", DecimalType(38, 9)),
      StructField("tags", ArrayType(StringType)),
      StructField("meta", StructType(Seq(StructField("x", DoubleType)))),
      StructField("attrs", MapType(StringType, LongType))))
    val json = WarehouseSchema.schemaJson(schema)
    assert(json ===
      """{"fields":[""" +
        """{"name":"id","type":"INTEGER","mode":"NULLABLE"},""" +
        """{"name":"name","type":"STRING","mode":"NULLABLE"},""" +
        """{"name":"price","type":"NUMERIC","mode":"NULLABLE"},""" +
        """{"name":"tags","type":"STRING","mode":"REPEATED"},""" +
        """{"name":"meta","type":"RECORD","mode":"NULLABLE","fields":[""" +
        """{"name":"x","type":"FLOAT","mode":"NULLABLE"}]},""" +
        """{"name":"attrs","type":"RECORD","mode":"REPEATED","fields":[""" +
        """{"name":"key","type":"STRING","mode":"NULLABLE"},""" +
        """{"name":"value","type":"INTEGER","mode":"NULLABLE"}]}]}""")
  }

  test("sqlType metadata tag renders TIME/DATETIME/GEOGRAPHY for string fields") {
    def md(t: String) = new MetadataBuilder().putString("sqlType", t).build()
    val schema = StructType(Seq(
      StructField("t", StringType, nullable = true, md("TIME")),
      StructField("dt", StringType, nullable = true, md("DATETIME")),
      StructField("g", StringType, nullable = true, md("GEOGRAPHY")),
      StructField("plain", StringType),
      StructField("notstring", LongType, nullable = true, md("GEOGRAPHY")), // tag ignored off-string
      StructField("nested", StructType(Seq(
        StructField("inner", StringType, nullable = true, md("DATETIME")))))))
    val json = WarehouseSchema.schemaJson(schema)
    assert(json.contains(""""name":"t","type":"TIME""""))
    assert(json.contains(""""name":"dt","type":"DATETIME""""))
    assert(json.contains(""""name":"g","type":"GEOGRAPHY""""))
    assert(json.contains(""""name":"plain","type":"STRING""""))
    assert(json.contains(""""name":"notstring","type":"INTEGER""""))
    assert(json.contains(""""name":"inner","type":"DATETIME"""")) // tag carried into nested records
  }

  test("reserved field name 'f' rejected (StructToTableRowConverter.java:43-45)") {
    intercept[IllegalArgumentException] {
      WarehouseSchema.schemaJson(StructType(Seq(StructField("f", LongType))))
    }
  }
}
