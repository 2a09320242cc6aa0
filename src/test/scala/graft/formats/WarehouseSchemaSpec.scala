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

  test("reserved field name 'f' rejected (StructToTableRowConverter.java:43-45)") {
    intercept[IllegalArgumentException] {
      WarehouseSchema.schemaJson(StructType(Seq(StructField("f", LongType))))
    }
  }
}
