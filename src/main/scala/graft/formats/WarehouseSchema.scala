package graft.formats

import org.apache.spark.sql.types._

/** Warehouse (BigQuery-style) schema JSON derivation from a Spark schema
  * — the schema side of reference converters P5/P6
  * (`/root/reference/src/main/java/com/mercari/solution/util/converter/
  * StructToTableRowConverter.java:59-68,148-177`):
  *
  *  - every scalar field NULLABLE, arrays REPEATED (`:148-177`)
  *  - type map BOOLEAN/INTEGER/FLOAT/STRING/BYTES/DATE/TIMESTAMP/
  *    NUMERIC/RECORD; maps emit as repeated {key, value} RECORDs
  *    (`RecordToTableRowConverter.java:190-194,282-288`)
  *  - reserved-name guard: a top-level field named `f` is rejected
  *    (`StructToTableRowConverter.java:43-45`)
  */
object WarehouseSchema {

  def typeName(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType | ShortType | IntegerType | LongType => "INTEGER"
    case FloatType | DoubleType => "FLOAT"
    case StringType => "STRING"
    case BinaryType => "BYTES"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case _: DecimalType => "NUMERIC"
    case _: StructType | _: MapType => "RECORD"
    case ArrayType(e, _) => typeName(e)
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  /** STRING-backed warehouse types carried via the `sqlType` metadata tag
    * (see [[graft.types.SchemaBridge]]): TIME, DATETIME, GEOGRAPHY render
    * as their own warehouse type, not STRING
    * (`RecordToTableRowConverter.java:259-262,271-274`,
    * `AvroSchemaUtil.java:169-191`). */
  private val taggedStringTypes = Set("TIME", "DATETIME", "GEOGRAPHY")

  private def fieldJson(name: String, dt: DataType, metadata: Metadata = Metadata.empty): String = {
    val (mode, inner) = dt match {
      case ArrayType(e, _) => ("REPEATED", e)
      case other => ("NULLABLE", other)
    }
    val sub = inner match {
      case st: StructType => s""","fields":[${st.fields.map(f => fieldJson(f.name, f.dataType, f.metadata)).mkString(",")}]"""
      case MapType(_, vt, _) =>
        s""","fields":[${fieldJson("key", StringType)},${fieldJson("value", vt)}]"""
      case _ => ""
    }
    // maps are repeated {key,value} records regardless of declared mode
    val actualMode = inner match {
      case _: MapType => "REPEATED"
      case _ => mode
    }
    val tn =
      if (inner == StringType && metadata.contains("sqlType") &&
          taggedStringTypes.contains(metadata.getString("sqlType")))
        metadata.getString("sqlType")
      else typeName(inner)
    s"""{"name":"$name","type":"$tn","mode":"$actualMode"$sub}"""
  }

  /** Schema JSON for `withSchemaFromView`-style consumers. */
  def schemaJson(schema: StructType): String = {
    require(!schema.fieldNames.contains("f"),
      "field name 'f' is reserved in the warehouse row format " +
        "(StructToTableRowConverter.java:43-45)")
    s"""{"fields":[${schema.fields.map(f => fieldJson(f.name, f.dataType, f.metadata)).mkString(",")}]}"""
  }
}
