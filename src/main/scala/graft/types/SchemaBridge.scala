package graft.types

import scala.jdk.CollectionConverters._
import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro `Schema` ⇄ Spark `StructType` bridge + row converters (reference
  * converter P13, `/root/reference/src/main/java/com/mercari/solution/
  * util/AvroSchemaUtil.java:27-352`), built directly on avro-core (no
  * spark-avro module exists in this build).
  *
  * Conventions preserved from the reference:
  *  - nullable field = union(null, T), unwrapped on read
  *    (`unnestUnion`, `AvroSchemaUtil.java:199-207`)
  *  - decimal = bytes + decimal(38,9) logical type (`:63,75`)
  *  - date = int epoch-days, timestamp = long timestamp-micros (the
  *    reference's millis truncation at `StructToRecordConverter.java:86`
  *    is a documented bug, NOT replicated — SURVEY §7.5)
  *  - enum collapses to string (`RecordToStructConverter.java:78-80`)
  *  - map keys are strings
  *  - TIME logical types (`time-millis`/`time-micros`) render as ISO
  *    local-time STRINGS (`RecordToStructConverter.java:243-249`,
  *    `RecordToTableRowConverter.java:259-262`), with the original
  *    logical type kept in field metadata (`avroLogical`) so the write
  *    path round-trips the int/long encoding exactly
  *  - `sqlType` string prop (DATETIME/GEOGRAPHY, `AvroSchemaUtil.java:169-191`)
  *    passes through as a `sqlType` field-metadata tag both directions
  */
object SchemaBridge {

  /** Field-metadata keys carrying avro-side type info that Spark's type
    * system can't express natively. */
  val AvroLogicalKey = "avroLogical"
  val SqlTypeKey = "sqlType"

  private def isTime(lt: org.apache.avro.LogicalType): Boolean =
    lt != null && (lt.getName == "time-millis" || lt.getName == "time-micros")

  // ---- StructType -> avro Schema ----
  def toAvro(st: StructType, name: String = "record", ns: String = "graft"): Schema = {
    val fields = st.fields.toIndexedSeq.map { f =>
      val base =
        if (f.metadata.contains(AvroLogicalKey) && f.dataType == StringType)
          f.metadata.getString(AvroLogicalKey) match {
            case "time-millis" =>
              LogicalTypes.timeMillis().addToSchema(Schema.create(Schema.Type.INT))
            case "time-micros" =>
              LogicalTypes.timeMicros().addToSchema(Schema.create(Schema.Type.LONG))
            case other =>
              throw new IllegalArgumentException(s"unknown $AvroLogicalKey: $other")
          }
        else {
          val b = typeToAvro(f.dataType, s"${name}_${f.name}", ns)
          // DATETIME/GEOGRAPHY travel as a string prop on the avro schema
          // (AvroSchemaUtil.java:169-191,220-227)
          if (f.metadata.contains(SqlTypeKey) && f.dataType == StringType)
            b.addProp(SqlTypeKey, f.metadata.getString(SqlTypeKey))
          b
        }
      val sch = if (f.nullable) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, sch, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, ns, false, fields.asJava)
  }

  private def typeToAvro(dt: DataType, name: String, ns: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType | TimestampNTZType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      val e = typeToAvro(et, s"${name}_item", ns)
      Schema.createArray(if (containsNull)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), e)) else e)
    case st: StructType => toAvro(st, name, ns)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = typeToAvro(vt, s"${name}_value", ns)
      Schema.createMap(if (valueContainsNull)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), v)) else v)
    case other =>
      throw new IllegalArgumentException(s"unsupported Spark type for avro: $other")
  }

  // ---- avro Schema -> StructType ----
  /** `unnestUnion` (`AvroSchemaUtil.java:199-207`). */
  def unnest(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      (nonNull.head, nonNull.size < s.getTypes.size)
    } else (s, false)

  def toSpark(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"not a record: $schema")
    StructType(schema.getFields.asScala.toIndexedSeq.map { f =>
      val (s, nullable) = unnest(f.schema())
      val mb = new MetadataBuilder()
      if (isTime(s.getLogicalType)) {
        mb.putString(AvroLogicalKey, s.getLogicalType.getName)
        mb.putString(SqlTypeKey, "TIME")
      }
      Option(s.getProp(SqlTypeKey)).foreach(mb.putString(SqlTypeKey, _))
      StructField(f.name(), avroToType(s), nullable, mb.build())
    })
  }

  private def avroToType(s: Schema): DataType = {
    val lt = s.getLogicalType
    s.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT =>
        if (lt != null && lt.getName == "date") DateType
        else if (isTime(lt)) StringType // ISO local-time rendering
        else IntegerType
      case Schema.Type.LONG => lt match {
        case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis => TimestampType
        case _ if isTime(lt) => StringType // time-micros → ISO local-time
        case _ => LongType
      }
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING | Schema.Type.ENUM => StringType // enum → string
      case Schema.Type.BYTES | Schema.Type.FIXED => lt match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
      case Schema.Type.ARRAY =>
        val (e, n) = unnest(s.getElementType)
        ArrayType(avroToType(e), containsNull = n)
      case Schema.Type.MAP =>
        val (v, n) = unnest(s.getValueType)
        MapType(StringType, avroToType(v), valueContainsNull = n)
      case Schema.Type.RECORD => toSpark(s)
      case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
    }
  }

  // ---- TIME value rendering (ISO local-time string ⇄ int millis / long micros) ----
  /** `LocalTime.toString` form, as the reference renders TIME
    * (`RecordToStructConverter.java:243-249`): `HH:mm`, `HH:mm:ss`, or
    * `HH:mm:ss.fff...` with trailing zero groups trimmed. */
  private def timeToString(v: Any, logical: String): String = {
    val nanos = logical match {
      case "time-millis" => v.asInstanceOf[Number].longValue() * 1000000L
      case "time-micros" => v.asInstanceOf[Number].longValue() * 1000L
    }
    java.time.LocalTime.ofNanoOfDay(nanos).toString
  }
  private def timeFromString(s: String, logical: String): AnyRef = {
    val lt = java.time.LocalTime.parse(s)
    logical match {
      case "time-millis" => Int.box((lt.toNanoOfDay / 1000000L).toInt)
      case "time-micros" => Long.box(lt.toNanoOfDay / 1000L)
    }
  }

  // ---- Row -> GenericRecord ----
  def rowToRecord(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val b = new GenericRecordBuilder(avro)
    st.fields.toIndexedSeq.zipWithIndex.foreach { case (f, i) =>
      val fieldSchema = unnest(avro.getFields.get(i).schema())._1
      val v =
        if (row.isNullAt(i)) null
        else if (f.metadata.contains(AvroLogicalKey) && f.dataType == StringType)
          timeFromString(row.getString(i), f.metadata.getString(AvroLogicalKey))
        else toAvroValue(row.get(i), f.dataType, fieldSchema)
      b.set(f.name, v)
    }
    b.build()
  }

  private def toAvroValue(v: Any, dt: DataType, s: Schema): AnyRef = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType | StringType =>
      v.asInstanceOf[AnyRef]
    case ByteType => Int.box(v.asInstanceOf[Byte].toInt)
    case ShortType => Int.box(v.asInstanceOf[Short].toInt)
    case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case DateType => Int.box(v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
    case TimestampType =>
      val t = v.asInstanceOf[java.sql.Timestamp]
      Long.box(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)
    case TimestampNTZType =>
      // NTZ wall-clock micros == UTC micros under the project's UTC-
      // session convention (same contract as TableCatalog's NTZ cast);
      // reads come back as timestamp-micros -> TimestampType
      val ldt = v.asInstanceOf[java.time.LocalDateTime]
      Long.box(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L)
    case d: DecimalType =>
      val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
      java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
    case ArrayType(et, _) =>
      val (es, _) = unnest(s.getElementType)
      val list = new java.util.ArrayList[AnyRef]()
      v.asInstanceOf[scala.collection.Seq[Any]].foreach { e =>
        list.add(if (e == null) null else toAvroValue(e, et, es))
      }
      list
    case st: StructType => rowToRecord(v.asInstanceOf[Row], st, s)
    case MapType(StringType, vt, _) =>
      val (vs, _) = unnest(s.getValueType)
      val m = new java.util.HashMap[String, AnyRef]()
      v.asInstanceOf[scala.collection.Map[String, Any]].foreach { case (k, e) =>
        m.put(k, if (e == null) null else toAvroValue(e, vt, vs))
      }
      m
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  // ---- GenericRecord -> Row ----
  def recordToRow(rec: GenericRecord, st: StructType): Row = {
    val vals = st.fields.toIndexedSeq.map { f =>
      val v = rec.get(f.name)
      if (v == null) null
      else if (f.metadata.contains(AvroLogicalKey) && f.dataType == StringType)
        timeToString(v, f.metadata.getString(AvroLogicalKey))
      else fromAvroValue(v, f.dataType)
    }
    Row.fromSeq(vals)
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = dt match {
    case StringType => v.toString // Utf8 / enum symbol → String
    case BinaryType => v match {
      case bb: java.nio.ByteBuffer =>
        val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
      case f: GenericData.Fixed => f.bytes()
      case other => other
    }
    case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
      v.asInstanceOf[Number].longValue()))
    case TimestampType =>
      val micros = v.asInstanceOf[Number].longValue()
      val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
      t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      t
    case d: DecimalType =>
      val bytes = fromAvroValue(v, BinaryType).asInstanceOf[Array[Byte]]
      new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
    case ArrayType(et, _) =>
      v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
        .map(e => if (e == null) null else fromAvroValue(e, et))
    case st: StructType => recordToRow(v.asInstanceOf[GenericRecord], st)
    case MapType(StringType, vt, _) =>
      v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, e) =>
        k.toString -> (if (e == null) null else fromAvroValue(e, vt))
      }.toMap
    case _ => v
  }
}
