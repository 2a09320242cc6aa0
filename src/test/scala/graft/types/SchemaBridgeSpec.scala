package graft.types

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Generative round-trip tests playing the reference's
  * `DummyGenericRecordGenerator` role (FIXTURES.md §4): random schemas
  * from the same type alphabet, random rows with ~20% null rate, assert
  * schema and value round-trips through the Avro bridge. Sampling is
  * seed-pinned (no scalatestplus bridge in the offline cache). */
class SchemaBridgeSpec extends SparkSpec {

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 40).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    (1 to 40).foreach { i =>
      body(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    }

  private val scalarGen: Gen[DataType] = Gen.oneOf(
    BooleanType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BinaryType, DateType, TimestampType, DecimalType(38, 9))

  private val fieldTypeGen: Gen[DataType] = Gen.frequency(
    6 -> scalarGen,
    2 -> scalarGen.map(ArrayType(_, containsNull = true)),
    1 -> scalarGen.map(t => StructType(Seq(
      StructField("n1", t), StructField("n2", StringType)))))

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 8)
    types <- Gen.listOfN(n, fieldTypeGen)
  } yield StructType(types.zipWithIndex.map { case (t, i) =>
    StructField(s"f$i", t, nullable = true)
  })

  test("schema round-trip: toSpark(toAvro(st)) preserves structure") {
    forAll(schemaGen) { st =>
      val back = SchemaBridge.toSpark(SchemaBridge.toAvro(st))
      assert(back.fields.length === st.fields.length)
      back.fields.zip(st.fields).foreach { case (b, o) =>
        assert(b.name === o.name)
        assert(normalize(b.dataType) === normalize(o.dataType), s"field ${o.name}")
      }
    }
  }

  // avro collapses some Spark distinctions by design — normalize both sides
  private def normalize(dt: DataType): DataType = dt match {
    case TimestampNTZType => TimestampType
    case ArrayType(e, _) => ArrayType(normalize(e), containsNull = true)
    case StructType(fs) => StructType(fs.map(f =>
      StructField(f.name, normalize(f.dataType), nullable = true)))
    case other => other
  }

  private def valueFor(dt: DataType, seed: Long): Any = dt match {
    case BooleanType => seed % 2 == 0
    case IntegerType => seed.toInt
    case LongType => seed
    case FloatType => seed.toFloat / 7f
    case DoubleType => seed.toDouble / 7d
    case StringType => s"s$seed"
    case BinaryType => Array[Byte]((seed % 127).toByte, 0, -1)
    case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(seed % 20000))
    case TimestampType =>
      val t = new java.sql.Timestamp((seed % 1600000000L) * 1000L)
      t.setNanos(((seed % 1000) * 1000000L + (seed % 1000) * 1000L).toInt)
      t
    case d: DecimalType => new java.math.BigDecimal(
      new java.math.BigInteger(seed.toString), d.scale)
    case ArrayType(e, _) => (0 until 3).map(i =>
      if ((seed + i) % 5 == 0) null else valueFor(e, seed + i))
    case StructType(fs) => Row.fromSeq(fs.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      valueFor(f.dataType, seed + i)
    })
    case _ => null
  }

  test("row round-trip: recordToRow(rowToRecord(r)) == r incl. nulls") {
    forAll(schemaGen, Gen.choose(1L, 1000000L)) { (st, seed) =>
      val avro = SchemaBridge.toAvro(st)
      val row = Row.fromSeq(st.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        if ((seed + i) % 5 == 0) null else valueFor(f.dataType, seed + i) // ~20% nulls
      })
      val back = SchemaBridge.recordToRow(SchemaBridge.rowToRecord(row, st, avro), st)
      st.fields.toIndexedSeq.zipWithIndex.foreach { case (f, i) =>
        assertSame(row.get(i), back.get(i), f.dataType, f.name)
      }
    }
  }

  test("TIME logical types: ISO local-time strings, exact round-trip") {
    import org.apache.avro.{LogicalTypes, Schema}
    val tMillis = LogicalTypes.timeMillis().addToSchema(Schema.create(Schema.Type.INT))
    val tMicros = LogicalTypes.timeMicros().addToSchema(Schema.create(Schema.Type.LONG))
    val rec = Schema.createRecord("r", null, "graft", false, java.util.List.of(
      new Schema.Field("tm", tMillis, null, null),
      new Schema.Field("tu", tMicros, null, null)))
    val st = SchemaBridge.toSpark(rec)
    assert(st("tm").dataType === StringType)
    assert(st("tm").metadata.getString(SchemaBridge.AvroLogicalKey) === "time-millis")
    assert(st("tm").metadata.getString(SchemaBridge.SqlTypeKey) === "TIME")
    assert(st("tu").dataType === StringType)
    assert(st("tu").metadata.getString(SchemaBridge.AvroLogicalKey) === "time-micros")

    val secOfDay = 10 * 3600 + 15 * 60 + 30
    val millis = secOfDay * 1000 + 500            // 10:15:30.500
    val micros = secOfDay.toLong * 1000000L + 123456L // 10:15:30.123456
    val r = new org.apache.avro.generic.GenericRecordBuilder(rec)
      .set("tm", Int.box(millis)).set("tu", Long.box(micros)).build()
    val row = SchemaBridge.recordToRow(r, st)
    assert(row.getString(0) === "10:15:30.500")
    assert(row.getString(1) === "10:15:30.123456")

    // write path: metadata restores the int/long logical-type encoding
    val back = SchemaBridge.toAvro(st)
    assert(SchemaBridge.unnest(back.getField("tm").schema())._1
      .getLogicalType.getName === "time-millis")
    assert(SchemaBridge.unnest(back.getField("tu").schema())._1
      .getLogicalType.getName === "time-micros")
    val r2 = SchemaBridge.rowToRecord(row, st, back)
    assert(r2.get("tm") === Int.box(millis))
    assert(r2.get("tu") === Long.box(micros))
  }

  test("DATETIME/GEOGRAPHY sqlType prop passes through both directions") {
    import org.apache.avro.Schema
    val dts = Schema.create(Schema.Type.STRING); dts.addProp("sqlType", "DATETIME")
    val geo = Schema.create(Schema.Type.STRING); geo.addProp("sqlType", "GEOGRAPHY")
    val rec = Schema.createRecord("r", null, "graft", false, java.util.List.of(
      new Schema.Field("dt", dts, null, null),
      new Schema.Field("g", geo, null, null),
      new Schema.Field("s", Schema.create(Schema.Type.STRING), null, null)))
    val st = SchemaBridge.toSpark(rec)
    assert(st("dt").metadata.getString(SchemaBridge.SqlTypeKey) === "DATETIME")
    assert(st("g").metadata.getString(SchemaBridge.SqlTypeKey) === "GEOGRAPHY")
    assert(!st("s").metadata.contains(SchemaBridge.SqlTypeKey))
    val back = SchemaBridge.toAvro(st)
    assert(SchemaBridge.unnest(back.getField("dt").schema())._1.getProp("sqlType") === "DATETIME")
    assert(SchemaBridge.unnest(back.getField("g").schema())._1.getProp("sqlType") === "GEOGRAPHY")
    assert(SchemaBridge.unnest(back.getField("s").schema())._1.getProp("sqlType") === null)
  }

  private def assertSame(a: Any, b: Any, dt: DataType, name: String): Unit = (a, b) match {
    case (null, null) => ()
    case (x: Array[Byte], y: Array[Byte]) => assert(x.sameElements(y), name)
    case (x: Seq[_], y: Seq[_]) =>
      assert(x.length === y.length, name)
      val et = dt.asInstanceOf[ArrayType].elementType
      x.zip(y).foreach { case (xe, ye) => assertSame(xe, ye, et, name) }
    case (x: Row, y: Row) =>
      val fs = dt.asInstanceOf[StructType].fields
      fs.toIndexedSeq.zipWithIndex.foreach { case (f, i) =>
        assertSame(x.get(i), y.get(i), f.dataType, s"$name.${f.name}")
      }
    case (x, y) => assert(x === y, name)
  }
}
