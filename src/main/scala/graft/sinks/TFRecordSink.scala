package graft.sinks

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32C, GZIPOutputStream}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord sink (reference K3 + converter P8): rows → `tf.train.Example`
  * protos → TFRecord-framed, GZIP-compressed `.tfrecord` files, split by
  * an optional key field.
  *
  * Reference semantics reproduced (`/root/reference/src/main/java/com/
  * mercari/solution/util/converter/RecordToTFRecordConverter.java`):
  *  - nested records flatten with `parent_child` underscore naming
  *    (`:155-176`)
  *  - STRING/BYTES → bytes_list; FLOAT/DOUBLE/decimal → float_list;
  *    INT/LONG/BOOL → int64_list with bool as 0/1 (`:90`); date →
  *    int64 epoch-days; timestamp → int64 epoch-micros; MAP/null dropped
  *  - GZIP + `.tfrecord` suffix (`templates/BigQueryToTFRecord.java:98-105`)
  *
  * Implementation notes: the Example wire format is tiny (three nested
  * length-delimited messages), so it is encoded directly against the
  * protobuf wire spec — no protobuf dependency, no reflection, and the
  * encoder runs per-partition inside `mapPartitions` (the one place
  * SURVEY §2.7 sanctions imperative per-row code). TFRecord framing is
  * the TensorFlow spec: u64-LE length, masked crc32c(length), payload,
  * masked crc32c(payload), with `java.util.zip.CRC32C`.
  *
  * Scale: one output file per (split key × input partition) — writers
  * stream row-by-row per partition with no driver involvement and no
  * shuffle beyond the optional repartition on the split key.
  */
object TFRecordSink {

  final case class Config(
      output: String, // path prefix → <prefix><key>[-part].tfrecord
      splitField: Option[String] = None,
      gzip: Boolean = true,
      outputNotify: Option[String] = None)

  // ---- protobuf wire-format primitives ----
  private def writeVarint(o: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }
  private def tag(field: Int, wire: Int): Int = (field << 3) | wire
  private def writeBytesField(o: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    o.write(tag(field, 2)); writeVarint(o, b.length.toLong); o.write(b)
  }

  /** Feature message: oneof {1: BytesList, 2: FloatList, 3: Int64List},
    * each a message with repeated field 1. */
  private def bytesListFeature(vs: Seq[Array[Byte]]): Array[Byte] = {
    val list = new ByteArrayOutputStream()
    vs.foreach(v => writeBytesField(list, 1, v))
    val f = new ByteArrayOutputStream()
    writeBytesField(f, 1, list.toByteArray)
    f.toByteArray
  }
  private def floatListFeature(vs: Seq[Float]): Array[Byte] = {
    val packed = new ByteArrayOutputStream() // packed repeated float
    val bb = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach { v => bb.clear(); bb.putFloat(v); packed.write(bb.array(), 0, 4) }
    val list = new ByteArrayOutputStream()
    writeBytesField(list, 1, packed.toByteArray)
    val f = new ByteArrayOutputStream()
    writeBytesField(f, 2, list.toByteArray)
    f.toByteArray
  }
  private def int64ListFeature(vs: Seq[Long]): Array[Byte] = {
    val packed = new ByteArrayOutputStream() // packed repeated varint
    vs.foreach(writeVarint(packed, _))
    val list = new ByteArrayOutputStream()
    writeBytesField(list, 1, packed.toByteArray)
    val f = new ByteArrayOutputStream()
    writeBytesField(f, 3, list.toByteArray)
    f.toByteArray
  }

  /** Example{ features(1) = Features{ feature(1) = map<string,Feature> } }. */
  private def example(features: Seq[(String, Array[Byte])]): Array[Byte] = {
    val fmap = new ByteArrayOutputStream()
    features.foreach { case (name, feat) =>
      val entry = new ByteArrayOutputStream() // MapEntry{1: key, 2: value}
      writeBytesField(entry, 1, name.getBytes("UTF-8"))
      writeBytesField(entry, 2, feat)
      writeBytesField(fmap, 1, entry.toByteArray)
    }
    val ex = new ByteArrayOutputStream()
    writeBytesField(ex, 1, fmap.toByteArray)
    ex.toByteArray
  }

  // ---- TFRecord framing ----
  private def maskedCrc(b: Array[Byte]): Int = {
    val c = new CRC32C(); c.update(b, 0, b.length)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }
  def frame(payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + payload.length + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val len = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(payload.length.toLong).array()
    bb.put(len).putInt(maskedCrc(len)).put(payload).putInt(maskedCrc(payload))
    bb.array()
  }

  /** Recursive `parent_child` flatten of nested structs (P8 `:155-176`);
    * maps and nulls are dropped per the reference. */
  def flatten(df: DataFrame): DataFrame = {
    def cols(prefix: String, path: String, st: StructType): Seq[org.apache.spark.sql.Column] =
      st.fields.toIndexedSeq.flatMap { f =>
        val p = if (path.isEmpty) f.name else s"$path.${f.name}"
        val n = if (prefix.isEmpty) f.name else s"${prefix}_${f.name}"
        f.dataType match {
          case s: StructType => cols(n, p, s)
          case _: MapType => Seq.empty
          case _ => Seq(col(p).as(n))
        }
      }
    df.select(cols("", "", df.schema): _*)
  }

  /** Encode one (already flattened) row as a serialized Example. */
  def encodeRow(row: Row, schema: StructType): Array[Byte] = {
    val feats = schema.fields.toIndexedSeq.zipWithIndex.flatMap { case (f, i) =>
      if (row.isNullAt(i)) None
      else {
        def scalars[T](dt: DataType, v: Any): Option[Array[Byte]] = dt match {
          case StringType => Some(bytesListFeature(Seq(v.asInstanceOf[String].getBytes("UTF-8"))))
          case BinaryType => Some(bytesListFeature(Seq(v.asInstanceOf[Array[Byte]])))
          case FloatType => Some(floatListFeature(Seq(v.asInstanceOf[Float])))
          case DoubleType => Some(floatListFeature(Seq(v.asInstanceOf[Double].toFloat)))
          case d: DecimalType => Some(floatListFeature(Seq(v.asInstanceOf[java.math.BigDecimal].floatValue())))
          case BooleanType => Some(int64ListFeature(Seq(if (v.asInstanceOf[Boolean]) 1L else 0L)))
          case ByteType | ShortType | IntegerType | LongType =>
            Some(int64ListFeature(Seq(v.asInstanceOf[Number].longValue())))
          case DateType => Some(int64ListFeature(Seq(v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay)))
          case TimestampType =>
            // true epoch-micros (reference writes int64 micros): getTime is
            // millis, so recover the sub-millisecond digits from getNanos —
            // same math as SchemaBridge.toAvroValue.
            val t = v.asInstanceOf[java.sql.Timestamp]
            Some(int64ListFeature(Seq(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)))
          case _ => None
        }
        f.dataType match {
          case ArrayType(et, _) =>
            val vs = row.getSeq[Any](i).filter(_ != null)
            et match {
              case StringType => Some(bytesListFeature(vs.map(_.asInstanceOf[String].getBytes("UTF-8"))))
              case BinaryType => Some(bytesListFeature(vs.map(_.asInstanceOf[Array[Byte]])))
              case FloatType => Some(floatListFeature(vs.map(_.asInstanceOf[Float])))
              case DoubleType => Some(floatListFeature(vs.map(_.asInstanceOf[Double].toFloat)))
              case BooleanType => Some(int64ListFeature(vs.map(b => if (b.asInstanceOf[Boolean]) 1L else 0L)))
              case ByteType | ShortType | IntegerType | LongType =>
                Some(int64ListFeature(vs.map(_.asInstanceOf[Number].longValue())))
              case _ => None
            }
          case dt => scalars(dt, row.get(i))
        }
      }.map(f.name -> _)
    }
    example(feats)
  }

  /** Write: flatten → encode → frame → one gzip stream per partition per
    * split key. Returns the written file paths. */
  def write(df: DataFrame, conf: Config): Seq[String] = {
    val flat0 = flatten(df)
    val keyed = conf.splitField match {
      case Some(f) => flat0.withColumn("__split", coalesce(col(f).cast("string"), lit("")))
        .repartition(col("__split"))
      case None => flat0.withColumn("__split", lit(""))
    }
    val dataSchema = StructType(keyed.schema.fields.filter(_.name != "__split"))
    val outPrefix = conf.output
    val gzip = conf.gzip
    import df.sparkSession.implicits._
    // Stream rows sorted by key within each partition: one open file at a
    // time, O(1) memory per writer — no partition materialization.
    val files = keyed.sortWithinPartitions("__split").mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val fs = FileSystem.get(new Path(outPrefix).toUri,
        new org.apache.hadoop.conf.Configuration())
      val written = scala.collection.mutable.ArrayBuffer[String]()
      var curKey: String = null
      var out: java.io.OutputStream = null
      def roll(key: String): Unit = {
        if (out != null) out.close()
        val path = new Path(f"$outPrefix$key-p$pid%05d.tfrecord")
        val raw = fs.create(path, true)
        out = if (gzip) new GZIPOutputStream(raw) else raw
        written += path.toUri.getPath
        curKey = key
      }
      it.foreach { r =>
        val key = r.getAs[String]("__split")
        if (key != curKey || out == null) roll(key)
        val slim = Row.fromSeq(dataSchema.fieldNames.toIndexedSeq.map(n => r.getAs[Any](n)))
        out.write(frame(encodeRow(slim, dataSchema)))
      }
      if (out != null) out.close()
      written.iterator
    }.collect().toSeq.sorted
    conf.outputNotify.foreach { n =>
      val fs = FileSystem.get(new Path(n).toUri,
        df.sparkSession.sparkContext.hadoopConfiguration)
      val o = fs.create(new Path(n), true)
      o.write(files.mkString("\n").getBytes("UTF-8")); o.close()
    }
    files
  }
}
