package graft.generate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven random data generator (reference S6 — the largest single
  * component, `/root/reference/src/main/java/com/mercari/solution/
  * transforms/DummyToMutation.java`, 752 LoC).
  *
  * Reference semantics reproduced:
  *  - `parallelNum` fan-out with contiguous id-range slices per worker
  *    (`:281-287`) → `spark.range(0, count, 1, parallelNum)`: the id
  *    IS the slice, no re-key + GroupByKey needed
  *  - per-table `randomRate` (null %, default 20 `:50`) and per-field
  *    `[min,max]` / value-list ranges (`Config`, `:323-368`)
  *  - primary keys never null and sequential-from-id (`:469,507,546`):
  *    INT64 pk = id, DATE pk = startDate + id days, TIMESTAMP pk =
  *    start + id seconds, STRING pk = uuid-shaped (`:450-488`)
  *  - typed generators (`DummyGenerator.of`, `:403-427`): string uuid²/
  *    value-list, bytes sha512-of-id, int64/float64 uniform in range,
  *    bool, date/timestamp uniform in range, array of 10 elements
  *    (`:722-751`, no nested arrays)
  *
  * Everything is `spark.range` + column expressions — zero driver-side
  * loops, so generating 10^12 rows is the same plan as 10^3 (SURVEY
  * §7.5). Randomness is `rand(seed)` (deterministic per seed + id
  * ordering); where cross-engine reproducibility is needed (the DuckDB
  * oracle), the deterministic md5-derived variants in
  * [[deterministicColumn]] are used instead.
  */
object DummyGen {

  final case class FieldRange(values: Seq[String]) // [min,max] or value list
  final case class TableConfig(
      table: String,
      count: Long,
      randomRate: Int = 20, // null %
      fields: Map[String, FieldRange] = Map.empty,
      primaryKeys: Seq[String] = Seq.empty)

  /** Parse the reference's YAML config subset
    * (`src/test/resources/dummy_table_example.yaml` shape):
    * {{{
    * tables:
    *   - table: mytable
    *     count: 1000
    *     randomRate: 20
    *     fields:
    *       stringField: [A, B, C]
    *       intField: [1, 10]
    * }}}
    * A tiny purpose-built parser — no YAML dependency exists in the
    * build, and the shape is fixed. */
  def parseYaml(yaml: String): Seq[TableConfig] = {
    val tables = scala.collection.mutable.ArrayBuffer[TableConfig]()
    var cur: TableConfig = null
    var inFields = false
    yaml.linesIterator.map(_.replaceAll("#.*$", "")).filter(_.trim.nonEmpty).foreach { line =>
      val t = line.trim
      val indent = line.takeWhile(_ == ' ').length
      if (t.startsWith("- table:")) {
        if (cur != null) tables += cur
        cur = TableConfig(t.stripPrefix("- table:").trim, 0L)
        inFields = false
      } else if (t == "tables:") { ()
      } else if (t == "fields:") { inFields = true
      } else if (cur != null && t.contains(":")) {
        val Array(k, v) = t.split(":", 2).map(_.trim)
        if (inFields && indent >= 6) {
          val vals = v.stripPrefix("[").stripSuffix("]").split(",").map(_.trim).toSeq
          cur = cur.copy(fields = cur.fields + (k -> FieldRange(vals)))
        } else {
          inFields = false
          k match {
            case "count" => cur = cur.copy(count = v.toLong)
            case "randomRate" => cur = cur.copy(randomRate = v.toInt)
            case "primaryKeys" =>
              cur = cur.copy(primaryKeys =
                v.stripPrefix("[").stripSuffix("]").split(",").map(_.trim).toSeq)
            case _ => ()
          }
        }
      }
    }
    if (cur != null) tables += cur
    tables.toSeq
  }

  private val EpochDay = to_date(lit("1970-01-01"))

  /** Random value expression for one field (reference `DummyGenerator.of`
    * dispatch). `seed` feeds `rand` so runs are reproducible. */
  def randomColumn(f: StructField, range: Option[FieldRange],
                   isPk: Boolean, nullRate: Int, seed: Long): Column = {
    val r = rand(seed + f.name.hashCode)
    val v: Column = f.dataType match {
      case LongType | IntegerType =>
        if (isPk) col("id")
        else range match {
          case Some(FieldRange(Seq(mn, mx))) =>
            (floor(r * (mx.toLong - mn.toLong + 1)) + mn.toLong).cast("long")
          case _ => floor(r * 1000000L).cast("long")
        }
      case DoubleType | FloatType =>
        range match {
          case Some(FieldRange(Seq(mn, mx))) if mn.matches("-?[0-9.]+") =>
            (r * (mx.toDouble - mn.toDouble) + mn.toDouble)
          case _ => r * 1000000.0
        }
      case StringType =>
        range match {
          case Some(FieldRange(vs)) if vs.nonEmpty && !isPk =>
            element_at(array(vs.map(lit): _*), (floor(r * vs.size) + 1).cast("int"))
          case _ =>
            // uuid² in the reference (`:450-488`); deterministic uuid-shape here
            concat_ws("-",
              substring(md5(concat(lit(seed.toString), col("id").cast("string"), lit(f.name))), 1, 8),
              substring(md5(concat(lit(seed.toString), col("id").cast("string"), lit(f.name))), 9, 4),
              substring(md5(concat(lit(seed.toString), col("id").cast("string"), lit(f.name))), 13, 4),
              substring(md5(concat(lit(seed.toString), col("id").cast("string"), lit(f.name))), 17, 4),
              substring(md5(concat(lit(seed.toString), col("id").cast("string"), lit(f.name))), 21, 12))
        }
      case BinaryType =>
        unbase64(base64(sha2(col("id").cast("string"), 512).cast("binary")))
      case BooleanType => r > 0.5
      case DateType =>
        val (start, end) = range match {
          case Some(FieldRange(Seq(a, b))) => (a, b)
          case _ => ("2014-01-01", "2018-01-01")
        }
        if (isPk) date_add(to_date(lit(start)), col("id").cast("int"))
        else {
          val span = datediff(to_date(lit(end)), to_date(lit(start))) + 1
          date_add(to_date(lit(start)), floor(r * span).cast("int"))
        }
      case TimestampType =>
        val (start, end) = range match {
          case Some(FieldRange(Seq(a, b))) => (a, b)
          case _ => ("2018-01-01T00:00:00", "2019-01-01T00:00:00")
        }
        val s = to_timestamp(lit(start.replace("T", " ")))
        val e = to_timestamp(lit(end.replace("T", " ")))
        if (isPk) timestamp_seconds(unix_seconds(s) + col("id"))
        else timestamp_seconds(
          (unix_seconds(s) + floor(r * (unix_seconds(e) - unix_seconds(s)))).cast("long"))
      case ArrayType(et, _) =>
        // 10 elements of the element generator; no nested arrays (`:747-749`)
        transform(sequence(lit(1), lit(10)),
          i => randomElement(et, r * (i.cast("double") / 10.0 + 1.0)))
      case _ => lit(null)
    }
    if (isPk) v
    else when(rand(seed + f.name.hashCode + 1) < nullRate / 100.0, lit(null)).otherwise(v)
  }

  private def randomElement(dt: DataType, r: Column): Column = dt match {
    case LongType | IntegerType => floor(r % 1.0 * 1000000L).cast("long")
    case DoubleType | FloatType => r % 1.0 * 1000000.0
    case StringType => md5(r.cast("string"))
    case BooleanType => r % 1.0 > 0.5
    case DateType => date_add(EpochDay, (floor(r % 1.0 * 20000)).cast("int"))
    case TimestampType => timestamp_seconds(floor(r % 1.0 * 1600000000L).cast("long"))
    case _ => lit(null)
  }

  /** Generate `conf.count` rows of `schema` with `parallelNum` range
    * partitions (the reference's worker fan-out). */
  def generate(spark: SparkSession, schema: StructType, conf: TableConfig,
               parallelNum: Int = 1, seed: Long = 42L): DataFrame = {
    val base = spark.range(0L, conf.count, 1L, parallelNum)
    val cols = schema.fields.toIndexedSeq.map { f =>
      randomColumn(f, conf.fields.get(f.name),
        conf.primaryKeys.contains(f.name), conf.randomRate, seed).as(f.name)
    }
    base.select(cols: _*)
  }

  /** Deterministic (cross-engine reproducible) columns used by the
    * DuckDB-oracle generator query: everything derives from `id` through
    * md5 — no `rand`. */
  def deterministicColumn(name: String, dt: DataType): Column = {
    val h = md5(concat(col("id").cast("string"), lit("|"), lit(name)))
    val d0 = instr(lit("0123456789abcdef"), substring(h, 1, 1)) - 1
    val d1 = instr(lit("0123456789abcdef"), substring(h, 2, 1)) - 1
    dt match {
      case LongType => (d0 * 16 + d1).cast("long")
      case StringType => h
      case BooleanType => (d0 % 2 === 1)
      case DateType => date_add(EpochDay, (d0 * 16 + d1).cast("int"))
      case _ => h
    }
  }
}
