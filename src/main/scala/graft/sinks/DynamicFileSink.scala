package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.formats.RowFormats

/** Dynamic-destination file sink (reference K1/K2/K8/K9): split output by
  * a field's value, name files `<prefix><key>.<type>` exactly, write an
  * optional header line, honor `withoutSharding`, then the finish pass —
  * concatenated path listing to `outputNotify` and an empty marker file
  * when nothing was written (`outputEmpty`).
  *
  * Reference behavior being reproduced (cites into `/root/reference/src/
  * main/java/com/mercari/solution/`):
  *  - split key = field value as string, null → "" (`templates/
  *    SpannerToText.java:119-122`)
  *  - exact naming `<prefix><key>.<type>` (`util/FixedFileNaming.java:
  *    27-34`); `withoutSharding` → one shard (`SpannerToText.java:126`)
  *  - header line written at file open (`transforms/sinks/TextDynamicSink
  *    .java:41-43`)
  *  - finish: path concat + notify + empty file (`transforms/
  *    WriteFilesFinishTransform.java:39-61`)
  *
  * Execution model: the data path is a standard distributed
  * `df.write.partitionBy("__split")` — one shuffle-free pass, any number
  * of executors. Only the finalize (rename to exact names, header
  * prepend, notify) is a driver-side filesystem pass over the COMMITTED
  * part files, which is O(#destinations), not O(rows) — the same split
  * the reference makes (Beam workers write, `WriteFilesFinish` runs once).
  */
object DynamicFileSink {

  /** `output` is a path prefix like `/dir/out` → files `/dir/out<KEY>.<fmt>`.
    *
    * `perKeySchema` (avro only) re-expresses the reference's per-
    * destination schema sampling (`transforms/StructToAvroTransform
    * .java:95-108` samples one struct per key and derives that key's
    * schema from it): each destination's record schema keeps only the
    * columns OBSERVED (non-null on at least one row) for that key,
    * computed in one aggregate pass over the keyed frame. Deterministic —
    * unlike a sampled element, the observed-field set does not depend on
    * which row a worker saw first. Off by default: one schema per query
    * result (SURVEY §7.3.4). */
  final case class Config(
      output: String,
      format: String = "json", // json | csv | avro
      splitField: Option[String] = None,
      header: Option[String] = None,
      withoutSharding: Boolean = false,
      outputNotify: Option[String] = None,
      outputEmpty: Boolean = false,
      perKeySchema: Boolean = false)

  final case class Result(files: Seq[String])

  private val SplitCol = "__split"

  def write(df: DataFrame, conf: Config): Result = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new Path(conf.output).toUri, hconf)
    val staging = new Path(conf.output + "__staging")
    fs.delete(staging, true)

    val keyed = conf.splitField match {
      case Some(f) => df.withColumn(SplitCol, // backtick-quote: a dotted
        // split-field name must resolve as a column, not a struct path
        coalesce(col("`" + f.replace("`", "``") + "`").cast("string"), lit("")))
      case None => df.withColumn(SplitCol, lit(""))
    }
    val sharded = if (conf.withoutSharding) keyed.coalesce(1) else keyed

    val suffix = conf.format.toLowerCase match {
      case "avro" => "avro"; case f => f
    }
    val written = scala.collection.mutable.ArrayBuffer[String]()

    conf.format.toLowerCase match {
      case "avro" =>
        // Per-destination schemas: one aggregate pass counts non-null
        // values per (key, column); a key's schema keeps the columns with
        // count > 0. O(#keys × #cols) reaches the driver — destination
        // metadata, not data.
        val perKeyFields: Map[String, Seq[String]] =
          if (!conf.perKeySchema) Map.empty
          else {
            val dataCols = keyed.schema.fieldNames.filter(_ != SplitCol).toSeq
            keyed.groupBy(col(SplitCol))
              .agg(count(lit(1)).as("__n"),
                dataCols.map(c => count(col(c)).as(c)): _*)
              .collect()
              .map { r =>
                r.getAs[String](SplitCol) ->
                  dataCols.filter(c => r.getAs[Long](c) > 0L)
              }.toMap
          }
        // AvroIO writes final per-(key × partition) files; collapse the
        // single-file-per-key case to the exact <prefix><key>.avro name.
        val files = graft.sources.AvroIO.writeKeyed(
          sharded, conf.output, conf.splitField.map(_ => SplitCol),
          perKeyFields = perKeyFields)
        files.groupBy(_._1).foreach { case (key, paths) =>
          if (paths.size == 1) {
            val dest = new Path(s"${conf.output}$key.avro")
            fs.delete(dest, false)
            fs.rename(new Path(paths.head._2), dest)
            written += dest.toUri.getPath
          } else written ++= paths.map(_._2)
        }
      case fmt =>
        val src = df.drop(SplitCol)
        sharded
          .select(col(SplitCol), RowFormats.line(src, fmt).as("value"))
          .write.mode(SaveMode.Overwrite).partitionBy(SplitCol)
          .text(staging.toString)
        // finalize: exact names + header + listing (driver-side, O(#files))
        val partDirs = Option(fs.listStatus(staging)).getOrElse(Array.empty)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(SplitCol + "="))
        for (dir <- partDirs) {
          val key = unescapePathName(dir.getPath.getName.stripPrefix(SplitCol + "="))
          val keyStr = if (key == "__HIVE_DEFAULT_PARTITION__") "" else key
          val parts = fs.listStatus(dir.getPath)
            .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
            .sortBy(_.getPath.getName)
          parts.zipWithIndex.foreach { case (p, i) =>
            val name =
              if (parts.length == 1) s"${conf.output}$keyStr.$suffix"
              else f"${conf.output}$keyStr-$i%05d.$suffix"
            val dest = new Path(name)
            fs.delete(dest, false)
            conf.header match {
              case Some(h) => prependHeader(fs, p.getPath, dest, h)
              case _ => fs.rename(p.getPath, dest)
            }
            written += dest.toUri.getPath
          }
        }
        fs.delete(staging, true)
    }

    // K8: empty-output marker
    if (written.isEmpty && conf.outputEmpty) {
      val dest = new Path(s"${conf.output}.$suffix")
      val out = fs.create(dest, true)
      conf.header.foreach(h => out.write((h + "\n").getBytes("UTF-8")))
      out.close()
      written += dest.toUri.getPath
    }
    // K8/K9: notification file with the path listing
    conf.outputNotify.foreach { n =>
      val out = fs.create(new Path(n), true)
      out.write(written.sorted.mkString("\n").getBytes("UTF-8"))
      out.close()
    }
    Result(written.toSeq.sorted)
  }

  /** Inverse of Hive's `escapePathName` (%XX only — unlike URLDecoder,
    * `+` stays literal). */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Copy `src` to `dest` with `header` as the first line. Only the
    * finalize pass pays this copy, mirroring the reference's header-at-
    * file-open semantics without breaking distributed commit. */
  private def prependHeader(fs: FileSystem, src: Path, dest: Path, header: String): Unit = {
    val out = fs.create(dest, true)
    out.write((header + "\n").getBytes("UTF-8"))
    val in = fs.open(src)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close(); out.close()
    fs.delete(src, false)
  }
}
