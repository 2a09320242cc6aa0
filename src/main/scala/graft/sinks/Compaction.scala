package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-files compaction for parquet directories — the maintenance pass
  * every long-lived 100 TB table needs: streaming appends, per-micro-batch
  * upserts, and dynamic-destination sinks all accrete files far smaller
  * than one scan split, and a million 1 MB files costs more in listing,
  * scheduling, and row-group overhead than the same bytes in 8k
  * right-sized files (this is `OPTIMIZE`/`rewrite_data_files` in
  * lakehouse table formats).
  *
  * Shape: one read of the directory coalesced to
  * `ceil(totalBytes / targetBytes)` output files — `coalesce` (not
  * `repartition`) so compaction is a NARROW rewrite, no shuffle of the
  * data — staged to a sibling directory and swapped in by rename, the
  * same atomic-swap discipline as [[graft.mutate.UpsertWriter]]: readers
  * never observe a partial table. Row content/order within files is
  * whatever the coalesced scan yields; compaction is a physical-layout
  * operation and must be content-neutral (spec-asserted, and the sink
  * gate's oracle hash-checks the round-trip).
  */
object Compaction {

  /** (files, bytes) before → after; `skipped` = already compact. */
  final case class Result(filesBefore: Int, filesAfter: Int,
                          bytes: Long, skipped: Boolean)

  def compactParquet(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L << 20): Result = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).filter { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    val total = parts.map(_.getLen).sum
    val want = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    if (parts.length <= want)
      return Result(parts.length, parts.length, total, skipped = true)
    val staging = dir + "__compacting"
    spark.read.parquet(dir).coalesce(want)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    fs.delete(p, true)
    fs.rename(new Path(staging), p)
    val after = fs.listStatus(p)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    Result(parts.length, after, total, skipped = false)
  }
}
