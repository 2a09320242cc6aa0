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
  * data — staged to a sibling directory and swapped in by two CHECKED
  * renames (retire live → promote staging), so the data always exists at
  * a recoverable path and readers can never observe a HALF-written
  * table; the retire-to-promote instant is the residual non-atomic
  * window a plain filesystem cannot close (a lakehouse format's
  * transactional commit is the production replacement for this seam).
  * Row content/order within files is whatever the coalesced scan yields;
  * compaction is a physical-layout operation and must be content-neutral
  * (spec-asserted, and the sink gate's oracle hash-checks the
  * round-trip).
  */
object Compaction {

  /** (files, bytes) before → after; `skipped` = already compact. */
  final case class Result(filesBefore: Int, filesAfter: Int,
                          bytes: Long, skipped: Boolean)

  /** Per-partition compaction of a `partitionBy` (hive-layout) table:
    * every `key=value` leaf directory is compacted independently with
    * [[compactParquet]] — the unit of rewrite IS the partition, so a
    * 100 TB table compacts as thousands of independent narrow jobs and a
    * failure leaves every other partition untouched. One partition level
    * (the common case); deeper nesting recurses naturally through the
    * same listing rule. Transient seam: a leaf's `__compacting`/`__old`
    * staging siblings live inside the table root during its swap — a
    * concurrent lister can observe them (same plain-filesystem window as
    * [[compactParquet]]; a table format's atomic snapshot closes it).
    * A CRASH mid-swap can persist them — and since their names still
    * contain '=', partition discovery would parse `k=v__old` as a real
    * partition and silently duplicate rows on the next table read. So
    * this pass (a) never treats `__old`/`__compacting` names as
    * partitions, and (b) RECOVERS them first: a leaf whose base is
    * missing restores from its `__old` (the crash sat between retire and
    * promote); everything else staging-suffixed is superseded and
    * deleted by the leaf's [[compactParquet]] run.
    * Returns (partitionDirName → Result) in listing order. */
  def compactPartitioned(spark: SparkSession, dir: String,
                         targetBytes: Long = 128L << 20): Seq[(String, Result)] = {
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    def isStaging(n: String) = n.endsWith("__old") || n.endsWith("__compacting")
    // crash recovery BEFORE listing partitions: only `<leaf>__old` with no
    // live `<leaf>` holds sole custody of data — restore it. (A stale
    // `__compacting` is never the only copy; compactParquet deletes it.)
    fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.endsWith("__old"))
      .foreach { st =>
        val base = new Path(p, st.getPath.getName.stripSuffix("__old"))
        if (!fs.exists(base))
          require(fs.rename(st.getPath, base), s"could not restore $base from crashed swap")
      }
    val parts = fs.listStatus(p)
      .filter(st => st.isDirectory && st.getPath.getName.contains("=") &&
        !isStaging(st.getPath.getName))
      .sortBy(_.getPath.getName)
    require(parts.nonEmpty,
      s"$dir has no key=value partition directories; use compactParquet for flat layouts")
    parts.toSeq.map { st =>
      val sub = st.getPath
      // recurse only through key=value subdirectories: a stray non-
      // partition dir (e.g. a leftover _temporary) must not route the
      // leaf into the recursive branch, where the nonEmpty require would
      // abort the whole table — compactParquet rejects it with a
      // clearer per-leaf error instead
      if (fs.listStatus(sub).exists(st2 => st2.isDirectory &&
          st2.getPath.getName.contains("=") && !isStaging(st2.getPath.getName)))
        sub.getName -> compactPartitioned(spark, sub.toString, targetBytes)
          .map(_._2).reduce((a, b) => Result(a.filesBefore + b.filesBefore,
            a.filesAfter + b.filesAfter, a.bytes + b.bytes, a.skipped && b.skipped))
      else sub.getName -> compactParquet(spark, sub.toString, targetBytes)
    }
  }

  def compactParquet(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L << 20): Result = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    // siblings derive from the normalized Path (Hadoop strips trailing
    // slashes): raw `dir + suffix` with a trailing-slash dir would NEST
    // both inside the live table, and the retire rename would then move
    // the staging data with the old files
    val staging = new Path(p.toString + "__compacting")
    val retired = new Path(p.toString + "__old")
    // crash recovery from a prior interrupted swap: a missing live dir
    // with `__old` present means the crash sat between retire and promote
    // — restore the original. A surviving `__compacting` is never the
    // only copy (the staging write completes before any rename starts)
    // and a surviving `__old` next to a live dir is the superseded
    // pre-swap copy — both are stale; clear them so a crashed run can
    // never leave extra data for a lister or a re-run to pick up.
    if (!fs.exists(p) && fs.exists(retired))
      require(fs.rename(retired, p), s"could not restore $p from crashed swap")
    fs.delete(staging, true)
    fs.delete(retired, true)
    val entries = fs.listStatus(p)
    // a partitionBy layout nests files in subdirectories; compacting it
    // needs per-partition rewrites — reject loudly rather than silently
    // reporting the table "already compact"
    require(!entries.exists(_.isDirectory),
      s"$dir has nested partition directories; compactParquet handles flat layouts only")
    val parts = entries.filter { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    val total = parts.map(_.getLen).sum
    // overflow-safe ceiling: (total-1)/target + 1 (total = 0 -> 1)
    val want = math.max(1L, if (total == 0) 1L else (total - 1) / targetBytes + 1).toInt
    if (parts.length <= want)
      return Result(parts.length, parts.length, total, skipped = true)
    spark.read.parquet(dir).coalesce(want)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // two checked renames instead of delete-then-rename: the data always
    // exists at a recoverable path, and the no-table window shrinks to
    // the instant between the renames. A plain filesystem has no
    // transactional commit — on a real deployment a table format's
    // atomic snapshot swap replaces this seam.
    fs.delete(retired, true)
    require(fs.rename(p, retired), s"could not retire $p")
    require(fs.rename(staging, p), s"could not promote $staging to $p")
    fs.delete(retired, true)
    val after = fs.listStatus(p)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    Result(parts.length, after, total, skipped = false)
  }
}
