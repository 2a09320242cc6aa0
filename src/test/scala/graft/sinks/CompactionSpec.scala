package graft.sinks

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compactParquet merges small files, preserves content, skips when compact") {
    val dir = tmpDir("compact") + "/t"
    val data = (1L to 1000L).map(i => (i, s"row$i"))
    data.toDF("id", "v").repartition(16).write.parquet(dir)
    val before = spark.read.parquet(dir)
    assert(before.inputFiles.length === 16)

    val r = Compaction.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(!r.skipped && r.filesBefore === 16 && r.filesAfter === 1)
    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length === 1)
    assert(after.as[(Long, String)].collect().sorted === data.sorted.toArray)

    // already compact -> no rewrite
    val again = Compaction.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(again.skipped && again.filesAfter === 1)
  }

  test("compactPartitioned compacts every key=value leaf independently, content-neutral") {
    val dir = tmpDir("compact_part") + "/t"
    val data = (1L to 600L).map(i => (i, s"k${i % 3}", s"row$i"))
    data.toDF("id", "k", "v").repartition(8).write.partitionBy("k").parquet(dir)
    assert(spark.read.parquet(dir).inputFiles.length === 24) // 8 per partition

    val rs = Compaction.compactPartitioned(spark, dir, targetBytes = 1L << 30)
    assert(rs.map(_._1).sorted === Seq("k=k0", "k=k1", "k=k2"))
    rs.foreach { case (part, r) =>
      assert(!r.skipped && r.filesBefore === 8 && r.filesAfter === 1, part)
    }
    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length === 3)
    assert(after.select("id", "k", "v").as[(Long, String, String)]
      .collect().sorted === data.sorted.toArray)

    // second pass: every partition already compact
    assert(Compaction.compactPartitioned(spark, dir, targetBytes = 1L << 30)
      .forall(_._2.skipped))
    // flat layout is rejected loudly (and vice versa is already covered
    // by compactParquet's nested-directory require)
    intercept[IllegalArgumentException] {
      Compaction.compactPartitioned(spark, tmpDir("flat_cp"), targetBytes = 1)
    }
  }

  test("crashed swap state recovers: __old/__compacting are never partitions, sole-copy __old restores") {
    import org.apache.hadoop.fs.Path
    val dir = tmpDir("compact_crash") + "/t"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val data = (1L to 300L).map(i => (i, s"k${i % 3}", s"row$i"))
    data.toDF("id", "k", "v").repartition(4).write.partitionBy("k").parquet(dir)
    // crash flavor 1: promote succeeded but the old copy survived — its
    // name still parses as a partition (k='k0__old') and would silently
    // duplicate k0's rows on the next read of the table root
    fs.rename(new Path(s"$dir/k=k0"), new Path(s"$dir/k=k0__old"))
    data.filter(_._2 == "k0").map(t => (t._1, t._3)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$dir/k=k0")
    // crash flavor 2: staging written, swap never started
    data.filter(_._2 == "k1").map(t => (t._1, t._3)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$dir/k=k1__compacting")
    // crash flavor 3: retired but never promoted — __old is the ONLY copy
    fs.rename(new Path(s"$dir/k=k2"), new Path(s"$dir/k=k2__old"))

    val rs = Compaction.compactPartitioned(spark, dir, targetBytes = 1L << 30)
    assert(rs.map(_._1).sorted === Seq("k=k0", "k=k1", "k=k2"),
      "staging-suffixed directories must never be listed as partitions")
    assert(!fs.exists(new Path(s"$dir/k=k0__old")) &&
      !fs.exists(new Path(s"$dir/k=k1__compacting")) &&
      !fs.exists(new Path(s"$dir/k=k2__old")), "stale swap state must be cleared")
    // content: every row exactly once — no duplicates from k=k0__old,
    // k=k2 restored from its sole __old copy
    val after = spark.read.parquet(dir)
    assert(after.select("id", "k", "v").as[(Long, String, String)]
      .collect().sorted === data.sorted.toArray)
    // re-run is clean
    assert(Compaction.compactPartitioned(spark, dir, targetBytes = 1L << 30)
      .forall(_._2.skipped))
  }

  test("a stray non-partition subdirectory fails that leaf with compactParquet's clear error, not the table-level require") {
    val dir = tmpDir("compact_stray") + "/t"
    val data = (1L to 200L).map(i => (i, s"k${i % 2}", s"row$i"))
    data.toDF("id", "k", "v").repartition(4).write.partitionBy("k").parquet(dir)
    new java.io.File(s"$dir/k=k0/_temporary").mkdirs()
    val e = intercept[IllegalArgumentException] {
      Compaction.compactPartitioned(spark, dir, targetBytes = 1L << 30)
    }
    assert(e.getMessage.contains("k=k0") && e.getMessage.contains("flat layouts"),
      s"leaf must fall through to compactParquet's nested-dir error, got: ${e.getMessage}")
  }

  test("compactParquet respects the target size (multiple output files)") {
    val dir = tmpDir("compact_sz") + "/t"
    // ~payload large enough that total bytes exceed one tiny target
    (1L to 5000L).map(i => (i, "x" * 200)).toDF("id", "v")
      .repartition(32).write.parquet(dir)
    val total = spark.read.parquet(dir).inputFiles.length
    assert(total === 32)
    val r = Compaction.compactParquet(spark, dir, targetBytes = 64L << 10)
    assert(!r.skipped)
    assert(r.filesAfter > 1 && r.filesAfter < 32)
    assert(spark.read.parquet(dir).count() === 5000L)
  }
}
