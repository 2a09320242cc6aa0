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
