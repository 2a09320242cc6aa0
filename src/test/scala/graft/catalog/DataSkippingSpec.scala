package graft.catalog

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Machine-checks the two scan-pruning behaviors a 100 TB layout relies
  * on: static partition pruning (a filter on the partition column reads
  * only its directories) and DYNAMIC partition pruning (a join against a
  * filtered dimension prunes the fact scan at runtime — the mechanism
  * that makes star-schema joins feasible when the fact side is the
  * 100 TB one). Plan-shape evidence, like the broadcast/no-shuffle specs. */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = tmpDir("dpp")
    (0L until 1000L).map(i => (i, i % 10, s"p${i % 10}"))
      .toDF("id", "dim_fk", "part")
      .write.partitionBy("part").parquet(s"$d/fact")
    // dim must be a real source: a filter over a LocalRelation constant-
    // folds away, leaving no selective predicate for DPP to piggyback on
    (0 until 10).map(i => (s"p$i", if (i == 3 || i == 7) "keep" else "drop"))
      .toDF("part_key", "tag")
      .write.parquet(s"$d/dim")
    d
  }

  test("static partition pruning: filtered scan reads only matching directories") {
    val fact = spark.read.parquet(s"$dir/fact")
    val pruned = fact.filter(col("part") === "p3")
    // (inputFiles is relation-level metadata and ignores filters — the
    // evidence lives in the scan node's partition filters + file metric)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("= p3"),
      s"expected a partition filter in:\n$plan")
    // execute THIS QueryExecution (count() would plan a fresh one and
    // leave these metrics unpopulated, passing vacuously as 0 < n)
    assert(pruned.queryExecution.executedPlan.execute().count() === 100L)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val scanned = scan.metrics("numFiles").value
    assert(scanned > 0 && scanned < fact.inputFiles.length)
  }

  test("dynamic partition pruning fires for a join against a filtered dimension") {
    withSQLConf("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
        "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0") {
      val fact = spark.read.parquet(s"$dir/fact")
      // DPP requires a SELECTIVE predicate on the filtering side — a bare
      // unfiltered dimension is (correctly) not worth a pruning subquery
      val dim = spark.read.parquet(s"$dir/dim").filter(col("tag") === "keep")
      val joined = fact.join(dim, col("part") === col("part_key"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected a dynamicpruning subquery in:\n$plan")
      assert(joined.count() === 200L)
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
