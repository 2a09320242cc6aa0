package graft.catalog

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Machine-checks that Adaptive Query Execution splits a skewed shuffle
  * join at runtime — the engine-native answer to hot keys that
  * [[graft.operators.Skew.saltedJoin]] handles manually when the skew is
  * known up front. Thresholds are lowered so the planted skew trips AQE
  * on test-sized data; the assertion reads the FINAL adaptive plan, the
  * same evidence surface the broadcast/no-shuffle specs use. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition of a planted hot-key join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 95% of fact rows share one key; payload pads the partition past
      // the lowered skew threshold
      val fact = spark.range(0, 20000).select(
        when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        concat(lit("x" * 64), col("id").cast("string")).as("payload"))
      val dim = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("d"), col("id").cast("string")).as("dv"))
      val joined = fact.join(dim, "k")
      // drive THIS QueryExecution (count() would plan a fresh one and
      // leave this adaptive plan unexecuted at isFinalPlan=false)
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() === 20000L)
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      assert(finalPlan.toLowerCase.contains("skew"),
        s"expected AQE skew-join handling in the final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
