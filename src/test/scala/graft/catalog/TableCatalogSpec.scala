package graft.catalog

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TableCatalogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("information_schema facade: one row per column with type policy") {
    val is = TableCatalog.informationSchemaColumns(spark, sf, Seq("nation", "region"))
    val nation = is.filter(col("table_name") === "nation")
      .orderBy("ordinal_position").collect()
    assert(nation.map(_.getString(1)).toSeq === Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(nation.head.getBoolean(5)) // first column is the PK by convention
    assert(nation.map(_.getString(3)).toSeq === Seq("INT64", "STRING(MAX)", "INT64"))
  }

  test("bucketed registration: co-located join has no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val c = TableCatalog.registerBucketed(spark, sf, "customer", Seq("c_custkey"), buckets = 4)
      val o = TableCatalog.registerBucketed(spark, sf, "orders", Seq("o_custkey"), buckets = 4)
      val joined = spark.table(c).join(spark.table(o),
        col("c_custkey") === col("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key -> SortMergeJoin reads
      // bucketed files directly, no hashpartitioning Exchange
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
