package graft.catalog

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hot-key stress over the SkewGen fixture (round-12 verdict item 7):
  * the join-heavy gates named by the r11 verdict (d_method_agreement,
  * d_er_pipeline, the salted-join path) must survive a planted
  * power-law key — one block holding ~20% of rows — and the engine's
  * skew machinery must demonstrably engage on the planted join shape
  * (the AqeSkewSpec evidence surface). The ≤2× wall-clock comparison vs
  * the uniform fixture is measured at sf0.1 and recorded in BASELINE.md
  * (bench numbers don't belong in a unit test). */
class SkewFixtureSpec extends SparkSpec {

  // dir name deliberately contains no "skew" substring: the AQE test
  // greps the final plan, and a FileScan Location containing the path
  // would make the marker assertion vacuous.
  private lazy val dir: String = {
    val out = TestDirs.tempDirCleanedAtExit("graft_hotkey")
    graft.SkewGen.run(spark, "/root/testdata/sf0.001", out)
    out
  }

  test("the planted skew is real: one supplier holds ~20% of lineitem") {
    val li = TableCatalog.load(spark, dir, "lineitem")
    val total = li.count()
    val top = li.groupBy("l_suppkey").count()
      .orderBy(col("count").desc).head().getLong(1)
    assert(top >= (total * 0.15).toLong, s"hot supplier holds $top of $total")
  }

  test("join-heavy gates run green on the skewed fixture") {
    for (name <- Seq("d_method_agreement", "d_er_pipeline", "q_salted_join",
        "d_ngram_jaccard")) {
      val rows = graft.SparkEntry.queries(name)(spark, dir).collect()
      assert(rows.nonEmpty, s"$name returned no rows on the skewed fixture")
    }
  }

  test("salted join equals the plain join on the skewed fixture and spreads the hot key") {
    val li = TableCatalog.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val sup = TableCatalog.load(spark, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    val salted = graft.operators.Skew.saltedJoin(li, sup,
      keys = Seq("l_suppkey"), factor = 4)
    assert(salted.count() === li.join(sup, "l_suppkey").count())
    // the hot key's rows distribute across all 4 salt buckets — derived
    // from the OPERATOR's own salt expression, not a re-implementation
    val hot = li.groupBy("l_suppkey").count()
      .orderBy(col("count").desc).head().getLong(0)
    val buckets = li
      .withColumn("__salt", graft.operators.Skew.saltExpr(li, 4))
      .filter(col("l_suppkey") === hot)
      .groupBy("__salt").count().collect()
    assert(buckets.length === 4, s"hot key landed in ${buckets.length}/4 salt buckets")
  }

  test("AQE splits the planted hot-supplier join at runtime") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // Three conditions the detector needs, each load-bearing (found by
      // driving the real rule, not assumed):
      //  1. MULTIPLE MAP TASKS — AQE splits a skewed reduce partition by
      //     MAPPER ranges, so a single-split parquet scan (one mapper)
      //     makes the hot partition indivisible and the rule silently
      //     no-ops. The 100 TB reading: a coalesced upstream stage can
      //     disable skew-splitting downstream. Hence repartition(8).
      //  2. INCOMPRESSIBLE pad bytes (md5 chains) — a constant pad
      //     compresses to nothing in the shuffle write and the hot
      //     partition ducks the size threshold.
      //  3. Enough absolute volume on the sf0.001 fixture — the ×16
      //     explode.
      val li = TableCatalog.load(spark, dir, "lineitem")
        .repartition(8)
        .select(col("l_suppkey"), explode(expr("sequence(0, 15)")).as("rep"),
          col("l_orderkey"))
        .select(col("l_suppkey"), concat(
          md5(concat(col("rep"), col("l_orderkey").cast("string"))),
          md5(concat(lit("a"), col("rep"), col("l_orderkey").cast("string"))),
          md5(concat(lit("b"), col("rep"), col("l_orderkey").cast("string"))),
          md5(concat(lit("c"), col("rep"), col("l_orderkey").cast("string")))).as("payload"))
      val sup = TableCatalog.load(spark, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      val joined = li.join(sup, "l_suppkey")
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() > 0L)
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      // the SMJ skew marker or the AQE shuffle-read skew annotation —
      // NOT a bare "skew" substring, which the fixture path could fake
      assert(finalPlan.contains("skew=true") || finalPlan.contains("skewed"),
        s"expected AQE skew handling on the planted hot supplier:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
