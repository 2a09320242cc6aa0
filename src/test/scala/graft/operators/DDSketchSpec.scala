package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DDSketch contract (Masson-Rim-Lee 2019): bounded RELATIVE error at
  * every quantile, full mergeability by bucket-count addition, and the
  * partitioning/engine determinism every sketch here keeps.
  */
class DDSketchSpec extends SparkSpec {
  import spark.implicits._

  private val alpha = 0.01
  private val gamma = (1 + alpha) / (1 - alpha)

  // two strata spanning ~5 decades with distinct shapes: geometric for
  // "a" (log-uniform-ish), quadratic for "b" (right-skewed)
  private lazy val rows: Seq[(Long, String, Double)] =
    (1 to 400).map(i => (i.toLong, "a", 0.01 * math.pow(1.03, i))) ++
      (1 to 300).map(i => (i.toLong + 1000L, "b", 0.5 + (i.toDouble * i) / 90.0))
  private def df: DataFrame = rows.toDF("id", "s", "v")

  private def quantiles(sketch: DataFrame) =
    Sketches.ddSketchQuantiles(sketch, "s", Seq(0.5, 0.9, 0.99), alpha)

  test("merged per-split sketches equal the whole-stream sketch, and so do their quantiles") {
    val whole = Sketches.ddSketchBuild(df, "s", "v", alpha)
    val even = Sketches.ddSketchBuild(df.filter($"id" % 2 === 0), "s", "v", alpha)
    val odd = Sketches.ddSketchBuild(df.filter($"id" % 2 =!= 0), "s", "v", alpha)
    val merged = even.unionByName(odd)
      .groupBy("s", "bucket").agg(sum("cnt").as("cnt"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "bucket-count addition must reproduce the whole-stream sketch exactly")
    val qw = quantiles(whole).orderBy("s").collect().toSeq
    val qm = quantiles(merged).orderBy("s").collect().toSeq
    assert(qw === qm, "quantiles from the merged sketch must be bit-identical")
  }

  test("every estimate is within alpha relative error of the exact rank item") {
    val got = quantiles(Sketches.ddSketchBuild(df, "s", "v", alpha))
      .collect().map(r => r.getString(0) -> r).toMap
    for (stratum <- Seq("a", "b")) {
      val vs = rows.filter(_._2 == stratum).map(_._3).sorted
      val r = got(stratum)
      assert(r.getLong(1) === vs.length.toLong)
      for ((q, idx) <- Seq(0.5 -> 2, 0.9 -> 3, 0.99 -> 4)) {
        val exact = vs(math.floor(q * (vs.length - 1)).toInt)
        val est = r.getDouble(idx)
        val relErr = math.abs(est - exact) / exact
        assert(relErr <= alpha * 1.0001 + 1e-9,
          s"$stratum p$q: est $est vs exact $exact (rel err $relErr > $alpha)")
      }
    }
  }

  test("sketch is invariant under repartitioning") {
    val a = Sketches.ddSketchBuild(df, "s", "v", alpha)
    val b = Sketches.ddSketchBuild(df.repartition(7), "s", "v", alpha)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("zero and negative values are excluded; counts reflect only the positive domain") {
    val dirty = df.unionByName(Seq(
      (9001L, "a", 0.0), (9002L, "a", -3.5)).toDF("id", "s", "v"))
    val n = quantiles(Sketches.ddSketchBuild(dirty, "s", "v", alpha))
      .filter($"s" === "a").head.getLong(1)
    assert(n === 400L, "non-positive rows must not enter the sketch")
  }

  test("fractional percents keep distinct names; colliding quantiles are rejected loudly") {
    val sk = Sketches.ddSketchBuild(df, "s", "v", alpha)
    val cols = Sketches.ddSketchQuantiles(sk, "s", Seq(0.99, 0.995, 0.999), alpha)
      .columns.toSeq
    assert(cols === Seq("s", "n_rows", "p99_dd", "p99_5_dd", "p99_9_dd"),
      s"tail quantiles must not round into each other's names, got $cols")
    // two quantiles whose names WOULD collide must fail the require, not
    // crash later with an ambiguous-reference analysis error
    val e = intercept[IllegalArgumentException] {
      Sketches.ddSketchQuantiles(sk, "s", Seq(0.5, 0.50), alpha)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("bucket midpoint honors the width invariant for a hand-placed value") {
    // v = 7.0: bucket = ceil(ln 7 / ln gamma); midpoint within alpha of v
    val one = Seq((1L, "x", 7.0)).toDF("id", "s", "v")
    val est = quantiles(Sketches.ddSketchBuild(one, "s", "v", alpha))
      .head.getDouble(2)
    assert(math.abs(est - 7.0) / 7.0 <= alpha,
      s"single-value estimate $est must be within alpha of 7.0")
    val bucket = Sketches.ddSketchBuild(one, "s", "v", alpha)
      .head.getLong(1)
    assert(bucket === math.ceil(math.log(7.0) / math.log(gamma)).toLong)
  }
}
