package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r16 optimization guard: logregTrain's weight update moved from a
  * per-iteration spark.range(1).select(round(...)) job to a driver-side
  * BigDecimal HALF_UP computation. This spec pins that the JVM form is
  * bit-identical to Catalyst's Round(double, 9) across adversarial
  * values (ties at the 9-dp grid, negatives, subnormal-ish magnitudes,
  * values whose double image sits just off the decimal tie). */
class ClassifierRoundParitySpec extends SparkSpec {

  private def jvmRound9(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(9, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  test("driver-side HALF_UP round equals Catalyst round(_, 9)") {
    val values: Seq[Double] = Seq(
      0.0, -0.0, 1.0, -1.0,
      0.1234567885, -0.1234567885,           // tie at the 10th dp
      0.1234567884999999, 0.1234567885000001,
      1.9999999995, -1.9999999995,
      8.0 * 0.037, -8.0 * 0.037,
      1e-10, -1e-10, 5e-10, -5e-10,
      123456.123456789123, -123456.123456789123,
      math.Pi, -math.E,
      0.3333333333333333, 2.0 / 3.0
    ) ++ (1 to 50).map(i => math.sin(i.toDouble) * math.pow(10, (i % 7) - 3))

    import spark.implicits._
    val viaSpark = values.toDF("v").select(round(col("v"), 9).as("r"))
      .as[Double].collect()
    val viaJvm = values.map(jvmRound9)
    viaSpark.zip(viaJvm).zip(values).foreach { case ((s, j), v) =>
      assert(java.lang.Double.doubleToRawLongBits(s) ===
        java.lang.Double.doubleToRawLongBits(j), s"value $v")
    }
  }

  test("logregTrain weights are unchanged by the driver-side update (golden)") {
    import spark.implicits._
    // small deterministic feature frame; weights compared against the
    // value the spark.range(1) form produced for the same frame
    val f = (1 to 64).map { i =>
      val x = Seq(1.0, (i % 7).toDouble / 3.0, math.sin(i.toDouble))
      val y = if (i % 3 == 0) 1.0 else 0.0
      (x, y)
    }.toDF("x", "y")
    val w = Classifier.logregTrain(f, "x", "y", dims = 3, iters = 5, lr = 0.5)
    // replay the OLD form inline to derive the expected weights
    var wOld: Seq[Double] = Seq.fill(3)(0.0)
    for (_ <- 1 to 5) {
      val p = round(lit(1.0) / (lit(1.0) + exp(-wOld.indices
        .map(j => element_at(col("x"), j + 1) * lit(wOld(j)))
        .reduce(_ + _))), 6)
      val aggs = (0 until 3).map { j =>
        (sum(((col("y") - p) * element_at(col("x"), j + 1))
          .cast("decimal(30,15)")).cast("double") / count(lit(1))).as(s"g$j")
      }
      val g = f.agg(aggs.head, aggs.tail: _*).head
      val wRow = spark.range(1).select((0 until 3).map(j =>
        round(lit(wOld(j)) + lit(0.5) * lit(g.getDouble(j)), 9).as(s"w$j")): _*).head
      wOld = (0 until 3).map(wRow.getDouble)
    }
    assert(w === wOld)
  }
}
