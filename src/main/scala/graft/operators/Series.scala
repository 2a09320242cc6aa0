package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series statistics over pre-aggregated (key, period, count)
  * frames — the monitoring / drift-detection tier of an ingest pipeline
  * (is today's event volume for this type wildly off its recent
  * history?).
  */
object Series {

  /** Trailing-window z-score per (key, period) row: z = (x − μ) / σ over
    * the `lag` periods strictly BEFORE the current row (the current
    * value must not contaminate its own baseline). μ and σ² derive from
    * exact integer window sums via n·Σx² − (Σx)² — the textbook
    * identity — so the only floating-point steps are two divisions and
    * a sqrt over exact integers: any IEEE engine agrees bitwise at the
    * 6-dp rounding, with none of the accumulation-order sensitivity a
    * built-in `stddev` window would import. Histories shorter than
    * `minPoints` or with zero variance yield NULL z (no flag).
    *
    * Scale shape: one window pass over the already-aggregated series —
    * the series is |keys| × |periods| rows, model-sized relative to the
    * raw events; the expensive aggregation upstream is the caller's
    * groupBy, which map-side combines. */
  def trailingZscore(series: DataFrame, keyCol: String, periodCol: String,
                     valueCol: String, lag: Int = 7, minPoints: Int = 3,
                     flagAt: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(periodCol)
      .rowsBetween(-lag, -1)
    val x = col(valueCol)
    series.select(col(keyCol), col(periodCol), x,
        count(x).over(w).as("n"),
        sum(x).over(w).as("sx"),
        sum(x * x).over(w).as("sxx"))
      .withColumn("z",
        when(col("n") >= minPoints &&
            (col("n") * col("sxx") - col("sx") * col("sx")) > 0,
          round((x.cast("double") - col("sx").cast("double") / col("n")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
              (col("n") * (col("n") - 1))), 6)))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > flagAt, lit(false)))
      .select(col(keyCol), col(periodCol), x, col("z"), col("is_anomaly"))
  }

  /** Mann-Whitney rank-sum z statistic: are `groupA`'s values drawn
    * from the same distribution as the rest? Nonparametric — no
    * normality assumption, unlike a t-test — which is what makes it the
    * default two-sample screen for skewed metrics. Tie-averaged ranks
    * come from per-value counts (below + (c+1)/2 — rationals with
    * denominator 2, exact in double, decimal-accumulated), U and the
    * normal-approximation z from integer identities; no tie-correction
    * term in σ (continuous values assumed; ties only share ranks).
    * The rank is ONE global window over the DISTINCT-value frame, not
    * the row frame — cardinality-sized, not data-sized.
    * Output: one row (n1, n2, u1, z). */
  def rankSumZ(df: DataFrame, groupCol: String, valueCol: String,
               groupA: String): DataFrame = {
    val byV = df.select(col(groupCol), col(valueCol).as("value"))
      .groupBy("value").agg(
        count(lit(1)).as("c"),
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("c1"))
    val w = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byV
      .withColumn("below", coalesce(sum(col("c")).over(w), lit(0L)))
      .withColumn("avgrank",
        col("below").cast("double") + (col("c") + 1).cast("double") / 2)
    ranked.agg(
        sum(col("c1")).as("n1"),
        sum(col("c") - col("c1")).as("n2"),
        sum((col("c1").cast("double") * col("avgrank"))
          .cast("decimal(38,6)")).cast("double").as("r1"))
      .select(col("n1"), col("n2"),
        (col("r1") - (col("n1") * (col("n1") + 1)).cast("double") / 2).as("u1"))
      // σ = 0 when either side is EMPTY — NULL z, not an ANSI
      // DIVIDE_BY_ZERO that kills the job (found by StatFuzz r16; the
      // neymanSample/cosine bug class)
      .withColumn("z", when(col("n1") * col("n2") > 0, round(
        (col("u1") - (col("n1") * col("n2")).cast("double") / 2) /
          sqrt((col("n1") * col("n2") * (col("n1") + col("n2") + 1))
            .cast("double") / 12), 6)))
      .withColumn("u1", round(col("u1"), 6))
  }

  /** Robust (median/MAD) z-scores per key — the outlier flag that
    * survives what breaks [[trailingZscore]]'s mean/σ: a single extreme
    * value inflates σ enough to hide itself, while the median absolute
    * deviation has a 50% breakdown point (Iglewicz & Hoaglin 1993;
    * 0.6745 ≈ Φ⁻¹(3/4) rescales MAD to σ-units, |M| > 3.5 is their
    * recommended cut). Global per key, not trailing — this is the
    * batch-profile complement to the streaming-style trailing score.
    *
    * Determinism: medians are EXACT interpolated percentiles over the
    * input values, rounded at 6 dp before reuse; the score is one
    * multiply + divide over those pinned values. Two model-sized
    * percentile aggregates broadcast back; zero-MAD keys (over half the
    * values identical) yield NULL scores.
    * Output: (key, period, value, med, mad, rz, is_anomaly). */
  def robustZscore(series: DataFrame, keyCol: String, periodCol: String,
                   valueCol: String, flagAt: Double = 3.5): DataFrame = {
    val x = col(valueCol)
    val med = series.groupBy(keyCol)
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 6).as("med"))
    val dev = series.join(broadcast(med), keyCol)
      .withColumn("adev", abs(x - col("med")))
    val mad = dev.groupBy(keyCol)
      .agg(round(expr("percentile(adev, 0.5)"), 6).as("mad"))
    dev.join(broadcast(mad), keyCol)
      .withColumn("rz",
        when(col("mad") > 0,
          round(lit(0.6745) * (x - col("med")) / col("mad"), 6)))
      .withColumn("is_anomaly", coalesce(abs(col("rz")) > flagAt, lit(false)))
      .select(col(keyCol), col(periodCol), x, col("med"), col("mad"),
        col("rz"), col("is_anomaly"))
  }

  /** Bounded-history exponential moving average (pandas `ewm(adjust=
    * True)` semantics over the last `lag`+1 periods): smoothed_t =
    * Σ_i (1−α)^i·x_{t−i} / Σ_i (1−α)^i — the normalized form, so short
    * histories are proper weighted averages, not biased toward zero.
    * Bounding the history at `lag` makes it a WINDOW computation (one
    * pass, mergeable with the [[trailingZscore]] shuffle) instead of an
    * unboundable running recursion, and the dropped tail mass is
    * (1−α)^(lag+1) — under 1% at the defaults.
    *
    * Determinism: with a DYADIC α (0.5, 0.25, 0.75…) every weight
    * (1−α)^i is an exact power of two and products/sums evaluate
    * identically in any IEEE engine; the in-row fold visits the frame
    * oldest-first on both sides. Non-dyadic α leans on the 6-dp
    * rounding instead (libm pow divergence is far below 1e-6). */
  def ewma(series: DataFrame, keyCol: String, periodCol: String,
           valueCol: String, alpha: Double = 0.5, lag: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(lag >= 0, s"lag must be non-negative, got $lag")
    val w = Window.partitionBy(keyCol).orderBy(periodCol)
      .rowsBetween(-lag, 0)
    val vals = collect_list(col(valueCol).cast("double")).over(w)
    def fold(vs: Column): Column = aggregate(
      vs,
      struct(lit(0).as("i"), lit(0.0).as("num"), lit(0.0).as("den")),
      (acc, v) => {
        // frame order is oldest-first; newest element gets weight 1
        val wgt = pow(lit(1 - alpha),
          size(vs).cast("double") - 1 - acc.getField("i").cast("double"))
        struct((acc.getField("i") + 1).as("i"),
          (acc.getField("num") + wgt * v).as("num"),
          (acc.getField("den") + wgt).as("den"))
      },
      acc => round(acc.getField("num") / acc.getField("den"), 6))
    series.select(col(keyCol), col(periodCol), col(valueCol),
      fold(vals).as("ewma"))
  }
}
