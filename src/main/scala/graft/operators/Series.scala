package graft.operators

import org.apache.spark.sql.DataFrame
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
}
