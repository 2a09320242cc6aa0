package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable statistical-test operators extracted from the inline gate
  * compositions (r15 verdict item 5) so the oracle gates and the
  * differential fuzzer ([[graft.fuzz.StatFuzz]]) drive ONE implementation.
  * Each keeps the original gate's exact arithmetic — integer/decimal
  * identities with a single rounded floating-point step — so the
  * extraction is plan-identical and the committed oracle values are
  * unchanged (re-verified by the r16 correctness gate).
  *
  * All four are model-sized aggregations: the expensive part is the
  * caller's upstream groupBy over the raw table; these run over the
  * already-aggregated frames (|keys|×|periods|, distinct values, or
  * one row per subject), so they broadcast/shuffle kilobytes at 100 TB.
  */
object StatTests {

  /** Mann-Kendall trend z over a (key, period, value) frame: S from the
    * sign of every period-ordered pair, the tie-corrected variance
    * n(n−1)(2n+5)−Σt(t−1)(2t+5), continuity-corrected z at 6 dp (NULL
    * when the variance term is non-positive — short or all-tied
    * series). Pairs join within key only: |periods|² per key on a
    * model-sized frame, never corpus². */
  def mannKendall(d: DataFrame, keyCol: String, periodCol: String,
                  valueCol: String): DataFrame = {
    val sStat = d.as("a")
      .join(d.as("b"),
        col(s"a.$keyCol") === col(s"b.$keyCol") &&
          col(s"a.$periodCol") < col(s"b.$periodCol"))
      .groupBy(col(s"a.$keyCol").as(keyCol))
      .agg(sum(signum(col(s"b.$valueCol") - col(s"a.$valueCol")).cast("long")).as("s"))
    val nPeriods = d.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val ties = d.groupBy(keyCol, valueCol).agg(count(lit(1)).as("tie"))
      .groupBy(keyCol)
      .agg(sum(col("tie") * (col("tie") - 1) * (lit(2L) * col("tie") + 5)).as("tsum"))
    sStat.join(nPeriods, keyCol).join(ties, keyCol)
      .withColumn("varnum",
        col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) - col("tsum"))
      .select(col(keyCol), col("s"), col("n"), col("varnum"),
        when(col("varnum") > 0,
          round(
            when(col("s") > 0, (col("s") - 1).cast("double"))
              .when(col("s") < 0, (col("s") + 1).cast("double"))
              .otherwise(lit(0.0)) /
              sqrt(col("varnum").cast("double") / 18.0), 6)).as("mk_z"))
  }

  /** Kaplan-Meier survival over an observation frame (tCol, deathCol ∈
    * {0,1}): per-time risk set by reverse cumulative count, the product
    * estimator carried as a SUM of 9-dp decimal log-terms (exact,
    * order-free) exponentiated once at 6 dp; a time where the whole
    * risk set dies pins survival to 0 from there on (the log term would
    * be −∞, carried as the cumzf flag instead). */
  def kaplanMeier(obs: DataFrame, tCol: String = "t_min",
                  deathCol: String = "death"): DataFrame = {
    val grid = obs.groupBy(tCol).agg(
      sum(col(deathCol)).as("n_death"),
      sum(lit(1L) - col(deathCol)).as("n_censor"))
    val wDesc = Window.orderBy(col(tCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col(tCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("n_risk", sum(col("n_death") + col("n_censor")).over(wDesc))
      .withColumn("term",
        when(col("n_death") > 0 && col("n_risk") > col("n_death"),
          round(log(col("n_risk") - col("n_death")) - log(col("n_risk")), 9))
          .otherwise(lit(0.0)).cast("decimal(28,9)"))
      .withColumn("zf",
        when(col("n_death") > 0 && col("n_risk") === col("n_death"), 1L)
          .otherwise(0L))
      .withColumn("cumterm", sum(col("term")).over(wAsc))
      .withColumn("cumzf", sum(col("zf")).over(wAsc))
      .select(col(tCol), col("n_risk"), col("n_death"), col("n_censor"),
        when(col("cumzf") > 0, lit(0.0))
          .otherwise(round(exp(col("cumterm").cast("double")), 6)).as("survival"))
  }

  /** CUPED variance reduction over a per-subject (id, x=pre, y=post)
    * frame: θ = cov(x,y)/var(x) from decimal(38,12)-exact moment sums
    * (9 dp), adjusted metric y − θ·(x − x̄) at 6 dp. A zero-variance
    * covariate yields NULL θ (and NULL y_cuped) — there is no slope to
    * regress out, and the scan must not die on it. */
  def cuped(per: DataFrame, idCol: String, xCol: String = "x",
            yCol: String = "y"): DataFrame = {
    val x = col(xCol); val y = col(yCol)
    val th = per.agg(
        count(lit(1)).as("n"),
        sum(x.cast("decimal(38,12)")).cast("double").as("sx"),
        sum(y.cast("decimal(38,12)")).cast("double").as("sy"),
        sum((x * x).cast("decimal(38,12)")).cast("double").as("sxx"),
        sum((x * y).cast("decimal(38,12)")).cast("double").as("sxy"))
      .select(col("n"), col("sx"),
        // a zero-variance covariate has no regression slope — NULL θ
        // (and NULL y_cuped), not an ANSI DIVIDE_BY_ZERO (StatFuzz r16)
        when(col("n") * col("sxx") - col("sx") * col("sx") =!= 0.0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 9)).as("theta"))
    per.crossJoin(broadcast(th))
      .select(col(idCol), x.as("x_pre"), y.as("y_post"),
        col("theta"),
        round(y - col("theta") * (x - col("sx") / col("n")), 6)
          .as("y_cuped"))
  }

  /** Two-sample Kolmogorov-Smirnov D over a (group, value) frame: the
    * max ECDF gap by EXACT integer cross-multiplication |F1·n2 − F2·n1|
    * over the distinct-value grid, one rounded division at the end.
    * Rows outside the two named groups contribute grid points with
    * zero mass (harmless). */
  def ksStatistic(df: DataFrame, groupCol: String, valueCol: String,
                  groupA: String, groupB: String): DataFrame = {
    val byV = df.groupBy(valueCol).agg(
      sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("c1"),
      sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("c2"))
    val w = Window.orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byV.select(
      sum(col("c1")).over(w).as("f1"), sum(col("c2")).over(w).as("f2"))
    val tot = df.agg(
      sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("n1"),
      sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("n2"))
    cum.crossJoin(tot)
      .groupBy("n1", "n2")
      .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1"))).as("dnum"))
      // an EMPTY sample side has no ECDF — NULL D, not an ANSI
      // DIVIDE_BY_ZERO (found by StatFuzz r16)
      .select(col("n1"), col("n2"),
        when(col("n1") * col("n2") > 0,
          round(col("dnum").cast("double") / (col("n1") * col("n2")), 6))
          .as("ks_d"))
  }
}
