package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches for corpus statistics.
  *
  * HyperLogLog (`approx_count_distinct`) is the usual answer, but its
  * estimates are implementation-specific — two engines (or two versions)
  * disagree, which breaks the cross-engine reproducibility contract every
  * operator here keeps. KMV (k-minimum-values) has none of that: the
  * estimate is a pure function of the k smallest md5-derived hash values
  * of the distinct elements, so any engine that agrees on md5 agrees on
  * the estimate bit-for-bit, at any parallelism.
  */
object Sketches {

  /** KMV distinct-count estimate per stratum over `valueCol`:
    * (stratum, n_exact, kmv_estimate). Estimate = (k-1)/u_(k) where u_(k)
    * is the k-th smallest hash-unit value of the stratum's distinct
    * values; a stratum with fewer than k distinct values reports its
    * exact count (the standard KMV small-set fallback). `n_exact` is
    * included for error inspection — at 100 TB you would drop it (that
    * exact count is the expensive thing the sketch replaces).
    *
    * Scale note: the k-th-smallest selection is a per-stratum window
    * rank. At real scale, pre-filter to `u < bound` (any sound
    * overestimate of u_(k), e.g. from a prior epoch's sketch) so the
    * sort touches a sliver of the distinct set instead of all of it;
    * the dedup groupBy dominates either way. */
  def kmvDistinct(df: DataFrame, strataCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    val dv = df.select(col(strataCol), col(valueCol).as("v")).distinct()
      .withColumn("u", Sampling.hashUnit(col("v")))
    val w = Window.partitionBy(strataCol).orderBy(col("u"), col("v"))
    // Two branches over dv, deliberately: the rank-k branch keeps its
    // `rn === k` filter so Spark's WindowGroupLimit prunes each stratum
    // to its top-k rows BEFORE the window sort, and the exact count is a
    // plain aggregate with no sort at all. Folding both into one ranked
    // pass (n_exact = max(rn)) measures 2× SLOWER — it forces a full
    // per-stratum sort of every distinct value just to learn the count.
    val kth = dv.withColumn("rn", row_number().over(w))
      .filter(col("rn") === k)
      .select(col(strataCol), col("u").as("uk"))
    val exact = dv.groupBy(col(strataCol)).agg(count(lit(1)).as("n_exact"))
    exact.join(kth, Seq(strataCol), "left")
      .withColumn("kmv_estimate",
        round(coalesce(lit((k - 1).toDouble) / col("uk"),
          col("n_exact").cast("double")), 4))
      .select(strataCol, "n_exact", "kmv_estimate")
  }
}
