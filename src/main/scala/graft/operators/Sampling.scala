package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic (hash-based) sampling for training-data curation.
  * `rand()`-based sampling (`df.sample`, `stat.sampleBy`) changes with
  * partitioning and reruns; hash sampling keys the decision on CONTENT —
  * u(row) = first 6 md5 hex digits of the key / 16^6 ∈ [0,1) — so a
  * sample is reproducible across runs, engines, and cluster layouts, and
  * a document keeps or loses its slot independent of everything else
  * (the property dataset curation needs for incremental rebuilds).
  *
  * All pure expressions; the filter pushes through projections.
  */
object Sampling {

  /** Uniform [0,1) decision value from a key column. */
  def hashUnit(key: Column, seed: String = ""): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(seed))), 1, 6), 16, 10)
      .cast("long").cast("double") / lit(16777216.0))

  /** Keep ~`rate` of rows, deterministically. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 seed: String = ""): DataFrame =
    df.filter(hashUnit(col(keyCol), seed) < rate)

  /** Per-stratum rates (e.g. downsample dominant languages): strata not
    * listed keep everything. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Double],
                           seed: String = ""): DataFrame = {
    val rateExpr = rates.foldLeft(lit(1.0)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashUnit(col(keyCol), seed) < rateExpr)
  }
}
