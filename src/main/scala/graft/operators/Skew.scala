package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the large (skewed) side with a
  * deterministic `pmod(xxhash64(row), factor)` and replicate the small
  * side once per salt value, turning one hot join key into `factor`
  * evenly-sized keys. AQE's runtime skew-join splitting handles most
  * cases; explicit salting is the knob for the pathological ones (one
  * key = 30% of 100 TB) where even a split partition exceeds executor
  * memory, and for deterministic pre-planned layouts.
  *
  * Results are identical to the plain join: every (large, small) match
  * lands in exactly one salt bucket.
  */
object Skew {

  /** The salt derivation saltedJoin applies to the large side — public
    * so tests/diagnostics assert on the OPERATOR's bucketing rather than
    * re-implementing it (a drifted copy would keep passing while
    * asserting nothing). */
  def saltExpr(large: DataFrame, factor: Int): org.apache.spark.sql.Column = {
    require(factor > 0, "salt factor must be positive")
    pmod(xxhash64(large.columns.toIndexedSeq.map(col): _*), lit(factor)).cast("int")
  }

  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int = 8, joinType: String = "inner"): DataFrame = {
    val l = large.withColumn("__salt", saltExpr(large, factor))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
