package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns as pure Catalyst
  * expressions (`zip_with` + sequential `aggregate` fold — deterministic
  * evaluation order, so results are identical at any parallelism). Floats
  * are widened to double before multiplication (exact), and cosine is
  * rounded to 6 dp to pin a reproducible value.
  *
  * No UDFs and no linear-algebra library: the expressions live inside
  * whole-stage codegen, which at 100 TB matters more than SIMD on the
  * driver ever could.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity rounded to 6 dp (reproducibility contract). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Native fused variant (graft.plans.CosineSimilarity — one codegen'd
    * loop, no intermediate array). Bit-identical to [[cosine]]; requires
    * registration, which is idempotent and done here. */
  def cosineNative(spark: org.apache.spark.sql.SparkSession,
                   a: Column, b: Column): Column = {
    graft.plans.GraftFunctions.register(spark)
    round(call_function("graft_cosine", a, b), 6)
  }
}
