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

  /** Deterministic distributed k-means training (cosine metric) — the
    * trained coarse quantizer for
    * [[graft.operators.Similarity.ivfTopKWithCentroids]]. Returns the
    * final (cid, centroid) model after `iters` Lloyd rounds; cluster ids
    * are the init vector ids.
    *
    * Seeding: the k lowest-`idCol` rows (rank-based — `orderBy(id)
    * .limit(k)` is a distributed TakeOrdered). A value filter like
    * `id <= k` would assume dense 1-based ids and silently train with
    * fewer (or zero) centroids on a corpus keyed by content hash;
    * rank-based seeding takes exactly min(k, n) centroids from ANY id
    * space, and coincides with `id <= k` on dense ids (so existing
    * oracle hashes are unchanged).
    *
    * Scale shape: each round is one broadcast of k centroids + a
    * map-side argmax over the corpus (no corpus shuffle) + one keyed
    * mean aggregate; only k×dims means ever reach the driver (config-
    * sized, like any trained-model broadcast).
    *
    * Cross-engine determinism (what makes even the TRAINED MODEL
    * oracle-checkable): assignment argmax uses the 6-dp-rounded cosine
    * with id tiebreak; per-dimension means accumulate in decimal(30,15)
    * (order-independent exact sums — a double sum would depend on
    * partition order) and divide in double; the new centroid rounds to
    * float exactly as any engine's double→float cast does. Empty
    * clusters keep their previous centroid. */
  def kmeansTrain(df: org.apache.spark.sql.DataFrame, idCol: String,
                  vecCol: String, k: Int = 4, iters: Int = 2)
      : Seq[(Long, Array[Float])] = {
    require(iters >= 1, s"kmeansTrain needs iters >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val base = df.select(col(idCol), col(vecCol).as("v"))
    var cents: Seq[(Long, Array[Float])] = base
      .orderBy(col(idCol).asc).limit(k)
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    // iters Lloyd rounds = (iters - 1) centroid updates; the final
    // assignment pass happens in assignToCentroids against this model.
    for (_ <- 1 until iters) {
      val assign = assignToCentroids(df, idCol, vecCol, cents)
      val means = assign.join(base, idCol)
        .select(col("cluster_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster_id"), col("dim"))
        .agg((sum(col("x").cast("double").cast("decimal(30,15)")).cast("double")
          / count(lit(1))).as("m"))
        .as[(Long, Int, Double)].collect()
        .groupBy(_._1)
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_._2).map(_._3.toFloat).toArray
        }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cents
  }

  /** Map-side argmax of `df`'s vectors against a broadcast centroid
    * model: (idCol, cluster_id). One pass over the corpus, no shuffle of
    * the vectors (the per-id window runs inside the k-wide fan-out). */
  def assignToCentroids(df: org.apache.spark.sql.DataFrame, idCol: String,
                        vecCol: String, cents: Seq[(Long, Array[Float])])
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val centDf = broadcast(cents.toDF("cid", "cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("ccos").desc, col("cid").asc)
    df.select(col(idCol), col(vecCol).as("v")).crossJoin(centDf)
      .withColumn("ccos", cosineNative(spark, col("v"), col("cv")))
      .withColumn("crk", row_number().over(w))
      .filter(col("crk") === 1)
      .select(col(idCol), col("cid").as("cluster_id"))
  }

  /** Train + final assignment: (id, cluster_id) after `iters` rounds —
    * see [[kmeansTrain]] for seeding/determinism/scale notes. */
  def kmeansAssign(df: org.apache.spark.sql.DataFrame, idCol: String,
                   vecCol: String, k: Int = 4, iters: Int = 2)
      : org.apache.spark.sql.DataFrame =
    assignToCentroids(df, idCol, vecCol, kmeansTrain(df, idCol, vecCol, k, iters))
}
