package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Decontamination, Sampling, TextAnalysis}

/** Machine-checked physical-plan shape for the scale claims the operator
  * Scaladocs make: where a doc says "broadcast", the plan must contain a
  * BroadcastHashJoin; where it says "zero exchanges", the plan must have
  * no Exchange. Guards against a Catalyst upgrade or stats change
  * silently degrading the 100 TB shape. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val docs = (1L to 200L)
    .map(i => (i, s"alpha w$i beta w${i + 1} gamma w${i + 2} delta epsilon zeta", s"src${i % 5}"))
    .toDF("doc_id", "text", "source")

  test("decontamination joins the eval shingle set as a broadcast (map-side vs corpus)") {
    val plan = physicalPlan(Decontamination.flagContaminated(
      docs, "doc_id", "text", evalPred = col("doc_id") % 10 === 0))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("repetitionMetrics is exchange-free (per-doc metrics never shuffle gram rows)") {
    val plan = physicalPlan(TextAnalysis.repetitionMetrics(docs, "doc_id", "text"))
    assert(!plan.contains("Exchange"))
  }

  test("fingerprints is exchange-free (winnowing stays in-row)") {
    val plan = physicalPlan(TextAnalysis.fingerprints(docs, "doc_id", "text"))
    assert(!plan.contains("Exchange"))
  }

  test("temperatureSample touches the corpus with one broadcast-joined filtered pass") {
    val plan = physicalPlan(Sampling.temperatureSample(docs, "doc_id", "source"))
    assert(plan.contains("BroadcastHashJoin"))
    // the corpus side itself must not be exchanged for the rate join
    assert(!plan.contains("SortMergeJoin"))
  }

  test("hybridTopK joins the query postings as a broadcast (map-side vs corpus)") {
    val corpus = spark.range(1, 201).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha"), col("id").cast("string"), lit("beta gamma delta epsilon")).as("text"),
      transform(sequence(lit(1), lit(8)), i => (col("id") % i).cast("float")).as("embedding"))
    val plan = physicalPlan(graft.operators.Similarity.hybridTopK(
      corpus, col("doc_id") % 50 === 0, "doc_id", "text", "embedding"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("kmeans assignment is a broadcast of centroids, not a corpus shuffle") {
    val vecs = spark.range(1, 101).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)), i => (col("id") % i).cast("float")).as("embedding"))
    val plan = physicalPlan(graft.operators.Vectors.kmeansAssign(
      vecs, "vec_id", "embedding", k = 2, iters = 1))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("lshBuckets is a single map-side projection (no shuffle, no driver job)") {
    // range-based source: a Seq-backed LocalRelation would be constant-
    // folded straight to LocalTableScan (the expression evaluates at
    // optimization time), hiding the projection this test asserts on.
    val vecs = spark.range(1, 51).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(16)),
        i => (col("id") % i).cast("float")).as("embedding"))
    val plan = physicalPlan(
      graft.operators.Similarity.lshBuckets(vecs, "vec_id", "embedding"))
    assert(!plan.contains("Exchange"))
    assert(plan.contains("graft_hyperplane_bucket"))
  }
}
