package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan,
  * Albert & Kumara 2007, "Near linear time algorithm to detect community
  * structures in large-scale networks") over an undirected edge list —
  * the structure tier between connected components and modularity:
  * [[ConnectedComponents]] answers "reachable at all", this answers
  * "densely connected", and the resulting partition is exactly what a
  * modularity score (`g_modularity`'s algebra) evaluates.
  *
  * DETERMINISTIC variant: the classic algorithm visits vertices in
  * random order and breaks ties randomly — its output is a sample, not
  * a function of the graph. Here every vertex starts labeled with
  * itself and each of `rounds` SYNCHRONOUS rounds relabels every vertex
  * with the most frequent label among its NEIGHBORS (not itself), ties
  * broken by the minimum label; a fixed round count with exact integer
  * counts makes the output a pure function of the edge set —
  * partitioning-, engine- and schedule-invariant, hash-checkable.
  * (Synchronous LPA can oscillate on bipartite-ish structure instead of
  * converging — with a FIXED round budget the output is deterministic
  * either way; pick an even/odd `rounds` consciously if you expect such
  * structure.)
  *
  * Scale shape: each round is one keyed equi-join (neighbor labels) +
  * one count aggregate + one per-vertex argmax (window rn=1, which
  * WindowGroupLimit prunes before the sort) — all shuffle-keyed on
  * vertex ids, no driver-side graph state, AQE-plannable skew. Rounds
  * localCheckpoint with deterministic block release (the
  * [[ConnectedComponents]] discipline: unpersist is a no-op for
  * checkpointed frames).
  */
object LabelPropagation {

  /** (v, label) for every vertex of the undirected edge list after
    * `rounds` synchronous neighbor-majority rounds; vertices sharing a
    * label form a community. Self-loops are dropped (a self-vote is
    * the initial label and would only entrench it). */
  def propagate(edges: DataFrame, srcCol: String, dstCol: String,
                rounds: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    // symmetrize in ONE pass over the edge pipeline (the
    // ConnectedComponents lesson: a union of two selects computes the
    // upstream — e.g. a full MinHash-LSH run — once per branch)
    val sym = edges.filter(col(srcCol) =!= col(dstCol))
      .select(explode(array(
        struct(col(srcCol).as("v"), col(dstCol).as("u")),
        struct(col(dstCol).as("v"), col(srcCol).as("u")))).as("e"))
      .select(col("e.v").as("v"), col("e.u").as("u"))
      .cache()
    var (labels, liveBlocks) = LocalCheckpoints.tracked(
      sym.select(col("v")).distinct().withColumn("label", col("v")))
    val argmax = Window.partitionBy("v")
      .orderBy(col("c").desc, col("label").asc)
    for (_ <- 1 to rounds) {
      val (next, nextBlocks) = LocalCheckpoints.tracked(
        sym.join(labels.select(col("v").as("u"), col("label")), "u")
          .groupBy("v", "label").agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(argmax))
          .filter(col("rn") === 1)
          .select(col("v"), col("label")))
      labels = next
      LocalCheckpoints.release(liveBlocks)
      liveBlocks = nextBlocks
    }
    sym.unpersist()
    labels
  }
}
