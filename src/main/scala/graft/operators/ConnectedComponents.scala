package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step that turns pairwise near-duplicate evidence (MinHash/SimHash/
  * Jaccard pairs) into dedup groups with one canonical representative
  * (the minimum id) per group.
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with itself; each round replaces a vertex's label with the
  * minimum over its own and its neighbors' labels; convergence (no label
  * changed) is reached within the graph diameter — for dedup graphs,
  * clusters are small and dense, so a handful of rounds. Each round is
  * one keyed equi-join + one per-vertex min aggregate: all-shuffle-keyed
  * work that AQE can plan, no driver-side graph state. (At web scale the
  * same loop with the large-star/small-star edge rewriting of
  * Kiveris et al. "Connected Components in MapReduce" converges in
  * O(log n) rounds on adversarial diameters; plain propagation is the
  * right default for dedup-shaped graphs.)
  *
  * Determinism: min over vertex ids — the fixpoint is unique regardless
  * of partitioning or iteration interleaving.
  *
  * `localCheckpoint` truncates the per-round lineage (otherwise the plan
  * doubles every round and analysis cost explodes); on a real cluster
  * with reliable storage, substitute `checkpoint` for fault tolerance.
  */
object ConnectedComponents {

  /** (v, component) for every vertex in `edges`; `component` = minimum
    * vertex id reachable from v. */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
                 maxIter: Int = 25): DataFrame = {
    // symmetrize in ONE pass over the edge pipeline (a union of two
    // selects would compute the upstream — e.g. a full MinHash-LSH run —
    // once per branch before the cache materializes)
    val sym = edges.select(explode(array(
        struct(col(srcCol).as("a"), col(dstCol).as("b")),
        struct(col(dstCol).as("a"), col(srcCol).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .cache()
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("l", col("v"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym.join(labels, sym("b") === labels("v"))
        .groupBy(col("a")).agg(min(col("l")).as("nl"))
      // the old label rides along in the checkpointed frame so the
      // convergence check is a filter over materialized rows, not an
      // extra join+recompute per round
      val next = labels.join(nbrMin, labels("v") === nbrMin("a"), "left")
        .select(col("v"), least(col("l"), coalesce(col("nl"), col("l"))).as("l"),
          col("l").as("lold"))
        .localCheckpoint()
      converged = next.filter(col("l") =!= col("lold")).isEmpty
      labels = next.drop("lold")
      i += 1
    }
    sym.unpersist()
    // fail fast rather than silently returning partially-propagated
    // labels: a graph with diameter > maxIter (e.g. a long chain of
    // incrementally-edited near-dups) would otherwise report one true
    // cluster as several, with wrong representatives.
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIter rounds — " +
        "the edge graph has a longer diameter; raise maxIter")
    labels.select(col("v"), col("l").as("component"))
  }
}
