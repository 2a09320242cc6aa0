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
  * work that AQE can plan, no driver-side graph state.
  *
  * Adversarial diameters (a chain of incrementally-edited near-dups
  * longer than `maxIter`) FALL BACK to the alternating large-star/
  * small-star edge rewriting of Kiveris et al. "Connected Components in
  * MapReduce and Beyond" (SOCC'14), which contracts any graph to stars
  * rooted at the component minimum in a poly-logarithmic number of
  * rounds — so the operator never silently mislabels and never needs a
  * diameter-sized round budget. Plain propagation stays the default
  * path because on shallow dedup graphs it converges in fewer, cheaper
  * rounds (two joins/round vs the star rewrite's four).
  *
  * Determinism: min over vertex ids — the fixpoint is unique regardless
  * of partitioning or iteration interleaving, for both phases.
  *
  * `localCheckpoint` truncates the per-round lineage (otherwise the plan
  * doubles every round and analysis cost explodes); on a real cluster
  * with reliable storage, substitute `checkpoint` for fault tolerance.
  */
object ConnectedComponents {

  /** (v, component) for every vertex in `edges`; `component` = minimum
    * vertex id reachable from v. `maxIter` bounds the plain-propagation
    * phase; beyond it the star-contraction fallback takes over. */
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
    // per-round checkpoints with deterministic release of superseded
    // rounds (see LocalCheckpoints: Dataset.unpersist is a no-op for
    // checkpointed frames). The LIVE round's blocks are never released —
    // a checkpoint's lineage is truncated, so they are unrecoverable.
    var (labels, liveBlocks) = LocalCheckpoints.tracked(
      sym.select(col("a").as("v")).distinct().withColumn("l", col("v")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym.join(labels, sym("b") === labels("v"))
        .groupBy(col("a")).agg(min(col("l")).as("nl"))
      // the old label rides along in the checkpointed frame so the
      // convergence check is a filter over materialized rows, not an
      // extra join+recompute per round
      val (next, nextBlocks) = LocalCheckpoints.tracked(
        labels.join(nbrMin, labels("v") === nbrMin("a"), "left")
          .select(col("v"), least(col("l"), coalesce(col("nl"), col("l"))).as("l"),
            col("l").as("lold")))
      converged = next.filter(col("l") =!= col("lold")).isEmpty
      labels = next.drop("lold")
      LocalCheckpoints.release(liveBlocks)
      liveBlocks = nextBlocks
      i += 1
    }
    // a graph with diameter > maxIter (e.g. a long chain of
    // incrementally-edited near-dups) must not silently report one true
    // cluster as several — switch to the O(log)-round star contraction.
    // (both phases end in localCheckpointed frames, so releasing sym's
    // cache here cannot trigger recomputation)
    val out =
      if (converged) labels.select(col("v"), col("l").as("component"))
      else {
        // the propagation labels are discarded — release before the
        // star-contraction phase builds its own round frames
        LocalCheckpoints.release(liveBlocks)
        starContract(sym)
      }
    sym.unpersist()
    out
  }

  /** INCREMENTAL maintenance: fold a batch of NEW edges into an
    * already-converged (v, component) labeling without re-walking the
    * old graph. Each old component is replaced by its star (v →
    * component root), which preserves exactly its vertex set and its
    * minimum id — so components over (stars ∪ newEdges) equal
    * components over (oldEdges ∪ newEdges), but the propagation depth
    * is the NEW linkage structure over 2-deep stars, not the original
    * graph's diameter: the nightly ingest never pays the historical
    * corpus's convergence rounds again. New vertices appearing only in
    * `newEdges` join as themselves.
    *
    * At 100 TB this is the difference between touching the
    * (model-sized-per-vertex) label table plus the day's pair evidence,
    * and re-running clustering over every pair ever observed. */
  def merge(labels: DataFrame, newEdges: DataFrame,
            srcCol: String, dstCol: String, maxIter: Int = 25): DataFrame = {
    val stars = labels.select(col("v").as(srcCol), col("component").as(dstCol))
    components(stars.unionByName(
      newEdges.select(col(srcCol), col(dstCol))), srcCol, dstCol, maxIter)
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * SOCC'14 §3): repeatedly rewrite the edge set until it is a star
    * forest rooted at each component's minimum id.
    *
    *  - large-star: per vertex u over its full neighborhood, attach every
    *    LARGER neighbor v > u to m = min(N(u) ∪ {u});
    *  - small-star: per vertex u over its smaller neighbors (canonical
    *    (u > v) orientation), attach them — and u itself — to their
    *    minimum.
    *
    * Both steps preserve connectivity and only ever decrease the id a
    * vertex points at, so the fixpoint is the unique min-rooted forest —
    * same answer as label propagation, partitioning-invariant. Each round
    * is groupBy-min + equi-join (shuffle-keyed, AQE-plannable); the round
    * count is poly-log in component size rather than linear in diameter. */
  private def starContract(sym: DataFrame, maxRounds: Int = 50): DataFrame = {
    val verts = sym.select(col("a").as("v")).distinct().localCheckpoint()
    var (e, liveBlocks) = LocalCheckpoints.tracked(
      sym.filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct())
    var converged = false
    var r = 0
    while (!converged && r < maxRounds) {
      // large-star over symmetric neighborhoods
      val n = e.select(col("u").as("x"), col("v").as("y"))
        .union(e.select(col("v").as("x"), col("u").as("y")))
      val mins = n.groupBy("x").agg(min(col("y")).as("mn"))
        .select(col("x"), least(col("mn"), col("x")).as("m"))
      val ls = n.join(mins, "x").filter(col("y") > col("x"))
        .select(col("y").as("u"), col("m").as("v")) // m <= x < y, canonical
        .distinct()
      // small-star over the canonical (u > v) orientation
      val mins2 = ls.groupBy("u").agg(min(col("v")).as("m"))
      val (ss, ssBlocks) = LocalCheckpoints.tracked(
        ls.join(mins2, "u")
          .select(col("v").as("child"), col("m"))
          .filter(col("child") =!= col("m"))
          .select(col("child").as("u"), col("m").as("v")) // child >= m, no loops
          .union(mins2.select(col("u"), col("m").as("v"))) // m < u by minimality
          .distinct())
      converged = ss.except(e).isEmpty && e.except(ss).isEmpty
      e = ss
      LocalCheckpoints.release(liveBlocks) // after the except checks read old e
      liveBlocks = ssBlocks
      r += 1
    }
    if (!converged) throw new IllegalStateException(
      s"star contraction did not converge within $maxRounds rounds")
    // e is a star forest (child u -> root v); roots and edge-less
    // vertices (self-loop-only) label themselves.
    val stars = e.select(col("u").as("sv"), col("v").as("root"))
    verts.join(stars, verts("v") === col("sv"), "left")
      .select(col("v"), coalesce(col("root"), col("v")).as("component"))
  }
}
