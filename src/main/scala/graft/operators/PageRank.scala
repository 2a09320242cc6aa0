package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected pair list — graph
  * centrality for the near-duplicate/overlap graphs the dedup family
  * produces. On a near-dup graph, rank concentrates on the "hub"
  * documents that many variants orbit (template sources, canonical
  * pages) — a quality-aware alternative to lowest-id when choosing
  * which cluster member to keep, and the standard importance score for
  * link-shaped corpora.
  *
  * Each iteration is one keyed equi-join (edges × current ranks) + one
  * per-vertex aggregate — the same all-shuffle-keyed shape as
  * [[ConnectedComponents]]: no driver-side graph state, AQE-plannable,
  * and the edge frame is cached once and reused across rounds.
  * `iters` is FIXED (not convergence-tested): deterministic output and
  * a bounded round count, which is what a production scoring pass wants.
  *
  * Cross-engine determinism: contributions round to 9 dp and
  * accumulate as decimal (order-independent); the damping constants are
  * computed symbolically (`1 - damping` in both engines — writing the
  * folded literal `0.15` would disagree with `1 - 0.85` in the last
  * ulp). Symmetrized graphs have no dangling vertices (every vertex has
  * degree >= 1), so no dangling-mass redistribution term is needed.
  *
  * Output: (v, pagerank) for every vertex of the pair graph. */
object PageRank {

  def ranks(pairs: DataFrame, srcCol: String, dstCol: String,
            damping: Double = 0.85, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"ranks needs iters >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    // symmetrize in one pass (see ConnectedComponents: a 2-select union
    // would run the upstream pair generation twice before the cache)
    val edges = pairs.select(explode(array(
        struct(col(srcCol).as("u"), col(dstCol).as("v")),
        struct(col(dstCol).as("u"), col(srcCol).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()
      .cache()
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
    val n = deg.count() // vertex count — one scalar to the driver
    if (n == 0) { // empty graph: 1/n below would be an ANSI divide-by-zero
      edges.unpersist()
      return deg.select(col("u").as("v"), lit(0.0).as("pagerank"))
    }
    var rank = deg.select(col("u").as("rv"),
      round(lit(1.0) / n, 9).as("r"))
    for (_ <- 1 to iters) {
      val contribs = edges.join(deg, "u")
        .join(rank, col("u") === col("rv"))
        .select(col("v"),
          round(col("r") / col("deg"), 9).cast("decimal(28,9)").as("c"))
      rank = contribs.groupBy("v")
        .agg(round((lit(1.0) - lit(damping)) / n +
          lit(damping) * sum(col("c")).cast("double"), 9).as("r"))
        .select(col("v").as("rv"), col("r"))
    }
    // materialize before releasing the edge cache (localCheckpoint
    // returns the truncated frame — the original keeps its lineage)
    val out = rank.select(col("rv").as("v"), col("r").as("pagerank"))
      .localCheckpoint()
    edges.unpersist()
    out
  }
}
