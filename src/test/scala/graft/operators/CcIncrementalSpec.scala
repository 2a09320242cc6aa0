package graft.operators

import graft.SparkSpec

/** ConnectedComponents.merge contract: folding new edges into converged
  * labels equals the full recompute on the union — on random graphs, on
  * batches that JOIN previously separate components, and on vertices
  * seen for the first time in the new batch.
  */
class CcIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def full(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def incremental(oldE: Seq[(Long, Long)],
                          newE: Seq[(Long, Long)]): Map[Long, Long] = {
    val labels = ConnectedComponents.components(oldE.toDF("a", "b"), "a", "b")
    ConnectedComponents.merge(labels, newE.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("merge equals full recompute on pseudo-random edge splits") {
    for (seed <- 1L to 3L) {
      var x = seed
      def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); math.abs(x) }
      val edges = (1 to 80).map(_ => (next() % 25, next() % 25))
        .filter(e => e._1 != e._2)
      val (oldE, newE) = edges.splitAt(50)
      assert(incremental(oldE, newE) === full(edges),
        s"seed $seed: incremental labels diverged from the full recompute")
    }
  }

  test("a new batch that bridges two old components merges them to the union min") {
    val oldE = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))
    val newE = Seq((3L, 10L)) // bridge
    val got = incremental(oldE, newE)
    assert(got === full(oldE ++ newE))
    assert(got.values.toSet === Set(1L), "bridged components must share min id 1")
  }

  test("vertices first seen in the new batch join correctly") {
    val oldE = Seq((5L, 6L))
    val newE = Seq((6L, 100L), (200L, 201L)) // one attaches, one is fresh
    val got = incremental(oldE, newE)
    assert(got === full(oldE ++ newE))
    assert(got(100L) === 5L && got(200L) === 200L && got(201L) === 200L)
  }

  test("merging an empty-change batch reproduces the old labels") {
    val oldE = Seq((1L, 2L), (3L, 4L))
    // re-sending a known edge must not move any label
    assert(incremental(oldE, Seq((1L, 2L))) === full(oldE))
  }
}
