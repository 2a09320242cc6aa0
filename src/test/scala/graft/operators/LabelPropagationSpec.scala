package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Synchronous-LPA contract: equivalence to an in-memory reference on
  * random graphs, partitioning invariance, and the community-vs-
  * component distinction on hand-built structure.
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference: synchronous neighbor-majority with min-label
    * ties — the semantics propagate() must reproduce distributed. */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    // NO dedup: parallel input edges vote with multiplicity, exactly
    // as the distributed explode-and-count does
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var labels = sym.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      labels = sym.map { case (v, nbrs) =>
        val counts = nbrs.groupBy(labels).map { case (l, xs) => l -> xs.size }
        val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        v -> best
      }
    }
    labels
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelPropagation.propagate(edges.toDF("a", "b"), "a", "b", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the reference implementation on pseudo-random graphs") {
    // deterministic pseudo-random edges from a hash recurrence (no
    // Math.random: specs replay bit-identically)
    for (seed <- 1L to 3L) {
      var x = seed
      def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); math.abs(x) }
      val edges = (1 to 120).map(_ => (next() % 30, next() % 30))
        .filter(e => e._1 != e._2)
      for (rounds <- Seq(1, 2, 4))
        assert(run(edges, rounds) === reference(edges, rounds),
          s"seed $seed rounds $rounds diverged from the reference")
    }
  }

  test("two cliques joined by one bridge: communities split where components cannot") {
    // K4 {1..4} and K4 {11..14} bridged by (4, 11)
    def k4(base: Long) = for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (base + i, base + j)
    val edges = k4(1) ++ k4(11) :+ (4L -> 11L)
    val labels = run(edges, 4)
    // one component (CC would merge all), but LPA keeps two label groups
    val cc = ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .select("component").distinct().count()
    assert(cc === 1L)
    val left = Set(1L, 2L, 3L, 4L).map(labels)
    val right = Set(11L, 12L, 13L, 14L).map(labels)
    assert(left.size === 1 && right.size === 1,
      s"each clique must agree on one label, got $labels")
    assert(left != right, "the bridge must not merge the cliques' labels")
  }

  test("result is invariant under repartitioning") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 4L))
    val base = run(edges, 3)
    val shuffled = LabelPropagation.propagate(
        edges.toDF("a", "b").repartition(7), "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base === shuffled)
  }

  test("self-loops are dropped and cannot entrench a label") {
    val withLoop = Seq((1L, 1L), (1L, 2L), (2L, 3L))
    val without = Seq((1L, 2L), (2L, 3L))
    assert(run(withLoop, 2) === run(without, 2))
  }
}
