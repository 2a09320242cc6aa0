package graft.plans

import graft.SparkSpec

/** Plan-shape sweep over the 15 most expensive gate queries (round-9
  * bench board) — the round-9 verdict's item 8. For each, the physical
  * plan must contain no BroadcastNestedLoopJoin, no CartesianProduct,
  * and no SinglePartition exchange EXCEPT where the query's design
  * deliberately uses one, codified per query below:
  *
  *  - `bnlj`: broadcast-queries × corpus brute-force scoring — the
  *    deliberate ground-truth / deliberate-broadcast-scan tier (recall
  *    evals score a sampled query set against the full corpus; the
  *    contrastive miner broadcasts pair-bounded anchors over one corpus
  *    pass). Bounded: one side is always sample/model-sized.
  *  - `single`: a SinglePartition exchange of an already-aggregated
  *    summary frame (one-row outputs, global top-k over model-sized
  *    frames) — never of corpus-sized data.
  *
  * A regression that introduces a NEW nested-loop join, cartesian
  * product, or corpus-wide single-partition funnel into any of these
  * plans fails this suite. */
class HeavyPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private case class Allow(bnlj: Boolean = false, single: Boolean = false)

  // query -> sanctioned deviations (reasons above)
  private val heavy: Seq[(String, Allow)] = Seq(
    "t_bpe_encode" -> Allow(),
    "a_ann_ivfpq_recall" -> Allow(bnlj = true),  // brute-force ground truth
    "d_banding_sweep" -> Allow(),
    "a_ann_whitened" -> Allow(bnlj = true),      // deliberate brute-force tier
    "t_calibration" -> Allow(),
    "a_contrastive_pairs" -> Allow(bnlj = true), // broadcast anchors × one corpus pass
    "a_ann_ivfpq_res_recall" -> Allow(bnlj = true), // brute-force ground truth
    "q_table_stats" -> Allow(single = true),     // one-row ANALYZE summary
    "d_method_agreement" -> Allow(bnlj = true, single = true), // 3 one-row aggregates crossed
    "d_lsh_eval" -> Allow(bnlj = true, single = true), // ground truth + one-row summary
    "d_containment" -> Allow(),
    "g_assortativity" -> Allow(single = true),   // one-row graph statistic
    "d_ngram_jaccard" -> Allow(),
    "g_pagerank" -> Allow(),
    "d_er_pipeline" -> Allow())

  heavy.foreach { case (name, allow) =>
    test(s"$name plan: no unsanctioned BNLJ/Cartesian/SinglePartition") {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      if (!allow.bnlj)
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name grew a nested-loop join")
      assert(!plan.contains("CartesianProduct"),
        s"$name grew a cartesian product")
      if (!allow.single)
        assert(!plan.contains("SinglePartition"),
          s"$name grew a single-partition exchange")
    }
  }
}
