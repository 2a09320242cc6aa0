package graft.plans

import graft.SparkSpec

/** Plan-shape sweep over the 15 most expensive gate queries of the
  * LATEST committed driver bench record (`BENCH_r<N>.json`, highest N —
  * the round-10 verdict's item 5: plan pins must TRACK cost, not stay
  * frozen to an old board). For each board query, the physical plan must
  * contain no BroadcastNestedLoopJoin, no CartesianProduct, and no
  * SinglePartition exchange EXCEPT where the query's design deliberately
  * uses one, codified in the sanctions map below:
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
  * product, or corpus-wide single-partition funnel into any board plan
  * fails this suite — and a NEW query entering the top 15 without a
  * recorded sanction entry fails loudly, forcing its shape to be
  * reviewed and codified the round it becomes expensive. */
class HeavyPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private case class Allow(bnlj: Boolean = false, single: Boolean = false)

  // query -> sanctioned deviations (reasons in comments; queries with no
  // deviation are listed too — membership is the review record)
  private val sanctions: Map[String, Allow] = Map(
    "t_calibration" -> Allow(),                  // fixed-round GD, linear passes
    "d_banding_sweep" -> Allow(),                // signatures computed once, band regroups
    "g_assortativity" -> Allow(single = true),   // one-row graph statistic
    "a_ann_whitened" -> Allow(bnlj = true),      // deliberate brute-force tier
    "d_method_agreement" -> Allow(bnlj = true, single = true), // 3 one-row aggregates crossed
    "q_table_stats" -> Allow(single = true),     // one-row ANALYZE summary
    "d_ngram_jaccard" -> Allow(),                // AllPairs prefix-filter equi-join
    "d_lsh_eval" -> Allow(bnlj = true, single = true), // ground truth + one-row summary
    "a_ann_ivfpq_res_recall" -> Allow(bnlj = true), // brute-force ground truth
    "g_pagerank" -> Allow(),                     // keyed join+agg rounds
    "d_er_pipeline" -> Allow(),                  // blocked equi-join linkage
    "d_containment" -> Allow(),                  // shared-shingle equi-join
    "g_modularity" -> Allow(bnlj = true, single = true), // one-row edge-total crossed onto per-community aggregates
    "st_cms_window" -> Allow(),                  // keyed windowed sketch agg
    "m_media_semantic_dedup" -> Allow(),         // cluster-blocked pair join
    "d_cluster_best" -> Allow(),                 // per-cluster survivor agg
    "g_kcore" -> Allow(),                        // keyed peeling rounds
    "a_ann_ivfsq_recall" -> Allow(bnlj = true),  // brute-force ground truth
    "d_curation_pipeline" -> Allow(),            // staged keyed filters
    "t_topic_coherence" -> Allow(),              // token passes + bounded-model join
    "t_bpe_encode" -> Allow(),                   // map-only kernel scan
    "a_ann_ivfpq_recall" -> Allow(bnlj = true),  // brute-force ground truth
    "a_contrastive_pairs" -> Allow(bnlj = true), // broadcast anchors × one corpus pass
    "q_corr_matrix" -> Allow(single = true),     // one-row moment totals crossed
    // reviewed proactively (round-11 additions likely to enter the board)
    "g_label_prop" -> Allow(),                   // keyed LPA rounds, WindowGroupLimit argmax
    "g_cc_incremental" -> Allow(),               // star edges + keyed CC rounds
    "d_golden_record" -> Allow(),                // keyed join + per-field argmax
    "t_ddsketch_ledger" -> Allow(bnlj = true),   // day × bucket model-grid cross (t_hll_ledger class)
    "q_dq_checks" -> Allow(single = true),       // one-row rule summaries unioned
    // near-board ANN tier (final-board positions 18-20), reviewed:
    "a_ann_ivfpq_res_topk" -> Allow(),           // bucketed probe, broadcast codebooks
    "a_ann_ivf2_recall" -> Allow(bnlj = true),   // fixed-count brute-force ground truth
    "a_ann_ivfpq_stored" -> Allow(),             // code-store serve, broadcast model
    "a_ann_ivf2_topk" -> Allow(),                // two-level probe, broadcast models
    "d_minhash_stored" -> Allow(),               // stored-signature band join
    // r12-board entrant, reviewed round 13:
    "t_bigram_surprise" -> Allow(bnlj = true, single = true), // one-row vocab-size agg (SinglePartition) broadcast-crossed onto the scored bigram frame (d_lsh_eval class)
    // r13 new gate, reviewed proactively (d_ngram_jaccard + a capped-
    // postings pre-pass: df aggregate + anti-join + regroup, all keyed):
    "d_ngram_jaccard_capped" -> Allow())

  /** Top-15 of the newest committed BENCH_r<N>.json (driver record).
    * "Committed" is literal: the candidate set comes from
    * `git ls-files`, so an untracked record in a dev tree cannot
    * silently re-anchor the board away from what a clean checkout
    * would pin (ADVICE r11). Falls back to a directory listing only
    * where git is unavailable (e.g. an exported tree). */
  private def board: Seq[String] = {
    val re = raw"BENCH_r(\d+)\.json".r
    // None = no usable git answer (git missing, or cwd is not itself a
    // repo root — an exported tree nested under some UNRELATED enclosing
    // repo would make ls-files exit 0 with an empty, wrong answer) →
    // directory-listing fallback. Some(list) = git's answer is
    // AUTHORITATIVE, even when the list filters to empty (a deleted-in-
    // worktree tracked record must fail loudly, not silently re-anchor
    // on an untracked one). Caveat (accepted): content still reads from
    // the working tree — git guarantees the NAME set only.
    val inThisRepo = new java.io.File(".git").exists // dir, or worktree file
    val tracked: Option[Seq[java.io.File]] =
      if (!inThisRepo) None
      else try {
        val p = new ProcessBuilder("git", "ls-files", "BENCH_r*.json")
          .redirectErrorStream(true).start()
        val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
        if (p.waitFor() == 0)
          Some(out.map(new java.io.File(_))
            .filter(f => f.isFile && re.pattern.matcher(f.getName).matches))
        else None
      } catch { case _: java.io.IOException => None }
    val files = tracked.getOrElse(
      new java.io.File(".").listFiles.toSeq
        .filter(f => re.pattern.matcher(f.getName).matches))
    assert(files.nonEmpty,
      "no committed BENCH_r<N>.json found (git-tracked set is authoritative)")
    val latest = files.maxBy(f =>
      re.findFirstMatchIn(f.getName).get.group(1).toInt)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(latest)
    val qs = {
      val parsed = root.path("parsed").path("queries")
      if (!parsed.isMissingNode && parsed.isObject) parsed
      else if (root.path("queries").isObject) root.path("queries")
      else {
        // driver records have hit parsed=null on stdout truncation
        // (BENCH_r08/r09); the compact final line survives verbatim
        // inside the raw "tail" string — recover the last
        // {"metric":"total",...,"queries":{...}} object from it
        val tail = root.path("tail").asText("")
        val start = tail.lastIndexOf("{\"metric\":\"total\"")
        assert(start >= 0, s"${latest.getName}: no parsed queries and no " +
          "compact bench line in tail")
        // Jackson's streaming parser anchored at the found offset reads
        // exactly ONE complete JSON value and stops at its true end —
        // unlike the previous hand-rolled brace scanner it honors
        // backslash escapes inside string values (ADVICE r12), and any
        // truncated/malformed object fails the parse loudly here rather
        // than mis-slicing silently
        val p = mapper.getFactory.createParser(tail.substring(start))
        val node = try mapper.readTree[com.fasterxml.jackson.databind.JsonNode](p)
          finally p.close()
        assert(node != null && node.isObject,
          s"${latest.getName}: compact bench line did not parse as an object")
        node.path("queries")
      }
    }
    assert(qs.isObject, s"${latest.getName} carries no queries map")
    val it = qs.fields()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue.asDouble)) }
    buf.sortBy(-_._2).take(15).map(_._1).toSeq
  }

  board.foreach { name =>
    test(s"$name plan: no unsanctioned BNLJ/Cartesian/SinglePartition") {
      assert(sanctions.contains(name),
        s"'$name' entered the bench top-15 without a sanctions entry — " +
          "review its plan shape and codify the allowed deviations here")
      val allow = sanctions(name)
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      // detection shared with graft.PlanAudit via PlanFlags — the
      // full-surface audit and this board pin check the SAME contract
      if (!allow.bnlj)
        assert(!PlanFlags.bnlj(plan), s"$name grew a nested-loop join")
      assert(!PlanFlags.cartesian(plan), s"$name grew a cartesian product")
      if (!allow.single)
        assert(!PlanFlags.singlePartition(plan),
          s"$name grew a single-partition exchange")
    }
  }
}
