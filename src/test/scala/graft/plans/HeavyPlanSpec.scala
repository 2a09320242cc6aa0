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

  // query -> sanctioned deviations, shared with the full-surface
  // enforcement (PlanSanctionsSpec) since r14: one committed review
  // record, [[PlanSanctions.sanctioned]], carries the flags AND the
  // reviewed one-line reasons for the whole gate surface. This spec
  // keeps the board-membership semantics on top: a NEW query entering
  // the bench top-15 without a sanctions entry fails loudly even if its
  // plan is clean — entering the board forces the review.
  private val sanctions = PlanSanctions.sanctioned

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
    // Newest USABLE record: a driver bench that timed out (BENCH_r16:
    // rc=124, parsed=null, tail holds only Spark startup logs) carries no
    // board at all — anchor on the next-newest record that does, instead
    // of aborting the whole suite on the driver's environmental failure.
    val byNewest = files.sortBy(f =>
      -re.findFirstMatchIn(f.getName).get.group(1).toInt)
    val boards = byNewest.iterator.map(f => f -> boardOf(f))
    val usable = boards.collectFirst { case (f, Some(qs)) => (f, qs) }
    assert(usable.nonEmpty, "no committed BENCH_r<N>.json carries a " +
      "queries map (all records empty/timed out?)")
    usable.get._2
  }

  /** The top-15 query names of one record, or None when the record
    * carries no queries map anywhere (a timed-out driver run). */
  private def boardOf(latest: java.io.File): Option[Seq[String]] = {
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
        if (start < 0) return None // no board in this record at all
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
    Some(buf.sortBy(-_._2).take(15).map(_._1).toSeq)
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
      assert(allow.reason.trim.nonEmpty, s"$name sanction has no reason")
    }
  }
}
