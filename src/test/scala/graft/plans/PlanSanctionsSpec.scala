package graft.plans

import graft.SparkSpec

/** Machine enforcement of the full-surface plan-audit sanction set
  * (verdict r13 item 2 — the GateInventorySpec treatment applied to
  * PLANAUDIT): the committed PLANAUDIT.json record is diffed against
  * [[PlanSanctions.sanctioned]], so a NEW BroadcastNestedLoopJoin /
  * SinglePartition flag on ANY of the 320 gates fails the build the
  * round it appears — not the round the query becomes expensive enough
  * to enter HeavyPlanSpec's bench top-15. Gates added since the last
  * audit run (not yet in PLANAUDIT.json) are planned LIVE here on
  * sf0.001, so coverage never lapses mid-round; the close workflow
  * re-runs `graft.PlanAudit` and commits the refreshed record. */
class PlanSanctionsSpec extends SparkSpec {

  private val auditFile = new java.io.File("PLANAUDIT.json")

  private case class Flags(bnlj: Boolean, cartesian: Boolean,
                           single: Boolean, error: Boolean,
                           noCodegen: Boolean, unpushedScan: Boolean,
                           corpusBcast: Boolean)

  private lazy val audit: Map[String, Flags] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(auditFile)
    val it = root.fields()
    val buf = scala.collection.mutable.Map.empty[String, Flags]
    while (it.hasNext) {
      val e = it.next()
      buf(e.getKey) = Flags(
        bnlj = e.getValue.path("bnlj").asBoolean(false),
        cartesian = e.getValue.path("cartesian").asBoolean(false),
        single = e.getValue.path("single_partition").asBoolean(false),
        error = e.getValue.path("error").asBoolean(false),
        noCodegen = e.getValue.path("no_codegen").asBoolean(false),
        unpushedScan = e.getValue.path("unpushed_scan_filter").asBoolean(false),
        corpusBcast = e.getValue.path("corpus_broadcast").asBoolean(false))
    }
    buf.toMap
  }

  test("PLANAUDIT.json exists and names only current gate queries") {
    assert(auditFile.isFile,
      "PLANAUDIT.json missing — run `sbt \"runMain graft.PlanAudit\"` " +
        "and commit the record")
    assert(audit.nonEmpty, "PLANAUDIT.json parsed to zero queries")
    val unknown = audit.keySet -- graft.SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"audited queries no longer exist (stale record — re-run " +
        s"graft.PlanAudit): ${unknown.toSeq.sorted.mkString(", ")}")
  }

  test("zero cartesian products and zero plan errors on the audited surface") {
    val cart = audit.filter(_._2.cartesian).keys.toSeq.sorted
    val errs = audit.filter(_._2.error).keys.toSeq.sorted
    assert(cart.isEmpty, s"cartesian products (NO sanctioned class " +
      s"exists): ${cart.mkString(", ")}")
    assert(errs.isEmpty, s"queries failed to plan: ${errs.mkString(", ")}")
  }

  test("every audited bnlj / single_partition flag carries a sanction") {
    val missingBnlj = audit.filter { case (q, f) =>
      f.bnlj && !PlanSanctions.sanctioned.get(q).exists(_.bnlj)
    }.keys.toSeq.sorted
    val missingSingle = audit.filter { case (q, f) =>
      f.single && !PlanSanctions.sanctioned.get(q).exists(_.single)
    }.keys.toSeq.sorted
    assert(missingBnlj.isEmpty,
      s"NEW unsanctioned BroadcastNestedLoopJoin — review the plan and " +
        s"either fix the shape or add a reviewed PlanSanctions entry: " +
        s"${missingBnlj.mkString(", ")}")
    assert(missingSingle.isEmpty,
      s"NEW unsanctioned SinglePartition exchange — review the plan and " +
        s"either fix the shape or add a reviewed PlanSanctions entry: " +
        s"${missingSingle.mkString(", ")}")
  }

  test("every sanction entry names an existing gate query (no stale rows)") {
    val allNames = PlanSanctions.sanctioned.keySet ++
      PlanSanctions.noCodegenSanctioned.keySet ++
      PlanSanctions.unpushedScanSanctioned.keySet ++
      PlanSanctions.corpusBroadcastSanctioned.keySet
    val stale = allNames -- graft.SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"sanctions for queries that no longer exist: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
    // and every reason is a real review line, not a placeholder
    val blank = PlanSanctions.sanctioned.filter(_._2.reason.trim.isEmpty).keySet ++
      (PlanSanctions.noCodegenSanctioned ++
        PlanSanctions.unpushedScanSanctioned ++
        PlanSanctions.corpusBroadcastSanctioned)
        .filter(_._2.trim.isEmpty).keySet
    assert(blank.isEmpty,
      s"sanctions without a reviewed reason: ${blank.toSeq.sorted}")
  }

  test("r15 lints: no_codegen / unpushed_scan_filter / corpus_broadcast " +
      "flags all carry a sanction") {
    def diff(flag: Flags => Boolean, sanctions: Map[String, String]) =
      audit.filter { case (q, f) => flag(f) && !sanctions.contains(q) }
        .keys.toSeq.sorted
    val nc = diff(_.noCodegen, PlanSanctions.noCodegenSanctioned)
    assert(nc.isEmpty, s"NEW gate(s) with NO WholeStageCodegen in the " +
      s"executed plan — review (interpreted hot path? AQE empty-collapse " +
      s"at the audit SF?) and sanction or fix: ${nc.mkString(", ")}")
    val up = diff(_.unpushedScan, PlanSanctions.unpushedScanSanctioned)
    assert(up.isEmpty, s"NEW gate(s) with a Filter on a scan whose " +
      s"PushedFilters is EMPTY — a pushable predicate is being lost, or " +
      s"a new expression-predicate gate needs a reviewed sanction: " +
      s"${up.mkString(", ")}")
    val cb = diff(_.corpusBcast, PlanSanctions.corpusBroadcastSanctioned)
    assert(cb.isEmpty, s"NEW gate(s) broadcast-hinting a corpus-sized " +
      s"side (grows with the corpus — an OOM at 100 TB unless it is the " +
      s"priced %-sample tier): ${cb.mkString(", ")}")
  }

  test("gates added since the last audit run plan clean or sanctioned (live)") {
    val missing =
      (graft.SparkEntry.queries.keySet -- audit.keySet).toSeq.sorted
    // normally empty — only gates added mid-round, before the close
    // re-runs PlanAudit, pay the live planning cost here (sf0.001)
    missing.foreach { q =>
      val plan = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val s = PlanSanctions.sanctioned.getOrElse(q,
        PlanSanctions.Sanction(reason = "(unsanctioned)"))
      assert(!PlanFlags.cartesian(plan), s"$q (new gate) plans a " +
        "cartesian product — no sanctioned class exists")
      if (!s.bnlj) assert(!PlanFlags.bnlj(plan), s"$q (new gate) plans " +
        "an unsanctioned BroadcastNestedLoopJoin — review + sanction or fix")
      if (!s.single) assert(!PlanFlags.singlePartition(plan), s"$q (new " +
        "gate) plans an unsanctioned SinglePartition exchange — review + " +
        "sanction or fix")
      spark.catalog.clearCache()
    }
  }
}
