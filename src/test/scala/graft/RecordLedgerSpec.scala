package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical open-of-round record discipline (round-14 verdict item 2):
  * three rounds running, the newest driver-written round records
  * (BENCH_r<N>.json / CORRECTNESS_r<N>.json) sat uncommitted at verdict
  * time. This spec makes the commit a build gate instead of a habit —
  * `sbt test` fails at round open until every round-record file present
  * in the working tree is git-tracked, and until the newest BUILDLOG
  * round's own records exist AND are tracked.
  *
  * (HeavyPlanSpec already anchors to the newest GIT-TRACKED bench record,
  * so an untracked record also silently stales that anchor — this spec
  * turns the staleness into a red test.) */
class RecordLedgerSpec extends AnyFunSuite {

  private def gitTracked: Set[String] = {
    import scala.sys.process._
    try Process(Seq("git", "ls-files"), new java.io.File(".")).!!
      .linesIterator.toSet
    catch { case _: Exception => Set.empty }
  }

  private def roundRecordsOnDisk: Seq[String] = {
    val dir = new java.io.File(".")
    val pat = "^(BENCH|CORRECTNESS)_r\\d+\\.json$".r
    dir.listFiles().map(_.getName).filter(n => pat.findFirstIn(n).isDefined)
      .toSeq.sorted
  }

  test("every round-record file on disk is git-tracked") {
    val tracked = gitTracked
    assume(tracked.nonEmpty, "not a git checkout — nothing to enforce")
    val untracked = roundRecordsOnDisk.filterNot(tracked.contains)
    assert(untracked.isEmpty,
      s"round records present but NOT committed (commit them at round open " +
        s"per the open-of-round checklist): ${untracked.mkString(", ")}")
  }

  test("every closed BUILDLOG round section carries a bold CLOSE line") {
    // r15 shipped with its close line still reading "(CLOSE line with
    // final numbers at round end)" — the placeholder. This makes the
    // BUILDLOG close mechanical, the RecordLedgerSpec treatment (r15
    // verdict item 1d): once round N+1's header exists, round N's
    // section MUST contain a line starting with ** and containing CLOSE
    // (the convention every close since r9 follows). Enforced from
    // round 15 on — rounds 2-5 predate the convention and history is
    // not rewritten.
    val text = {
      val src = scala.io.Source.fromFile("BUILDLOG.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val headerRe = "(?m)^## Round (\\d+)".r
    val ms = headerRe.findAllMatchIn(text).toSeq
    assert(ms.nonEmpty, "BUILDLOG.md must contain '## Round N' headers")
    val newest = ms.map(_.group(1).toInt).max
    val sections = ms.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < ms.size) ms(i + 1).start else text.length
      (m.group(1).toInt, text.substring(m.end, end))
    }
    val closeRe = "(?m)^\\*\\*[^\\n]*CLOSE".r
    for ((n, body) <- sections if n >= 15 && n != newest)
      assert(closeRe.findFirstIn(body).isDefined,
        s"BUILDLOG round $n is closed (round $newest exists) but its " +
          "section has no '**…CLOSE…' line — fill the close line before " +
          "opening the next round")
  }

  test("the previous round's records exist and are tracked at round open") {
    // The driver writes BENCH_r{N}.json / CORRECTNESS_r{N}.json AFTER round
    // N closes, so during round N (newest BUILDLOG header) the newest
    // records that can exist are round N-1's — those are what the
    // open-of-round checklist must have committed (r14 verdict item 2).
    // Round N's own records, once the driver lands them, are covered by
    // the every-record-on-disk-is-tracked test above.
    val text = {
      val src = scala.io.Source.fromFile("BUILDLOG.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val rounds = "(?m)^## Round (\\d+)".r.findAllMatchIn(text)
      .map(_.group(1).toInt).toSeq
    assert(rounds.nonEmpty, "BUILDLOG.md must contain '## Round N' headers")
    val n = rounds.max - 1
    val tracked = gitTracked
    assume(tracked.nonEmpty, "not a git checkout — nothing to enforce")
    for (f <- Seq(s"BENCH_r$n.json", s"CORRECTNESS_r$n.json")) {
      assert(new java.io.File(f).exists(), s"$f missing from the working tree")
      assert(tracked.contains(f), s"$f exists but is not git-tracked")
    }
  }
}
