package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lockstep guard between the documented gate surface (SURVEY §8.10's
  * oracle-ID inventory) and the code (`SparkEntry.queries` /
  * `SparkEntry.oracleSql`) — the round-9 verdict's ask: a future SURVEY
  * row can never ship without a gate entry, and a gate entry can never
  * ship undocumented. Also pins the invariant that every query has an
  * oracle (the driver's hash gate, not the weaker rows-only check). */
class GateInventorySpec extends AnyFunSuite {

  private def surveyInventory: Set[String] = {
    val text = {
      val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val start = text.indexOf("### 8.10 Oracle-gate inventory")
    assert(start >= 0, "SURVEY.md must contain '### 8.10 Oracle-gate inventory'")
    val sect = text.substring(start)
    val end = sect.indexOf("\n### ", 1)
    val body = if (end >= 0) sect.substring(0, end) else sect
    "`([a-z][a-z0-9_]*)`".r.findAllMatchIn(body).map(_.group(1)).toSet
  }

  test("SURVEY §8.10 inventory == SparkEntry.queries keys (both directions)") {
    val doc = surveyInventory
    val code = SparkEntry.queries.keySet
    val undocumented = (code -- doc).toSeq.sorted
    val unimplemented = (doc -- code).toSeq.sorted
    assert(undocumented.isEmpty,
      s"gate queries missing from SURVEY §8.10: ${undocumented.mkString(", ")}")
    assert(unimplemented.isEmpty,
      s"SURVEY §8.10 ids with no queries entry: ${unimplemented.mkString(", ")}")
  }

  test("no query key is defined in two modules (Map ++ would silently shadow one)") {
    def check(tag: String, modules: Seq[(String, Set[String])],
              merged: Set[String]): Unit = {
      val dupes = modules.combinations(2).flatMap { case Seq((na, a), (nb, b)) =>
        (a intersect b).map(k => s"$k ($na & $nb)")
      }.toSeq.sorted
      assert(dupes.isEmpty, s"duplicate $tag keys across modules: ${dupes.mkString(", ")}")
      assert(modules.map(_._2).reduce(_ ++ _) === merged,
        s"$tag module union must equal the merged gate surface")
    }
    // BOTH sides: a shadowed oracleSql would silently hash Spark output
    // against the wrong SQL even with the queries side unshadowed
    check("queries", Seq(
      "CoreQueries" -> graft.queries.CoreQueries.queries.keySet,
      "PipelineQueries" -> graft.queries.PipelineQueries.queries.keySet,
      "ParityQueries" -> graft.queries.ParityQueries.queries.keySet,
      "MediaQueries" -> graft.queries.MediaQueries.queries.keySet,
      "SinkQueries" -> graft.queries.SinkQueries.queries.keySet,
      "AnalyticsQueries" -> graft.queries.AnalyticsQueries.queries.keySet,
      "StatQueries" -> graft.queries.StatQueries.queries.keySet),
      SparkEntry.queries.keySet)
    check("oracleSql", Seq(
      "CoreQueries" -> graft.queries.CoreQueries.oracleSql.keySet,
      "PipelineQueries" -> graft.queries.PipelineQueries.oracleSql.keySet,
      "ParityQueries" -> graft.queries.ParityQueries.oracleSql.keySet,
      "MediaQueries" -> graft.queries.MediaQueries.oracleSql.keySet,
      "SinkQueries" -> graft.queries.SinkQueries.oracleSql.keySet,
      "AnalyticsQueries" -> graft.queries.AnalyticsQueries.oracleSql.keySet,
      "StatQueries" -> graft.queries.StatQueries.oracleSql.keySet),
      SparkEntry.oracleSql.keySet)
  }

  test("every queries entry has an oracleSql entry and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }
}
