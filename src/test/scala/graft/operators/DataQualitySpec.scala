package graft.operators

import graft.SparkSpec

/** DataQuality.check against planted violations of every rule class,
  * pinning the documented null semantics.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality._

  // planted: id 4 duplicated; name null once; score -1 out of range and
  // one null score (NOT a range violation); code "xx" outside accepted;
  // fk 99 orphaned; fk null (NOT a ref violation)
  private lazy val df = Seq(
    (1L, Option("alpha"), Option(10.0), "aa", Option(1L)),
    (2L, Option("beta"), Option(-1.0), "xx", Option(2L)),
    (3L, None: Option[String], Option(50.0), "aa", Option(99L)),
    (4L, Option("gamma"), None: Option[Double], "bb", None: Option[Long]),
    (4L, Option("delta"), Option(99.5), "bb", Option(1L))
  ).toDF("id", "name", "score", "code", "fk")
  private lazy val dim = Seq(1L, 2L, 3L).toDF("k")

  private def results = check(df, Seq(
      NotNull("name"),
      InRange("score", 0, 100),
      Matches("name", "^[a-z]+$"),
      Accepted("code", Seq("aa", "bb")),
      Unique(Seq("id")),
      RefIntegrity("fk", dim, "k")))
    .collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap

  test("every rule class counts exactly its planted violations") {
    val r = results
    assert(r(("not_null", "name")) === ((5L, 1L, false)))
    // score -1 violates; the NULL score does not (ternary semantics)
    assert(r(("in_range", "score")) === ((5L, 1L, false)))
    // the null name is not a regex violation either
    assert(r(("matches", "name")) === ((5L, 0L, true)))
    assert(r(("accepted", "code")) === ((5L, 1L, false)))
    // 5 rows, 4 distinct ids -> one extra row
    assert(r(("unique", "id")) === ((5L, 1L, false)))
    // fk 99 is an orphan; the null fk is not
    assert(r(("ref_integrity", "fk")) === ((5L, 1L, false)))
  }

  test("a clean table passes every rule") {
    val clean = Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("id", "name", "fk")
    val out = check(clean, Seq(
        NotNull("name"), Unique(Seq("id")), RefIntegrity("fk", dim, "k")))
      .collect()
    assert(out.length === 3 && out.forall(_.getBoolean(4)))
    assert(out.forall(_.getLong(3) === 0L))
  }

  test("an EMPTY batch passes every rule with zero violations (not NULL)") {
    val empty = df.filter($"id" < 0)
    val out = check(empty, Seq(
        NotNull("name"), InRange("score", 0, 100), Unique(Seq("id")),
        RefIntegrity("fk", dim, "k")))
      .collect()
    assert(out.length === 4)
    assert(out.forall(r => r.getLong(3) === 0L && r.getBoolean(4)),
      "empty input must report 0 violations / passed=true for every rule")
  }

  test("unique treats a null-key group as ONE distinct value (documented semantics)") {
    val d = Seq(Option(1L), None, None, None, Option(2L)).toDF("id")
    val r = check(d, Seq(Unique(Seq("id")))).head
    // 5 rows, distinct values {1, 2, null-group} -> 2 extra rows
    assert(r.getLong(3) === 2L)
  }

  test("row-scan rules share one aggregate pass (single scan in the plan)") {
    val plan = check(df, Seq(NotNull("name"), InRange("score", 0, 100),
        Accepted("code", Seq("aa")), Matches("code", "^[a-z]+$")))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case s if s.nodeName == "LogicalRDD" => s
    }
    assert(scans.size === 1,
      s"four scan rules must fold into one pass, found ${scans.size} scans")
  }
}
