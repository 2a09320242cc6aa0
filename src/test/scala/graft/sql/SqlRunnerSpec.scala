package graft.sql

import graft.SparkSpec

/** S1/S4 engine-level behaviors around the SQL pass-through, including
  * the PINNED naive-split edge (SqlRunner.run Scaladoc). */
class SqlRunnerSpec extends SparkSpec {

  test("--SPLITTER-- unions independent statements by name") {
    val df = SqlRunner.run(spark,
      "SELECT 1 AS x --SPLITTER-- SELECT 2 AS x")
    assert(df.collect().map(_.getInt(0)).sorted === Array(1, 2))
  }

  test("PINNED: --SPLITTER-- inside a string literal still splits (reference parity)") {
    // The reference does query.split("--SPLITTER--") with no literal
    // awareness (SpannerQueryIO.java:29,75); a token inside a quoted
    // string splits the query into two broken statements there, and must
    // do the same here — bug-for-bug migration safety, pinned as a
    // decision. Both halves fail to parse, so the run throws.
    val q = "SELECT 'a--SPLITTER--b' AS s"
    intercept[Exception] { SqlRunner.run(spark, q).collect() }
  }

  test("@param rewriting binds values and skips literals") {
    assert(SqlRunner.rewriteParams("SELECT '@notparam' AS a, @p AS b") ===
      "SELECT '@notparam' AS a, :p AS b")
    val df = SqlRunner.run(spark,
      "SELECT '@notparam' AS a, @p AS b", Map("p" -> 42))
    val r = df.head
    assert(r.getString(0) === "@notparam")
    assert(r.getInt(1) === 42)
  }
}
