package graft.operators

import graft.SparkSpec

/** Dedup.goldenRecord survivorship semantics on planted clusters:
  * majority wins, ties break to the minimum value, null groups vote,
  * max fields take the cluster maximum.
  */
class GoldenRecordSpec extends SparkSpec {
  import spark.implicits._

  // cluster 10: lang majority "en" (2 vs 1); cluster 20: lang TIE
  // (de 1, fr 1) -> min value "de"; cluster 30: nulls outvote (2 null
  // vs 1 "en") -> null survives as the majority group
  private lazy val docs = Seq(
    (1L, Option("en"), 100L), (2L, Option("en"), 300L), (3L, Option("sv"), 200L),
    (4L, Option("de"), 50L), (5L, Option("fr"), 70L),
    (6L, None: Option[String], 10L), (7L, None: Option[String], 20L),
    (8L, Option("en"), 30L)
  ).toDF("doc_id", "lang", "n_chars")
  private lazy val clusters = Seq(
    (1L, 10L), (2L, 10L), (3L, 10L),
    (4L, 20L), (5L, 20L),
    (6L, 30L), (7L, 30L), (8L, 30L)
  ).toDF("doc_id", "cluster_id")

  private lazy val out = Dedup.goldenRecord(docs, "doc_id", clusters,
      "cluster_id", majorityCols = Seq("lang"), maxCols = Seq("n_chars"))
    .collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), Option(r.getString(3)))).toMap

  test("majority value survives; ties break to the minimum value") {
    assert(out(10L) === ((3L, 300L, Some("en"))))
    assert(out(20L) === ((2L, 70L, Some("de"))))
  }

  test("a null group votes like any other value and can win") {
    assert(out(30L) === ((3L, 30L, None)))
  }

  test("internal column names are guarded against collisions") {
    val bad = docs.withColumnRenamed("n_chars", "__gr_cnt")
    val e = intercept[IllegalArgumentException] {
      Dedup.goldenRecord(bad, "doc_id", clusters, "cluster_id",
        majorityCols = Seq("lang"), maxCols = Nil)
    }
    assert(e.getMessage.contains("__gr_cnt"))
  }
}
