package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral specs for the round-6 operators: exact substring dedup
  * (Lee et al. 2022), the iterative BPE trainer, and IVF-PQ. Planted
  * inputs with hand-derivable outcomes; cross-engine value parity is the
  * oracle gate's job. */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("exactSubstringDedup removes a cross-doc repeated passage and nothing else") {
    // docs 1 and 2 share a 10-token passage: its 8-grams (3 of them) are
    // repeated corpus-wide, covering exactly the passage's 10 tokens in
    // each doc; boundary-straddling 8-grams mix in unique filler and are
    // NOT repeated, so the filler survives untouched
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    def filler(j: Int, m: Int) = (1 to m).map(i => s"f${j}x$i").mkString(" ")
    val docs = Seq(
      (1L, s"${filler(1, 9)} $passage ${filler(11, 9)}"),
      (2L, s"${filler(2, 9)} $passage ${filler(12, 9)}"),
      (4L, filler(4, 30)),
      (5L, "too short to gram")
    ).toDF("doc_id", "text")
    val r = Dedup.exactSubstringDedup(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
    val byId = r.map(x => x.getAs[Long]("doc_id") ->
      (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_removed"),
        x.getAs[String]("kept_text"))).toMap
    assert(byId(1L) === ((28L, 10L, s"${filler(1, 9)} ${filler(11, 9)}")))
    assert(byId(2L) === ((28L, 10L, s"${filler(2, 9)} ${filler(12, 9)}")))
    assert(byId(4L) === ((30L, 0L, filler(4, 30))))
    assert(byId(5L) === ((4L, 0L, "too short to gram")))
  }

  test("exactSubstringDedup removes a passage repeated WITHIN one document") {
    // Lee et al. count total occurrences, not distinct docs: a doc that
    // repeats its own 8-token block twice loses both occurrences
    val block = (1 to 8).map(i => s"b$i").mkString(" ")
    def filler(j: Int, m: Int) = (1 to m).map(i => s"g${j}x$i").mkString(" ")
    val docs = Seq(
      (1L, s"$block ${filler(1, 10)} $block"),
      (2L, filler(2, 25))
    ).toDF("doc_id", "text")
    val r = Dedup.exactSubstringDedup(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_removed") === 16L)
    assert(r(0).getAs[String]("kept_text") === filler(1, 10))
    assert(r(1).getAs[Long]("n_removed") === 0L)
  }
}
