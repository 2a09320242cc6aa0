package graft.operators

import graft.SparkSpec

/** Count-based dispatch in the single public BPE trainer (the round-11
  * verdict's collect-footgun item): `bpeTrainDistributed` routes small
  * vocabularies to the driver fast-path and everything else to the
  * distributed rounds, and the choice is output-invisible because the
  * two paths are bit-identical (BpeTrainEquivalenceSpec). This spec pins
  * the dispatch SEMANTICS: which path runs for which threshold, and that
  * the routed output equals the pinned-path output either way. */
class BpeDispatchSpec extends SparkSpec {
  import spark.implicits._

  private val docs =
    Seq((1L, "low low lower"), (2L, "low lowest")).toDF("doc_id", "text")

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rk").collect().toSeq.map(r =>
      (r.getAs[Long]("rk"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("cnt")))

  test("a vocabulary at or under the threshold dispatches to the driver fast-path") {
    val out = table(TextAnalysis.bpeTrainDistributed(docs, "text", rounds = 3))
    assert(TextAnalysis.lastBpeTrainPath === "driver")
    assert(out === table(TextAnalysis.bpeTrainDistributed(
      docs, "text", rounds = 3, driverDispatchMaxWords = 0)))
  }

  test("threshold 0 pins the distributed rounds regardless of corpus size") {
    TextAnalysis.bpeTrainDistributed(
      docs, "text", rounds = 1, driverDispatchMaxWords = 0).collect()
    assert(TextAnalysis.lastBpeTrainPath === "distributed")
  }

  test("a vocabulary above the threshold dispatches to the distributed rounds") {
    // 4 distinct words ("low","lower","lowest" + "aaaa") vs threshold 1:
    // the approx distinct count (exact at this cardinality) exceeds it
    val wide = docs.unionByName(Seq((3L, "aaaa")).toDF("doc_id", "text"))
    val routed = table(TextAnalysis.bpeTrainDistributed(
      wide, "text", rounds = 3, driverDispatchMaxWords = 1))
    assert(TextAnalysis.lastBpeTrainPath === "distributed")
    assert(routed === table(TextAnalysis.bpeTrainDistributed(
      wide, "text", rounds = 3, driverDispatchMaxWords = 1L << 16)))
  }

  test("the driver path stays reachable only through dispatch (single public trainer)") {
    // compile-time contract: bpeTrain is private[operators]; this spec
    // lives in the package so it CAN see it — the assertion here is the
    // runtime one, that dispatch reproduces it exactly
    val direct = table(TextAnalysis.bpeTrain(docs, "text", rounds = 3))
    val dispatched = table(TextAnalysis.bpeTrainDistributed(docs, "text", rounds = 3))
    assert(dispatched === direct)
  }
}
