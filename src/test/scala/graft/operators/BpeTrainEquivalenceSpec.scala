package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Driver ≡ distributed BPE trainer equivalence (the round-11 scale
  * item): `bpeTrainDistributed` must reproduce `bpeTrain`'s merge table
  * BIT-identically — same pairs, same order, same counts — because the
  * driver loop is by construction the same algorithm run on a collected
  * word table. Checked on the gate corpus (the real documents fixture
  * the oracle hashes run over) and on planted tie/greedy/cap corpora
  * that stress each decision point the comparator and merge rules own. */
class BpeTrainEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def table(df: DataFrame): Seq[(Long, String, String, Long)] =
    df.orderBy("rk").collect().toSeq.map(r =>
      (r.getAs[Long]("rk"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("cnt")))

  private def assertEquiv(docs: DataFrame, rounds: Int,
                          minFreq: Long = 1, maxWords: Int = 1 << 22): Unit = {
    val driver = table(TextAnalysis.bpeTrain(
      docs, "text", rounds, minFreq, maxWords))
    // driverDispatchMaxWords = 0 pins the DISTRIBUTED rounds — the default
    // dispatch would route these small fixtures to the driver fast-path,
    // making the comparison vacuous (driver vs driver)
    val dist = table(TextAnalysis.bpeTrainDistributed(
      docs, "text", rounds, minFreq, maxWords, driverDispatchMaxWords = 0))
    assert(dist === driver)
  }

  test("distributed trainer ≡ driver trainer on the gate corpus (t_bpe_train shape)") {
    val docs = graft.catalog.TableCatalog.load(
      spark, "/root/testdata/sf0.001", "documents")
    assertEquiv(docs, rounds = 5)
  }

  test("distributed trainer ≡ driver trainer under minFreq thresholding (t_bpe_train_minfreq shape)") {
    val docs = graft.catalog.TableCatalog.load(
      spark, "/root/testdata/sf0.001", "documents")
    assertEquiv(docs, rounds = 5, minFreq = 3)
  }

  test("distributed trainer resolves count ties by (lhs, rhs) UTF-8 order like the driver") {
    // low x3 / lower / lowest: round 1 ties (l,o)=5 with (o,w)=5 — the
    // lex tiebreak must pick (l,o) in both trainers
    val docs = Seq((1L, "low low lower"), (2L, "low lowest")).toDF("doc_id", "text")
    assertEquiv(docs, rounds = 5)
    assert(table(TextAnalysis.bpeTrainDistributed(docs, "text", rounds = 5,
        driverDispatchMaxWords = 0)) ===
      Seq((1L, "l", "o", 5L), (2L, "lo", "w", 5L), (3L, "low", "e", 2L),
        (4L, "lowe", "r", 1L), (5L, "lowe", "s", 1L)))
  }

  test("distributed trainer merges self-pairs greedily left-to-right and stops when exhausted") {
    // aaaa: greedy non-overlapping -> [aa,aa]; round 2 merges (aa,aa);
    // training then ends at round 2 of 5 in both trainers
    val docs = Seq((1L, "aaaa"), (2L, "aaaa")).toDF("doc_id", "text")
    assertEquiv(docs, rounds = 5)
    assert(table(TextAnalysis.bpeTrainDistributed(docs, "text", rounds = 5,
        driverDispatchMaxWords = 0)) ===
      Seq((1L, "a", "a", 6L), (2L, "aa", "aa", 2L)))
  }

  test("distributed trainer applies the maxWords rank-cap identically") {
    val docs = Seq((1L, "zz zz zz yy yy xx"), (2L, "ww vv")).toDF("doc_id", "text")
    assertEquiv(docs, rounds = 3, maxWords = 2)
  }
}
