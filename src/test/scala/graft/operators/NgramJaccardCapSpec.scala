package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The `maxDf` hot-shingle cap of [[Dedup.ngramJaccard]] (verdict r12
  * item 7 — the knob `fingerprintOverlap` already had, brought to the
  * sf10 scale ceiling of the bench board):
  *  1. equivalence — on the GATE corpus, a cap that no shingle reaches
  *     must produce char-identical results through the capped code path
  *     (the knob defaults off; the gate's committed oracle values stay
  *     byte-identical);
  *  2. teeth — a planted boilerplate shingle family (the SkewGen crawl
  *     shape) must be excluded from the candidate join, with the
  *     false-family pair volume collapsing while true near-dup pairs
  *     survive via their non-boilerplate shingles. */
class NgramJaccardCapSpec extends SparkSpec {
  import spark.implicits._

  private val gateDir = "/root/testdata/sf0.001"

  test("equivalence on the gate corpus: an unreached cap is exact") {
    val docs = graft.catalog.TableCatalog.load(spark, gateDir, "documents")
      .select(col("doc_id"), col("text"))
    val base = Dedup.ngramJaccard(docs, "doc_id", "text", minJaccard = 0.2)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
    // a finite cap forces the capped code path (Long.MaxValue short-
    // circuits it); no shingle in the 500-doc fixture reaches 1e6 df
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", minJaccard = 0.2,
        maxDf = 1000000L)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(capped === base, "unreached cap must not change any pair or score")
    assert(base.nonEmpty, "vacuous equivalence: the gate corpus yields no pairs")
  }

  test("teeth: a planted boilerplate shingle family is excluded by the cap") {
    // 100 docs; half share a 6-token boilerplate prefix (shingle-hot),
    // each doc otherwise unique filler; plus one true near-dup pair
    // whose overlap does NOT come from the boilerplate
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val rows = (1 to 100).map { i =>
      val filler = (1 to 10).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, if (i % 2 == 0) s"$boiler $filler" else filler)
    } ++ Seq(
      (201L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (202L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
    val docs = rows.toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(docs, "doc_id", "text", minJaccard = 0.15)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val boilerPairs = uncapped.count(p => p._1 <= 100L && p._2 <= 100L)
    assert(boilerPairs > 100,
      s"planted boilerplate family must dominate uncapped pairs, got $boilerPairs")
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", minJaccard = 0.15,
        maxDf = 10L)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(!capped.exists(p => p._1 <= 100L && p._2 <= 100L),
      "boilerplate-only pairs must vanish under the cap")
    assert(capped.contains((201L, 202L)),
      "the true near-dup pair must survive the cap (its shingles are cold)")
  }
}
