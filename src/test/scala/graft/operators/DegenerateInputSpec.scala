package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Degenerate-corpus behavior: operators must return empty (or
  * trivially-correct) results — never throw — when documents are too
  * short to shingle, the eval/query set is empty, or the edge graph has
  * no edges. These are the shapes a real pipeline hits on its first or
  * last incremental batch. */
class DegenerateInputSpec extends SparkSpec {
  import spark.implicits._

  private val shortDocs = Seq(
    (1L, "one two"), (2L, "three"), (3L, "")
  ).toDF("doc_id", "text")

  test("shingle-based dedup ops are empty on sub-shingle docs") {
    assert(Dedup.ngramJaccard(shortDocs, "doc_id", "text").isEmpty)
    assert(Dedup.containment(shortDocs, "doc_id", "text").isEmpty)
    assert(Dedup.minhashLsh(shortDocs, "doc_id", "text").isEmpty)
  }

  test("ngramJaccard maxDf: an all-hot corpus empties cleanly, never throws") {
    // every shingle shared by every doc → the cap removes every posting;
    // docs with no surviving shingles must drop out, not divide by zero
    val allSame = (1L to 6L).map(i =>
      (i, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccard(allSame, "doc_id", "text", maxDf = 3L).isEmpty)
    // and the same corpus UNCAPPED is all-pairs jaccard 1.0 (sanity)
    assert(Dedup.ngramJaccard(allSame, "doc_id", "text").count() === 15L)
  }

  test("decontamination with an empty eval set reports nothing") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon")
    ).toDF("doc_id", "text")
    val r = Decontamination.flagContaminated(
      docs, "doc_id", "text", evalPred = col("doc_id") > 100L)
    assert(r.isEmpty)
  }

  test("bm25TopK on a corpus where every doc tokenizes empty yields finite zero scores") {
    // avgdl = 0 here; unguarded, dl/avgdl is 0/0 -> NaN scores and a
    // NaN-driven top-k whose order diverges from DuckDB's
    val empties = Seq((1L, ""), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val r = Similarity.bm25TopK(empties, "doc_id", "text", terms = Seq("alpha"))
      .collect()
    assert(r.length === 3)
    assert(r.forall(x => x.getAs[Double]("score") == 0.0))
    assert(r.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L))
  }

  test("bigramSurprise on sub-bigram docs returns empty (nothing to condition on)") {
    assert(TextAnalysis.bigramSurprise(shortDocs.filter(col("doc_id") > 1),
      "doc_id", "text").isEmpty)
  }

  test("bpeTrain on a pairless corpus (single-char words) returns an empty merge table") {
    // no word has an adjacent pair -> round 1 finds no argmax -> the
    // trainer stops immediately instead of looping or throwing
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(docs, "text", rounds = 3).isEmpty)
  }

  test("exactSubstringDedup on sub-n docs removes nothing and preserves every row") {
    val r = Dedup.exactSubstringDedup(shortDocs, "doc_id", "text", n = 8)
      .collect()
    assert(r.length === 3)
    assert(r.forall(_.getAs[Long]("n_removed") === 0L))
  }

  test("connected components on an empty edge list returns no vertices") {
    val edges = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(ConnectedComponents.components(edges, "d1", "d2").isEmpty)
  }

  test("hybridTopK with a query predicate matching nothing is empty") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta", Array(1.0f, 2.0f)),
      (2L, "alpha beta gamma other", Array(2.0f, 1.0f))
    ).toDF("doc_id", "text", "embedding")
    val r = Similarity.hybridTopK(corpus, col("doc_id") > 100L,
      "doc_id", "text", "embedding")
    assert(r.isEmpty)
  }

  test("chunk drops zero-token docs instead of emitting empty chunks") {
    val r = TextAnalysis.chunk(shortDocs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(r === Set(1L, 2L)) // doc 3 has no tokens
  }

  test("repetitionMetrics skips sub-trigram docs") {
    val r = TextAnalysis.repetitionMetrics(shortDocs, "doc_id", "text")
    assert(r.isEmpty) // no doc reaches 3 tokens
  }

  test("commonSegmentRemoval on sub-shingle docs keeps every doc, drops nothing") {
    val r = Dedup.commonSegmentRemoval(shortDocs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_segments"), x.getAs[Long]("n_kept"))).toMap
    assert(r.keySet === Set(1L, 2L, 3L))
    assert(r(3L) === ((0L, 0L)))             // empty doc: zero segments, present
    assert(r.forall { case (_, (ns, nk)) => ns === nk }) // nothing dropped
  }

  test("bm25TopK on an empty corpus is empty (no divide-by-zero on N=0)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Similarity.bm25TopK(empty, "doc_id", "text", Seq("alpha")).isEmpty)
  }

  test("pagerank on an empty pair list is empty") {
    val edges = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(PageRank.ranks(edges, "d1", "d2").isEmpty)
  }

  test("lshBandStats on sub-shingle docs is empty (no signatures to band)") {
    assert(Dedup.lshBandStats(shortDocs, "doc_id", "text").isEmpty)
  }

  test("semanticDedup on an empty frame is empty") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semanticDedup(empty, "vec_id", "embedding").isEmpty)
  }

  test("tfidf/surprise score only docs that have tokens") {
    assert(TextAnalysis.tfidfTopK(shortDocs, "doc_id", "text")
      .select("doc_id").distinct().as[Long].collect().toSet === Set(1L, 2L))
    assert(TextAnalysis.unigramSurprise(shortDocs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("ddSketch on an all-non-positive column is empty end to end") {
    val df = Seq(("a", 0.0), ("a", -1.0), ("b", -2.5)).toDF("s", "v")
    val sk = Sketches.ddSketchBuild(df, "s", "v")
    assert(sk.isEmpty)
    assert(Sketches.ddSketchQuantiles(sk, "s").isEmpty)
  }

  test("label propagation on an empty edge list returns no vertices") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(LabelPropagation.propagate(edges, "a", "b", rounds = 3).isEmpty)
  }

  test("label propagation on a self-loop-only graph returns no vertices") {
    val edges = Seq((7L, 7L)).toDF("a", "b")
    assert(LabelPropagation.propagate(edges, "a", "b", rounds = 2).isEmpty)
  }

  test("goldenRecord with an empty cluster frame is empty, not a crash") {
    val df = Seq((1L, "en", 10L)).toDF("doc_id", "lang", "n_chars")
    val clusters = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    assert(Dedup.goldenRecord(df, "doc_id", clusters, "cluster_id",
      majorityCols = Seq("lang"), maxCols = Seq("n_chars")).isEmpty)
  }

  test("incremental CC merge with an EMPTY new-edge batch reproduces the labels") {
    val oldE = Seq((1L, 2L), (5L, 6L)).toDF("a", "b")
    val labels = ConnectedComponents.components(oldE, "a", "b")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val merged = ConnectedComponents.merge(labels, empty, "a", "b")
    assert(merged.exceptAll(labels).isEmpty && labels.exceptAll(merged).isEmpty)
  }

  test("temperatureSample on a single stratum keeps ~targetFrac") {
    val df = (1L to 200L).map(i => (i, "only")).toDF("id", "lang")
    val r = Sampling.temperatureSample(df, "id", "lang", targetFrac = 0.5)
    val kept = r.count().toDouble / 200
    assert(kept > 0.3 && kept < 0.7)
    // single stratum -> rate is exactly min(1, targetFrac * n * n^a / n^a / n) = targetFrac
    assert(r.select("rate").distinct().as[Double].head() === 0.5)
  }
}
