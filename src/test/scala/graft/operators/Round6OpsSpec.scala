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

  test("bpeTrain reproduces the hand-derived merge sequence on the classic low/lower/lowest corpus") {
    // words: low x3, lower x1, lowest x1. Round-by-round by hand:
    // 1: (l,o)=5 ties (o,w)=5, lex tiebreak -> (l,o)   2: (lo,w)=5
    // 3: (low,e)=2   4: all-1 tie -> lex (lowe,r)      5: (lowe,s)
    val docs = Seq((1L, "low low lower"), (2L, "low lowest")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTrain(docs, "text", rounds = 5)
      .orderBy("rk").collect()
      .map(x => (x.getAs[Long]("rk"), x.getAs[String]("lhs"),
        x.getAs[String]("rhs"), x.getAs[Long]("cnt")))
    assert(r.toSeq === Seq(
      (1L, "l", "o", 5L), (2L, "lo", "w", 5L), (3L, "low", "e", 2L),
      (4L, "lowe", "r", 1L), (5L, "lowe", "s", 1L)))
  }

  test("bpeTrain merges self-pairs greedily left-to-right and stops when no pair repeats") {
    // aaaa x2: (a,a) has 3 adjacent occurrences per word but greedy
    // merges positions (1,2) and (3,4) -> [aa,aa]; next round (aa,aa);
    // then single-symbol words end training at round 2 of 5
    val docs = Seq((1L, "aaaa"), (2L, "aaaa")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTrain(docs, "text", rounds = 5)
      .orderBy("rk").collect()
      .map(x => (x.getAs[Long]("rk"), x.getAs[String]("lhs"),
        x.getAs[String]("rhs"), x.getAs[Long]("cnt")))
    assert(r.toSeq === Seq((1L, "a", "a", 6L), (2L, "aa", "aa", 2L)))
  }

  test("bpeTrain minFreq: a sub-threshold word cannot contribute to or win a merge") {
    // low x3, lower x1, lowest x1. minFreq=2 leaves ONLY "low" in the
    // word table: (l,o) and (lo,w) count 3 (not 5 — the dropped words'
    // occurrences are gone from the counts too), and the rounds-3..5
    // merges of the unfiltered run ((low,e), (lowe,r), (lowe,s)) never
    // happen because every pair containing e/r/s/t lived in dropped words
    val docs = Seq((1L, "low low lower"), (2L, "low lowest")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTrain(docs, "text", rounds = 5, minFreq = 2)
      .orderBy("rk").collect()
      .map(x => (x.getAs[Long]("rk"), x.getAs[String]("lhs"),
        x.getAs[String]("rhs"), x.getAs[Long]("cnt")))
    assert(r.toSeq === Seq((1L, "l", "o", 3L), (2L, "lo", "w", 3L)))
  }

  test("bpeTrain maxWords rank-caps by (freq desc, word asc) before any merge") {
    // bb x3, aa x2, cc x1 — maxWords=2 keeps bb and aa; (c,c) can never
    // appear in a merge even though cc's pair would count 1
    val docs = Seq((1L, "bb bb bb aa"), (2L, "aa cc")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTrain(docs, "text", rounds = 5, maxWords = 2)
      .orderBy("rk").collect()
      .map(x => (x.getAs[Long]("rk"), x.getAs[String]("lhs"),
        x.getAs[String]("rhs"), x.getAs[Long]("cnt")))
    assert(r.toSeq === Seq((1L, "b", "b", 3L), (2L, "a", "a", 2L)))
  }

  test("ivfPqTopK: PQ-scored neighbors of a clustered corpus stay in the query's cluster") {
    // two interleaved DIRECTION clusters in 8 dims (odd ids spike even
    // dims, even ids spike odd dims, id-dependent magnitude jitter) — the
    // direction difference is visible inside EVERY 4-dim subspace slice,
    // which is what a cosine-metric codebook can quantize (a
    // magnitude-only split would be invisible to it). 40 vectors,
    // queries 10 and 25.
    val vecs = (1L to 40L).map { i =>
      val scale = 1.0f + 0.01f * (i % 5)
      val v = Array.tabulate(8)(d =>
        (if ((d + i % 2) % 2 == 0) 1.0f else 0.02f) * scale)
      (i, v)
    }.toDF("vec_id", "embedding")
    val r = Similarity.ivfPqTopK(vecs,
        vecs.filter(col("vec_id") === 10L || col("vec_id") === 25L),
        "vec_id", "embedding", k = 3, nprobe = 2, centroidEvery = 10,
        m = 2, ks = 2, iters = 2)
      .collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (q, n) = (x.getAs[Long]("qid"), x.getAs[Long]("nid"))
      assert(q % 2 === n % 2,
        s"neighbor $n of query $q crossed the direction-cluster boundary")
      assert(x.getAs[Long]("rk") <= 3L)
    }
  }

  test("bpeEncode under the trained table reproduces the trainer's segmentation counts") {
    // after the 5 hand-derived merges ((l,o),(lo,w),(low,e),(lowe,r),
    // (lowe,s)): low -> [low] (1), lower -> [lower] (1, round 4 merges
    // it fully), lowest -> [lowes, t] (2)
    val docs = Seq((1L, "low low lower"), (2L, "low lowest")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", rounds = 5)
      .orderBy("rk").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    val r = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_words"),
        x.getAs[Long]("n_bpe_tokens")))
    assert(r.toSeq === Seq((1L, 3L, 3L), (2L, 2L, 3L)))
  }

  test("pqEncode: same-direction-cluster vectors share codes, opposite clusters differ") {
    val vecs = (1L to 40L).map { i =>
      val scale = 1.0f + 0.01f * (i % 5)
      val v = Array.tabulate(8)(d =>
        (if ((d + i % 2) % 2 == 0) 1.0f else 0.02f) * scale)
      (i, v)
    }.toDF("vec_id", "embedding")
    val cbs = Similarity.pqTrain(vecs, "vec_id", "embedding",
      dims = 8, m = 2, ks = 2, iters = 2)
    val rows = Similarity.pqEncode(vecs, "vec_id", "embedding", cbs, dims = 8)
      .collect()
      .map(x => (x.getAs[Long]("vec_id"),
        (x.getAs[Long]("code_0"), x.getAs[Long]("code_1"))))
    val byParity = rows.groupBy(_._1 % 2).view.mapValues(_.map(_._2).distinct).toMap
    // within a direction cluster every vector quantizes identically...
    assert(byParity(0L).length === 1 && byParity(1L).length === 1)
    // ...and the two clusters land on different codebook entries in BOTH
    // subspaces (the direction difference is visible in each slice)
    assert(byParity(0L).head._1 !== byParity(1L).head._1)
    assert(byParity(0L).head._2 !== byParity(1L).head._2)
  }

  test("ivfPqResidualTopK: residual codebooks keep neighbors in-cluster; zero residuals don't throw") {
    // same direction-clustered corpus as the by_residual=false spec.
    // centroidEvery = 5 puts coarse centroids in BOTH clusters — the
    // residual-PQ premise is that residuals are small, which requires a
    // coarse quantizer that actually covers the data (with odd-only
    // centroids the even cluster's giant residuals pollute the shared
    // codebooks — quantization behavior, not a bug). The centroid rows
    // (ids 1,6,11,...) have exactly-zero residuals, exercising the
    // zero-safe cosine path end to end
    val vecs = (1L to 40L).map { i =>
      val scale = 1.0f + 0.01f * (i % 5)
      val v = Array.tabulate(8)(d =>
        (if ((d + i % 2) % 2 == 0) 1.0f else 0.02f) * scale)
      (i, v)
    }.toDF("vec_id", "embedding")
    val r = Similarity.ivfPqResidualTopK(vecs,
        vecs.filter(col("vec_id") === 10L || col("vec_id") === 25L),
        "vec_id", "embedding", k = 3, nprobe = 2, centroidEvery = 5,
        m = 2, ks = 2, iters = 2)
      .collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("qid") % 2 === x.getAs[Long]("nid") % 2,
        "residual-PQ neighbor crossed the direction-cluster boundary")
    }
  }

  test("logregTrain learns a separable quality boundary and is partitioning-invariant") {
    // class 1 = "long" docs (x ~ 2), class 0 = "short" docs (x ~ 0.05);
    // with enough iterations the trained boundary must separate them
    val feats = (1L to 40L).map { i =>
      val long = i % 2 == 0
      (i, Array(1.0, (if (long) 2.0 else 0.05) + 0.001 * (i % 5)),
        if (long) 1.0 else 0.0)
    }.toDF("id", "x", "y")
    val w = Classifier.logregTrain(feats, "x", "y", dims = 2, iters = 25, lr = 1.0)
    val scored = Classifier.logregScore(feats, "id", "x", "y", w).collect()
    val acc = scored.count(r => r.getAs[Boolean]("pred") == (r.getAs[Double]("y") == 1.0))
    assert(acc >= 38, s"separable data must classify; got $acc/40")
    // decimal gradient sums make training partition-order independent
    val w2 = Classifier.logregTrain(feats.repartition(7), "x", "y",
      dims = 2, iters = 25, lr = 1.0)
    assert(w === w2)
  }

  test("bigramSurprise ranks template-like docs below novel-bigram docs") {
    // docs 1-3 repeat the same bigram chain (corpus-frequent bigrams →
    // low conditional surprise); doc 4's bigrams occur once each
    val boiler = "alpha beta gamma delta alpha beta gamma delta"
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler),
      (4L, "zeta eta theta iota kappa lambda mu nu")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramSurprise(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[Double]("mean_surprise")).toMap
    assert(r(1L) === r(2L))
    assert(r(4L) > r(1L),
      s"novel bigrams must surprise more: ${r(4L)} vs ${r(1L)}")
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
