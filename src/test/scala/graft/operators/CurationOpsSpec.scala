package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral tests for the round-4 curation operators: decontamination,
  * per-domain caps, temperature resampling, KMV sketches, and repetition
  * metrics (the oracle gate covers cross-engine value parity; these pin
  * semantics on constructed corpora with known answers). */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("flagContaminated reports overlap of training docs with the eval subset") {
    // doc 100 is eval; doc 1 copies it verbatim (full contamination),
    // doc 2 shares nothing, doc 3 shares a phrase (partial).
    val docs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "alpha beta gamma delta unrelated tail words here now")
    ).toDF("doc_id", "text")
    val r = Decontamination.flagContaminated(
        docs, "doc_id", "text", evalPred = col("doc_id") === 100L, minFrac = 0.05)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_contaminated"), x.getAs[Long]("n_shingles"),
          x.getAs[Double]("contamination"))).toMap
    assert(r(1L)._3 === 1.0)                        // verbatim copy
    assert(!r.contains(2L))                         // no shared shingles
    assert(r(3L)._1 === 2L)                         // "alpha beta gamma", "beta gamma delta"
    assert(r(3L)._3 > 0.05 && r(3L)._3 < 1.0)
    assert(!r.contains(100L))                       // eval docs not reported
  }

  test("capPerGroup keeps at most N per group, deterministically") {
    val df = (1L to 100L).map(i => (i, s"grp${i % 3}")).toDF("id", "grp")
    val r = Sampling.capPerGroup(df, "id", "grp", maxPerGroup = 10)
    val byGrp = r.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp.values.forall(_ === 10L))
    // deterministic: same selection on rerun and under different partitioning
    val again = Sampling.capPerGroup(df.repartition(7), "id", "grp", 10)
      .select("id").as[Long].collect().toSet
    assert(again === r.select("id").as[Long].collect().toSet)
    assert(r.select(max("rk")).head.getLong(0) === 10L)
  }

  test("temperatureSample flattens the stratum mix toward uniform") {
    // 900 docs of lang a, 100 of lang b; alpha=0.5 should keep b at a
    // higher rate than a.
    val df = ((1L to 900L).map(i => (i, "a")) ++ (901L to 1000L).map(i => (i, "b")))
      .toDF("id", "lang")
    val r = Sampling.temperatureSample(df, "id", "lang", alpha = 0.5, targetFrac = 0.5)
    val rates = r.select("lang", "rate").distinct().as[(String, Double)].collect().toMap
    assert(rates("b") > rates("a"))
    // expected kept fraction ~ targetFrac (hash sampling is approximate)
    val kept = r.count().toDouble / 1000
    assert(kept > 0.35 && kept < 0.65)
    // deterministic under repartitioning
    val again = Sampling.temperatureSample(df.repartition(13), "id", "lang",
      alpha = 0.5, targetFrac = 0.5).select("id").as[Long].collect().toSet
    assert(again === r.select("id").as[Long].collect().toSet)
  }

  test("kmvDistinct: small strata fall back to exact; estimate tracks cardinality") {
    val small = (1 to 20).map(i => ("s", s"v$i"))
    val big = (1 to 5000).map(i => ("b", s"w$i"))
    val df = (small ++ big).toDF("g", "v")
    val r = Sketches.kmvDistinct(df, "g", "v", k = 64)
      .collect().map(x => x.getAs[String]("g") ->
        (x.getAs[Long]("n_exact"), x.getAs[Double]("kmv_estimate"))).toMap
    assert(r("s")._1 === 20L)
    assert(r("s")._2 === 20.0)                      // < k distinct -> exact fallback
    assert(r("b")._1 === 5000L)
    // KMV with k=64 has ~12% relative sd; accept a generous band
    assert(r("b")._2 > 2500 && r("b")._2 < 10000)
  }

  test("containment finds an embedded doc that jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, small),                      // contained in 2
      (2L, s"$filler $small"),          // container
      (3L, "totally unrelated words one two three four five six seven")
    ).toDF("doc_id", "text")
    val cont = Dedup.containment(docs, "doc_id", "text", minContainment = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont((1L, 2L)) === 1.0)      // every shingle of 1 is in 2
    assert(!cont.contains((2L, 1L)))    // asymmetric: 2 is not inside 1
    assert(!cont.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // jaccard at the same corpus misses the pair entirely (|∩|/|∪| ~ 0.06)
    val jac = Dedup.ngramJaccard(docs, "doc_id", "text", minJaccard = 0.2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("connected components: min-label over chains and isolated pairs") {
    val edges = Seq(
      (5L, 3L), (3L, 9L), (9L, 11L),    // chain: component 3
      (20L, 21L),                       // pair: component 20
      (30L, 7L)                         // pair: component 7
    ).toDF("d1", "d2")
    val r = ConnectedComponents.components(edges, "d1", "d2")
      .as[(Long, Long)].collect().toMap
    assert(r(5L) === 3L && r(3L) === 3L && r(9L) === 3L && r(11L) === 3L)
    assert(r(20L) === 20L && r(21L) === 20L)
    assert(r(30L) === 7L && r(7L) === 7L)
    assert(r.size === 8)
  }

  test("connected components: chain longer than the propagation budget converges via star contraction") {
    // a 61-vertex chain has diameter 60 > the default 25-round budget:
    // plain propagation cannot finish, so the large-star/small-star
    // fallback must label it — and must agree with the unique min fixpoint.
    val edges = (1L until 61L).map(i => (i, i + 1)).toDF("d1", "d2")
    val r = ConnectedComponents.components(edges, "d1", "d2")
      .as[(Long, Long)].collect().toMap
    assert(r.size === 61)
    assert((1L to 61L).forall(r(_) === 1L))
    // and the fallback result matches plain propagation given enough rounds
    val plain = ConnectedComponents.components(edges, "d1", "d2", maxIter = 100)
      .as[(Long, Long)].collect().toMap
    assert(plain === r)
  }

  test("kmeansAssign clusters planted blobs and is deterministic under repartition") {
    def blob(center: Array[Float], seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      center.map(c => c + (r.nextFloat() - 0.5f) * 0.1f)
    }
    val cA = Array(1.0f, 0.0f, 0.0f, 1.0f)
    val cB = Array(-1.0f, 1.0f, 0.0f, -1.0f)
    // ids 1..2 are the init centroids (one per blob), the rest alternate
    val rows = Seq(1L -> blob(cA, 1), 2L -> blob(cB, 2)) ++
      (3L to 40L).map(i => i -> blob(if (i % 2 == 1) cA else cB, i.toInt))
    val df = rows.toDF("vec_id", "embedding")
    val r = Vectors.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert((3L to 40L).forall(i => r(i) === (if (i % 2 == 1) 1L else 2L)))
    val again = Vectors.kmeansAssign(df.repartition(7), "vec_id", "embedding",
      k = 2, iters = 2).as[(Long, Long)].collect().toMap
    assert(again === r)
  }

  test("kmeans seeds by rank, not id value: non-contiguous ids still train k centroids") {
    def blob(center: Array[Float], seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      center.map(c => c + (r.nextFloat() - 0.5f) * 0.1f)
    }
    val cA = Array(1.0f, 0.0f, 0.0f, 1.0f)
    val cB = Array(-1.0f, 1.0f, 0.0f, -1.0f)
    // content-hash-shaped ids: sparse, far above k — an `id <= k` seed
    // filter would select ZERO rows here and train with no centroids.
    val rows = Seq(1000003L -> blob(cA, 1), 2000003L -> blob(cB, 2)) ++
      (3L to 40L).map(i => (i * 99991L + 5000000L) ->
        blob(if (i % 2 == 1) cA else cB, i.toInt))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Vectors.kmeansTrain(df, "vec_id", "embedding", k = 2, iters = 2)
    assert(cents.size === 2)
    // seeds are the two LOWEST ids (rank order), regardless of magnitude
    val lowest2 = rows.map(_._1).sorted.take(2)
    assert(cents.map(_._1).sorted === lowest2)
    val r = Vectors.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r.size === rows.size)
    // the two planted blobs separate: every A-blob row shares doc 1000003's
    // cluster and every B-blob row shares doc 2000003's
    val aCl = r(1000003L); val bCl = r(2000003L)
    assert(aCl !== bCl)
    (3L to 40L).foreach { i =>
      val id = i * 99991L + 5000000L
      assert(r(id) === (if (i % 2 == 1) aCl else bCl))
    }
  }

  test("chunk: overlapping windows cover every token; short docs yield one chunk") {
    val docs = Seq(
      (1L, (1 to 50).map(i => s"t$i").mkString(" ")), // 50 tokens -> 2 chunks
      (2L, "a b c")                                   // short -> 1 chunk
    ).toDF("doc_id", "text")
    val r = TextAnalysis.chunk(docs, "doc_id", "text", chunkSize = 32, stride = 24)
      .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("chunk_idx")) ->
        (x.getAs[String]("chunk_text"), x.getAs[Long]("n_chunk_tokens"))).toMap
    assert(r((1L, 0L))._2 === 32L)
    assert(r((1L, 1L))._2 === 26L)                    // tokens 25..50
    assert(r((1L, 1L))._1.startsWith("t25 "))         // stride 24 -> 8-token overlap
    assert(r((1L, 0L))._1.endsWith(" t32"))
    assert(r((2L, 0L)) === (("a b c", 3L)))
    assert(!r.contains((2L, 1L)))
    assert(r.size === 3)
  }

  test("hybridTopK ranks the lexically-and-densely similar doc first") {
    // doc 100 is the query; 1 shares text AND vector, 2 shares only the
    // vector direction, 3 shares nothing. Candidates require a shared
    // shingle, so 3 (and 2, lexically disjoint) can only appear via
    // shingle overlap — 2 is still a candidate through "delta epsilon
    // zeta".
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta", Array(1.0f, 0.0f, 1.0f, 0.5f)),
      (1L, "alpha beta gamma delta other tail here", Array(1.0f, 0.0f, 1.0f, 0.4f)),
      (2L, "unrelated words delta epsilon zeta closing", Array(0.9f, 0.1f, 1.0f, 0.5f)),
      (3L, "completely different tokens entirely now yes", Array(-1.0f, 0.5f, -1.0f, 0.0f))
    ).toDF("doc_id", "text", "embedding")
    val r = Similarity.hybridTopK(corpus, col("doc_id") === 100L,
        "doc_id", "text", "embedding", k = 3)
      .select("qid", "nid", "rk").as[(Long, Long, Long)].collect()
    assert(r.forall(_._1 === 100L))
    val ranked = r.sortBy(_._3).map(_._2)
    assert(ranked.head === 1L)          // best combined score
    assert(ranked.contains(2L))         // candidate via shared shingle
    assert(!ranked.contains(3L))        // no shared shingle -> never scored
  }

  test("repetitionMetrics counts top-bigram and duplicated-trigram occurrences") {
    val docs = Seq(
      // "a b" appears 3x of 5 bigrams; trigrams "a b a","b a b" repeat
      (1L, "a b a b a b"),
      // all bigrams/trigrams unique
      (2L, "one two three four five six")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("max_bi"), x.getAs[Long]("n_bi"),
          x.getAs[Long]("dup_tri"), x.getAs[Long]("n_tri"),
          x.getAs[Boolean]("keep"))).toMap
    assert(r(1L)._1 === 3L)   // "a b" x3
    assert(r(1L)._2 === 5L)
    assert(r(1L)._3 === 4L)   // "a b a" x2 + "b a b" x2
    assert(r(1L)._4 === 4L)
    assert(!r(1L)._5)
    assert(r(2L)._1 === 1L)   // all bigrams unique
    assert(r(2L)._3 === 0L)   // no repeated trigram
  }
}
