package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral tests for the training-data operators on constructed
  * corpora with planted duplicates (the oracle gate covers cross-engine
  * value parity; these pin semantics). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // near-dup of 1
    (3L, "completely different content about spark catalyst optimizer internals"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exactDedup keeps min id per content hash") {
    val r = Dedup.exactDedup(docs, "doc_id", "text")
    assert(r.count() === 3)
    val dup = r.filter(col("n_copies") === 2).head
    assert(dup.getAs[Long]("doc_id") === 1L)
  }

  test("minhashLsh finds the planted near-dup pair and skips distinct docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", minEstJaccard = 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngramJaccard: exact dup scores 1.0; prefix filter loses nothing") {
    val r = Dedup.ngramJaccard(docs, "doc_id", "text", minJaccard = 0.2)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(r((1L, 4L)) === 1.0)
    assert(r((1L, 2L)) > 0.5 && r((1L, 2L)) < 1.0)
    assert(!r.contains((1L, 3L)))
  }

  test("PPJoin prefix filter drops a corpus-hot shingle under planted skew") {
    // adversarial corpus: HALF the docs open with the same phrase, so one
    // shingle has df = 50 — a naive shared-shingle join would generate
    // ~50² candidate pairs from it alone. Every doc also carries unique
    // filler (no true near-dups among the skewed docs), plus one planted
    // genuine near-dup pair to prove the filter is lossless.
    val hotDocs = (1 to 100).map { i =>
      val filler = (1 to 12).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, if (i % 2 == 0) s"alpha beta gamma $filler" else filler)
    }
    val nearDup = Seq(
      (101L, "planted pair shares nearly all of its shingle set verbatim"),
      (102L, "planted pair shares nearly all of its shingle set verbatim too"))
    val docs = (hotDocs ++ nearDup).toDF("doc_id", "text")

    // machine-check the mechanism: the hot shingle (max df ⇒ last rank in
    // every doc) appears in NO prefix, for both the jaccard (t=0.2) and
    // containment (t=0.8) thresholds — candidate volume is then bounded
    // by Σ df_prefix(s)², with the hot term contributing zero.
    val docSh = Dedup.hashedShingleSets(docs, "doc_id", "text", 3)
    val hotHash = spark.range(1)
      .select(Dedup.shingleHash(lit("alpha beta gamma")).as("h"))
      .as[Long].head()
    val full = Dedup.rankedPostings(docSh, "doc_id", 0.2, prefixOnly = false)
    assert(full.filter(col("s") === hotHash).count() === 50) // skew is real
    Seq(0.2, 0.8).foreach { t =>
      val prefix = Dedup.rankedPostings(docSh, "doc_id", t, prefixOnly = true)
      assert(prefix.filter(col("s") === hotHash).count() === 0,
        s"hot shingle leaked into a t=$t prefix")
    }

    // losslessness under skew: exactly the planted pair survives
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", minJaccard = 0.2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((101L, 102L)))
    docSh.unpersist()
  }

  test("minhashLshFromSignatures over precomputed signatures equals minhashLsh") {
    val fused = Dedup.minhashLsh(docs, "doc_id", "text")
      .select("d1", "d2", "est_jaccard").as[(Long, Long, Double)].collect().toSet
    val sigs = Dedup.minhashSignatureArray(docs, "doc_id", "text")
    val staged = Dedup.minhashLshFromSignatures(sigs, "doc_id")
      .select("d1", "d2", "est_jaccard").as[(Long, Long, Double)].collect().toSet
    assert(staged === fused)
  }

  test("simhash: identical docs get identical hashes, near-dups small hamming") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(4L))
    val pairs = Dedup.simhashNearDup(docs, "doc_id", "text")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }
}

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._
  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("latest right row at-or-before each left row, per key") {
    val trades = Seq(
      (1L, 10L, ts("2026-01-01T00:00:10Z")),
      (2L, 10L, ts("2026-01-01T00:00:20Z")),
      (3L, 20L, ts("2026-01-01T00:00:05Z"))
    ).toDF("trade_id", "k", "ts")
    val quotes = Seq(
      (100L, 10L, ts("2026-01-01T00:00:10Z")), // == trade 1 ts -> matches (<=)
      (101L, 10L, ts("2026-01-01T00:00:15Z")),
      (102L, 20L, ts("2026-01-01T00:00:09Z"))  // after trade 3 -> no match
    ).toDF("quote_id", "k", "ts")
    val r = AsofJoin.asofJoin(trades, quotes, Seq("k"), "ts", "ts",
        Seq("quote_id"))
      .select("trade_id", "asof_quote_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(r === Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None))
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._
  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("bin-blocked point-in-interval join, intervals spanning bins") {
    val points = Seq(
      (1L, ts("2026-01-01T12:00:00Z")),
      (2L, ts("2026-01-03T00:00:01Z")),
      (3L, ts("2026-01-09T00:00:00Z"))
    ).toDF("pid", "ts")
    val intervals = Seq(
      (10L, ts("2026-01-01T00:00:00Z"), ts("2026-01-04T00:00:00Z")), // 4-day span
      (20L, ts("2026-01-02T18:00:00Z"), ts("2026-01-03T06:00:00Z"))
    ).toDF("iid", "s", "e")
    val r = RangeJoin.rangeJoin(points, intervals, "ts", "s", "e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(r === Set((1L, 10L), (2L, 10L), (2L, 20L))) // point 3 unmatched
  }

  test("overlapJoin: inclusive overlap, multi-shared-bin pairs emitted ONCE, no BNLJ") {
    val a = Seq(
      (1L, ts("2026-01-01T00:00:00Z"), ts("2026-01-05T00:00:00Z")), // 5-day span
      (2L, ts("2026-01-08T00:00:00Z"), ts("2026-01-08T12:00:00Z")),
      (3L, ts("2026-01-20T00:00:00Z"), ts("2026-01-21T00:00:00Z"))
    ).toDF("aid", "as_", "ae")
    val b = Seq(
      (10L, ts("2026-01-02T00:00:00Z"), ts("2026-01-04T00:00:00Z")), // 3 shared days with aid 1
      (20L, ts("2026-01-05T00:00:00Z"), ts("2026-01-06T00:00:00Z")), // touches aid 1 endpoint
      (30L, ts("2026-01-08T11:00:00Z"), ts("2026-01-09T00:00:00Z")),
      (40L, ts("2026-02-01T00:00:00Z"), ts("2026-02-02T00:00:00Z"))  // no overlap
    ).toDF("bid", "bs", "be")
    val df = RangeJoin.overlapJoin(a, b, "as_", "ae", "bs", "be")
    val rows = df.select("aid", "bid").as[(Long, Long)].collect()
    assert(rows.length === rows.toSet.size,
      "a pair sharing several bins must be emitted exactly once")
    assert(rows.toSet === Set((1L, 10L), (1L, 20L), (2L, 30L)),
      "inclusive endpoints overlap; disjoint intervals do not")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the bin equi-join must not degrade to a nested loop")
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with deterministic tiebreak") {
    val q = vecs.filter(col("vec_id") === 0)
    val r = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", k = 3)
      .orderBy("rk").select("nid").as[Long].collect()
    assert(r.head === 1L) // closest direction
  }

  test("ivfTopK: exact rerank within probed inverted lists") {
    val q = vecs.filter(col("vec_id") === 0)
    // centroidEvery=2 -> centroids {1, 3}; nprobe=2 probes both -> full recall here
    val ivf = Similarity.ivfTopK(vecs, q, "vec_id", "embedding",
        k = 3, nprobe = 2, centroidEvery = 2)
      .select("nid", "cos").as[(Long, Double)].collect().toMap
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", k = 3)
      .select("nid", "cos").as[(Long, Double)].collect().toMap
    ivf.foreach { case (nid, cos) => assert(bf(nid) === cos) }
    assert(ivf.nonEmpty)
  }

  test("lshTopK returns subset of brute-force candidates with exact rerank") {
    val q = vecs.filter(col("vec_id") === 0)
    val lsh = Similarity.lshTopK(vecs, q, "vec_id", "embedding", k = 3)
      .select("nid", "cos").as[(Long, Double)].collect().toMap
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", k = 3)
      .select("nid", "cos").as[(Long, Double)].collect().toMap
    lsh.foreach { case (nid, cos) => assert(bf(nid) === cos) }
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId votes by stopword hits with precedence ties") {
    val df = Seq(
      (1L, "the cat and the dog sat in the house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "le chat est pour la maison et les animaux"),
      (4L, "el perro y la casa es no por una vez"),
      (5L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.langId(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(r === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "und"))
  }

  test("qualityScore computes ratios and keep flag") {
    val df = Seq(
      (1L, "This is a reasonable document with enough tokens to pass the filter easily."),
      (2L, "!!! ??? *** !!!"),
      (3L, "short")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df, "doc_id", "text")
    val keep = r.select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(keep(1L) && !keep(2L) && !keep(3L))
    val row1 = r.filter(col("doc_id") === 1).head
    assert(row1.getAs[Long]("n_tokens") === 13L)
  }

  test("tokenCounts: bpe-ish >= word tokens (punctuation splits)") {
    val df = Seq((1L, "hello, world! it's 42")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df, "doc_id", "text").head
    assert(r.getAs[Long]("n_word_tokens") === 5L) // hello world it s 42
    assert(r.getAs[Long]("n_bpeish_tokens") === 8L) // + , ! '
  }

  test("fingerprints: shared long substring yields shared fingerprint") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "prefix words alpha beta gamma delta epsilon zeta eta theta different tail"),
      (3L, "nothing in common with those documents at all whatsoever here")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(df, "doc_id", "text")
    assert(fps.count() === 3)
    // overlap via equi-join on recomputed per-window fingerprints is
    // covered by the oracle; here pin determinism:
    val again = TextAnalysis.fingerprints(df, "doc_id", "text")
    assert(fps.exceptAll(again).isEmpty)
  }
}

class SqlRunnerSpec extends SparkSpec {
  import graft.sql.SqlRunner

  test("rewriteParams: @p -> :p outside string literals only") {
    assert(SqlRunner.rewriteParams("SELECT @a, '@not', \"@q\", @b_1") ===
      "SELECT :a, '@not', \"@q\", :b_1")
  }

  test("splitter union preserves column names") {
    import spark.implicits._
    Seq((1L, "x")).toDF("a", "b").createOrReplaceTempView("t_sr")
    val df = SqlRunner.run(spark,
      "SELECT a, b FROM t_sr --SPLITTER-- SELECT a, b FROM t_sr")
    assert(df.count() === 2 && df.columns === Array("a", "b"))
  }
}
