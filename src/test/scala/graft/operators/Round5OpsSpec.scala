package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral tests for the round-5 additions: common-segment removal
  * (CCNet line dedup), BM25 ranking, winnowing-fingerprint overlap, and
  * SemDeDup (the oracle gate covers cross-engine value parity; these pin
  * semantics on constructed corpora with known answers). */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = (1 to 10).map(i => s"b$i").mkString(" ")

  test("commonSegmentRemoval drops cross-doc boilerplate, keeps unique text") {
    def tl(j: Int) = (1 to 10).map(i => s"u${j}x$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler ${tl(1)}"),
      (2L, s"$boiler ${tl(2)}"),
      (3L, tl(3))
    ).toDF("doc_id", "text")
    val r = Dedup.commonSegmentRemoval(docs, "doc_id", "text",
        segLen = 10, minDocs = 2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_segments"), x.getAs[Long]("n_kept"),
          x.getAs[String]("kept_text"))).toMap
    assert(r(1L) === ((2L, 1L, tl(1))))   // boilerplate segment dropped
    assert(r(2L) === ((2L, 1L, tl(2))))
    assert(r(3L) === ((1L, 1L, tl(3))))   // unique doc untouched
  }

  test("commonSegmentRemoval: within-doc repeats don't cross the threshold") {
    // the repeated segment lives in ONE doc only — repeats inside a doc
    // count that doc once, so nd = 1 < minDocs and nothing is dropped
    val docs = Seq(
      (1L, s"$boiler $boiler"),
      (2L, (1 to 10).map(i => s"x$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Dedup.commonSegmentRemoval(docs, "doc_id", "text", 10, 2)
    assert(r.filter(col("n_kept") =!= col("n_segments")).count() === 0)
  }

  test("commonSegmentRemoval: all-boilerplate doc empties out; empty doc survives") {
    val docs = Seq(
      (1L, boiler), (2L, boiler),            // both docs are pure boilerplate
      (3L, "")                               // tokenless doc
    ).toDF("doc_id", "text")
    val r = Dedup.commonSegmentRemoval(docs, "doc_id", "text", 10, 2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_segments"), x.getAs[Long]("n_kept"),
          x.getAs[String]("kept_text"))).toMap
    assert(r(1L) === ((1L, 0L, "")))
    assert(r(2L) === ((1L, 0L, "")))
    assert(r(3L) === ((0L, 0L, "")))
    assert(r.size === 3)                     // every input doc has a row
  }

  test("bm25TopK ranks high-tf docs of rarer terms first") {
    // "needle" appears in 2 of 5 docs (rarer -> higher idf); doc 1 has
    // the highest tf of it and the same length as the others.
    def pad(n: Int) = (1 to n).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, s"needle needle needle ${pad(7)}"),
      (2L, s"needle ${pad(9)}"),
      (3L, s"common ${pad(9)}"),
      (4L, s"common ${pad(9)}"),
      (5L, s"common ${pad(9)}")
    ).toDF("doc_id", "text")
    val r = Similarity.bm25TopK(docs, "doc_id", "text",
      terms = Seq("needle", "common"), k = 5)
    val rows = r.orderBy("rk").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).take(2) === Array(1L, 2L))
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("rk")).toSeq === (1L to 5L))
    // deterministic under repartitioning
    val again = Similarity.bm25TopK(docs.repartition(7), "doc_id", "text",
      Seq("needle", "common"), 5).orderBy("rk")
      .select("doc_id").as[Long].collect()
    assert(again === rows.map(_.getAs[Long]("doc_id")))
  }

  test("fingerprintOverlap surfaces substring reuse that whole-doc similarity misses") {
    // docs 1 and 2 share a 12-token run (>= window+k-1 = 6 guarantees a
    // shared fingerprint) inside otherwise-disjoint text; doc 3 disjoint.
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    def noise(j: Int, n: Int) = (1 to n).map(i => s"n${j}x$i").mkString(" ")
    val docs = Seq(
      (1L, s"${noise(1, 20)} $shared ${noise(11, 20)}"),
      (2L, s"${noise(2, 20)} $shared ${noise(12, 20)}"),
      (3L, noise(3, 50))
    ).toDF("doc_id", "text")
    val r = TextAnalysis.fingerprintOverlap(docs, "doc_id", "text",
        k = 3, window = 4, minShared = 2)
      .collect().map(x => (x.getAs[Long]("d1"), x.getAs[Long]("d2"),
        x.getAs[Long]("n_shared")))
    assert(r.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(r.head._3 >= 2L)
  }

  test("mixtureSample: binding stratum keeps rate 1, others downsample toward targets") {
    // 800 a / 100 b / 100 c, targets 50/25/25 (+unlisted d) — b and c are
    // binding (target/n maximal), a downsamples to 2x b's kept size
    val df = ((1L to 800L).map(i => (i, "a")) ++ (801L to 900L).map(i => (i, "b"))
      ++ (901L to 1000L).map(i => (i, "c")) ++ (1001L to 1100L).map(i => (i, "d")))
      .toDF("id", "lang")
    val r = Sampling.mixtureSample(df, "id", "lang",
      targets = Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    val rates = r.select("lang", "rate").distinct()
      .collect().map(x => x.getAs[String]("lang") -> x.getAs[Double]("rate")).toMap
    assert(rates("b") === 1.0 && rates("c") === 1.0)
    assert(rates("a") === 0.25)              // (0.5/800)/(0.25/100)
    assert(!rates.contains("d"))             // unlisted stratum dropped
    val kept = r.groupBy("lang").count()
      .collect().map(x => x.getAs[String]("lang") -> x.getAs[Long]("count")).toMap
    assert(kept("b") === 100L && kept("c") === 100L)
    assert(kept("a") > 150L && kept("a") < 250L) // ~200 expected (hash sampling)
    // deterministic under repartitioning
    val again = Sampling.mixtureSample(df.repartition(7), "id", "lang",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)).select("id").as[Long].collect().toSet
    assert(again === r.select("id").as[Long].collect().toSet)
  }

  test("lshBandStats: duplicate docs share buckets; candidate volume counted") {
    val uniq = (1 to 20).map(j => (j.toLong, (1 to 12).map(i => s"w${j}x$i").mkString(" ")))
    val dup = Seq((100L, uniq.head._2), (101L, uniq.head._2)) // 2 extra copies of doc 1
    val docs = (uniq ++ dup).toDF("doc_id", "text")
    val r = Dedup.lshBandStats(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("band") ->
        (x.getAs[Long]("n_buckets"), x.getAs[Long]("n_docs"),
          x.getAs[Long]("max_bucket"), x.getAs[Long]("n_cand_pairs"))).toMap
    assert(r.keySet === Set(0L, 1L, 2L, 3L))
    r.values.foreach { case (nb, nd, mx, np) =>
      assert(nd === 22L)        // every doc lands in exactly one bucket/band
      assert(mx === 3L)         // the verbatim triplet shares its bucket
      assert(np === 3L)         // 3 choose 2 — only the planted dups collide
      assert(nb === 20L)        // 19 singletons + 1 triple bucket
    }
  }

  test("semanticDedup drops the higher id of a same-cluster near-identical pair") {
    // seeds are the two lowest ids (1, 2) — orthogonal, so the trained
    // clusters separate; 3 is a near-copy of 1, 4 is its own direction
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.999f, 0.01f, 0.0f)),     // ~copy of 1 -> dropped
      (4L, Array(0.0f, 0.0f, 1.0f))         // own direction -> kept
    ).toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        k = 2, iters = 2, tau = 0.9)
      .collect().map(x => x.getAs[Long]("vec_id") -> x.getAs[Boolean]("kept")).toMap
    assert(r.size === 4)                     // one decision per input vector
    assert(r(1L) && !r(3L))
    assert(r(2L) && r(4L))
  }
}
