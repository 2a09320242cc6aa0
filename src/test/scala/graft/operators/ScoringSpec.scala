package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral tests for the corpus-scoring additions: unigram surprise,
  * TF-IDF keyword extraction, and PageRank over near-dup graphs. */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("unigramSurprise: rare-token docs score higher than stereotyped docs") {
    val docs = Seq(
      (1L, "alpha alpha alpha alpha"),
      (2L, "alpha alpha alpha zebra")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.unigramSurprise(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Double]("mean_surprise"))).toMap
    assert(r(1L)._1 === 4L && r(2L)._1 === 4L)
    assert(r(2L)._2 > r(1L)._2)            // zebra is rare -> more surprise
    // alpha appears 7/8 times: doc1 = -ln(7/8); exact to the rounding contract
    assert(math.abs(r(1L)._2 - (-math.log(7.0 / 8.0))) < 1e-6)
  }

  test("tfidfTopK: distinctive terms rank first, ubiquitous terms score zero") {
    val docs = Seq(
      (1L, "shared shared signal signal signal"),
      (2L, "shared noise"),
      (3L, "shared other")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tfidfTopK(docs, "doc_id", "text", topK = 2)
      .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("rk")) ->
        (x.getAs[String]("token"), x.getAs[Double]("score"))).toMap
    assert(r((1L, 1L))._1 === "signal")    // tf=3, df=1 -> top keyword
    assert(r((1L, 1L))._2 > 0)
    // "shared" is in every doc: ln(3/3) = 0
    assert(r((1L, 2L)) === (("shared", 0.0)))
  }

  test("pagerank: hub of a star graph concentrates rank; mass conserved") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("d1", "d2")
    val r = PageRank.ranks(pairs, "d1", "d2")
      .collect().map(x => x.getAs[Long]("v") -> x.getAs[Double]("pagerank")).toMap
    assert(r.size === 4)
    assert(r(1L) > r(2L))
    assert(r(2L) === r(3L) && r(3L) === r(4L)) // symmetric leaves tie exactly
    assert(math.abs(r.values.sum - 1.0) < 1e-6) // no dangling loss (9-dp grid)
    // deterministic under repartitioning
    val again = PageRank.ranks(pairs.repartition(5), "d1", "d2")
      .collect().map(x => x.getAs[Long]("v") -> x.getAs[Double]("pagerank")).toMap
    assert(again === r)
  }
}
