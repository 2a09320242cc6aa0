package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-7 operators: classifier features from raw text, substring-dedup
  * policy knobs, real media decode. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashedCharNgramFeatures: bias + count-normalized bucket shares; empty text scores all-zero") {
    val docs = Seq(
      (1L, "abcdef"),        // 4 grams
      (2L, "ab"),            // shorter than n=3 -> no grams
      (3L, "")               // empty
    ).toDF("doc_id", "text")
    val f = Classifier.hashedCharNgramFeatures(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Seq[Double])].collect()
    assert(f.forall(_._2.length === 17))
    assert(f.forall(_._2.head === 1.0), "x[0] is the bias")
    val shares = f(0)._2.tail
    assert(math.abs(shares.sum - 1.0) < 1e-9, "4 grams' shares sum to 1")
    assert(shares.forall(s => s >= 0.0 && s <= 1.0))
    assert(f(1)._2.tail.forall(_ === 0.0) && f(2)._2.tail.forall(_ === 0.0),
      "sub-gram docs have an empty gram set, not a descending sequence() blowup")
  }

  test("hashedCharNgramFeatures is deterministic under repartition and case-insensitive") {
    val docs = (1L to 60L).map(i => (i, s"The Quick Fox ${i % 7} jumps")).toDF("doc_id", "text")
    val a = Classifier.hashedCharNgramFeatures(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Seq[Double])].collect()
    val b = Classifier.hashedCharNgramFeatures(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Seq[Double])].collect()
    assert(a === b)
    val up = Classifier.hashedCharNgramFeatures(
      docs.select(col("doc_id"), upper(col("text")).as("text")), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Seq[Double])].collect()
    assert(a === up, "features hash the lowercased text")
  }

  test("logreg trained on hashed char-ngram features separates char-distinct classes from raw text") {
    // two populations with disjoint character content -> disjoint gram
    // buckets -> linearly separable in the hashed feature space
    val docs = (1L to 80L).map { i =>
      if (i % 2 == 0) (i, "aaa bbb ccc ddd aaa bbb", 1.0)
      else (i, "xxx yyy zzz www xxx yyy", 0.0)
    }.toDF("doc_id", "text", "y")
    val f = Classifier.hashedCharNgramFeatures(docs, "doc_id", "text",
      keep = Seq(col("y")))
    val w = Classifier.logregTrain(f, "x", "y", dims = 17, iters = 10, lr = 2.0)
    val scored = Classifier.logregScore(f, "doc_id", "x", "y", w)
      .as[(Long, Double, Boolean, Double)].collect()
    assert(scored.forall { case (_, _, pred, y) => pred === (y == 1.0) },
      "trained-from-text classifier must separate the planted classes")
  }
}
