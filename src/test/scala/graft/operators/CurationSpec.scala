package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sampling is deterministic and partitioning-invariant") {
    val df = (1L to 1000L).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(7), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    assert(a.size > 200 && a.size < 400) // ~30%
  }

  test("stratified rates apply per stratum; unlisted strata keep all") {
    val df = (1L to 600L).map(i => (i, if (i % 2 == 0) "en" else "rare"))
      .toDF("id", "lang")
    val s = Sampling.stratifiedHashSample(df, "id", "lang", Map("en" -> 0.2))
    val counts = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts("rare") === 300L)
    assert(counts("en") < 120L && counts("en") > 20L)
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join") {
    val large = (1L to 5000L).map(i => (i, i % 3)).toDF("id", "k")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("k", "name")
    val salted = Skew.saltedJoin(large, small, Seq("k"), factor = 8)
      .select("id", "name")
    val plain = large.join(small, "k").select("id", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === 5000L)
  }
}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("running-sum binning: budget respected from prefix sums") {
    val df = Seq(
      (1L, "g", "a " * 100), // 100 tokens
      (2L, "g", "b " * 100),
      (3L, "g", "c " * 100),
      (4L, "g", "d " * 100)
    ).toDF("doc_id", "lang", "text")
    val r = Packing.packByTokenBudget(df, "doc_id", "text", "lang", budget = 250)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // prefix sums before each doc: 0, 100, 200, 300 -> bins 0,0,0,1
    assert(r === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }
}
