package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-8 batch 2: weighted sampling without replacement, hard-negative
  * mining, and the Bloom-filter ingest sketch. */
class Round8bOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- weightedSample -------------------------------------------------

  test("weightedSample is deterministic, size-k, and excludes unsampleable rows") {
    val df = ((1L to 200L).map(i => (i, 10L)) ++
      Seq((201L, 0L), (202L, -5L))).toDF("id", "w")
      .union(Seq((203L, null.asInstanceOf[java.lang.Long]))
        .toDF("id", "w"))
    val a = Sampling.weightedSample(df, "id", "w", k = 50)
      .select("id").as[Long].collect().sorted
    val b = Sampling.weightedSample(df, "id", "w", k = 50)
      .select("id").as[Long].collect().sorted
    assert(a.length === 50)
    assert(a === b, "same data + seed must select the identical sample")
    assert(!a.exists(id => id >= 201L),
      "zero/negative/null weight rows can never be sampled")
  }

  test("weightedSample biases inclusion toward heavy weights") {
    // 500 light rows (w=1) + 50 heavy rows (w=100): heavy rows carry
    // ~91% of total weight, so a k=50 sample should be dominated by
    // them. E-S keys: skey = -ln(u)/w, smallest k win.
    val df = ((1L to 500L).map(i => (i, 1L)) ++
      (1001L to 1050L).map(i => (i, 100L))).toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", k = 50)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ >= 1001L)
    assert(heavy >= 40, s"expected heavy-weight dominance, got $heavy/50")
  }

  test("weightedSample changes with seed but keeps the weight bias") {
    val df = ((1L to 300L).map(i => (i, (i % 7) + 1L))).toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", k = 40, seed = "a")
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.weightedSample(df, "id", "w", k = 40, seed = "b")
      .select("id").as[Long].collect().toSet
    assert(s1 !== s2, "different seeds should draw different samples")
  }

  // --- hardNegatives --------------------------------------------------

  test("hardNegatives returns only cross-cluster neighbors, ranked by cosine") {
    // Two well-separated direction clusters; centroids on the axes.
    val corpus = (
      (1L to 5L).map(i => (i, Array(1f, 0.01f * i))) ++
        (11L to 15L).map(i => (i, Array(0.01f * (i - 10), 1f)))
      ).toDF("vec_id", "v")
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("cid", "cv")
    val qs = corpus.filter(col("vec_id") === 1L)
    val out = Similarity.hardNegatives(corpus, qs, cents, "vec_id", "v", k = 3)
      .orderBy("rk").as[(Long, Long, Double, Long)].collect()
    assert(out.length === 3)
    assert(out.forall(_._1 == 1L))
    assert(out.forall(r => r._2 >= 11L),
      s"in-cluster neighbors must be excluded, got ${out.toSeq}")
    // rank order = cosine desc: the cluster-1 vector with the largest
    // x-component is most similar to the (1, ~0) query
    assert(out.map(_._2).toSeq === Seq(15L, 14L, 13L))
    assert(out.map(_._3).toSeq === out.map(_._3).toSeq.sorted.reverse)
  }

  test("hardNegatives assignment is in-row: no Exchange in the corpus subplan") {
    val corpus = (1L to 20L).map(i =>
      (i, Array((i % 3).toFloat, 1f))).toDF("vec_id", "v")
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f))).toDF("cid", "cv")
    val df = Similarity.hardNegatives(corpus, corpus.limit(2), cents,
      "vec_id", "v", k = 2)
    // the only allowed exchange is the final window's rank partition;
    // centroid assignment itself must not shuffle
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected at most the rank exchange, got $exchanges:\n$plan")
  }

  // --- Bloom ----------------------------------------------------------

  test("bloom has no false negatives and matches a JVM-side reference bitmap") {
    val keys = (1 to 400).map(i => s"doc body $i")
    val df = keys.toDF("k")
    val m = 1 << 12
    val sparse = Sketches.bloomBuild(df, "k", m, numHashes = 5)
    val words = Sketches.bloomCollect(sparse, m)

    // reference bitmap computed with MessageDigest, same contract
    val ref = new Array[Long](m / 32)
    val md = java.security.MessageDigest.getInstance("MD5")
    keys.foreach { s =>
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16) % m
      val h2r = java.lang.Long.parseLong(hex.substring(15, 30), 16) % m
      val h2 = h2r + 1 - (h2r % 2)
      for (i <- 0 until 5) {
        val pos = (h1 + i * h2) % m
        ref((pos / 32).toInt) |= (1L << (pos % 32).toInt)
      }
    }
    assert(words.toSeq === ref.toSeq, "distributed bitmap must equal the reference")

    // every inserted key probes true — the Bloom contract
    val probed = Sketches.bloomProbe(df, "k", words, m, 5, "hit")
      .filter(!col("hit")).count()
    assert(probed === 0L, "a Bloom filter must never report a false negative")
  }

  test("bloom probe is zero-shuffle and false-positive rate is sane") {
    val m = 1 << 16
    val words = Sketches.bloomCollect(
      Sketches.bloomBuild((1 to 2000).map(i => s"in $i").toDF("k"), "k", m), m)
    val probe = Sketches.bloomProbe(
      (1 to 2000).map(i => s"out $i").toDF("k"), "k", words, m, 5, "hit")
    assert(!probe.queryExecution.executedPlan.toString.contains("Exchange"),
      "probe must be a pure map-side expression")
    val fp = probe.filter(col("hit")).count()
    // k=5, n=2000, m=65536 → theoretical fp ≈ 3e-5; 2000 probes should
    // essentially never hit. Allow slack for the deterministic draw.
    assert(fp <= 3, s"false-positive count implausibly high: $fp/2000")
  }

  test("bloomBuild validates its geometry") {
    val df = Seq("x").toDF("k")
    intercept[IllegalArgumentException] { Sketches.bloomBuild(df, "k", 33) }
    intercept[IllegalArgumentException] { Sketches.bloomBuild(df, "k", 0) }
    intercept[IllegalArgumentException] { Sketches.bloomBuild(df, "k", 64, 0) }
    intercept[IllegalArgumentException] {
      Sketches.bloomProbe(df, "k", new Array[Long](1), 64, 5)
    }
  }
}
