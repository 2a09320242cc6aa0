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

  // --- substring-dedup policy knobs -------------------------------------

  // planted corpus: a passage of 10 tokens repeated across docs 1 and 2;
  // doc 1 is ~91% duplicate (10 of 11 tokens covered), doc 2 embeds the
  // same passage inside enough unique text to stay under the threshold,
  // doc 3 is clean.
  private val passage = (1 to 10).map(i => s"dup$i").mkString(" ")
  private def plantedDocs = Seq(
    (1L, s"$passage unique1"),
    (2L, s"u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 $passage v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"),
    (3L, "clean text with no repeats at all here now")
  ).toDF("doc_id", "text")

  test("exactSubstringDedupPolicy drops a 90%-duplicate doc whole, stitches the rest") {
    val r = Dedup.exactSubstringDedupPolicy(plantedDocs, "doc_id", "text",
        n = 8, dropPct = 80)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean, String)].collect()
    val (d1, d2, d3) = (r(0), r(1), r(2))
    assert(d1 === ((1L, 11L, 11L, true, "")),
      "10/11 covered >= 80% -> the whole doc dies, fragments included")
    assert(!d2._4 && d2._3 === 10L && !d2._5.isEmpty,
      "10/31 covered < 80% -> stitched, only the passage removed")
    assert(d3 === ((3L, 9L, 0L, false, "clean text with no repeats at all here now")))
    // default-policy result on the same corpus equals exactSubstringDedup
    val base = Dedup.exactSubstringDedup(plantedDocs, "doc_id", "text", n = 8)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(base(0)._4 === "unique1", "without the policy the fragment survives")
  }

  test("exactSubstringDedupPolicy never drops empty or sub-n docs") {
    val docs = Seq((1L, ""), (2L, "short text")).toDF("doc_id", "text")
    val r = Dedup.exactSubstringDedupPolicy(docs, "doc_id", "text",
        n = 8, dropPct = 0)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean, String)].collect()
    assert(r(0) === ((1L, 0L, 0L, false, "")), "empty doc: pct 0 still never drops")
    assert(r(1)._4 === true && r(1)._5 === "",
      "dropPct = 0 with n_tokens > 0 drops everything (0 >= 0)")
  }

  test("substringSpans merges overlapping gram intervals into maximal spans") {
    val r = Dedup.substringSpans(plantedDocs, "doc_id", "text", n = 8)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Long, String)].collect()
    // doc 1: grams at 1..3 cover tokens 1..10 -> ONE maximal span
    assert(r.count(_._1 === 1L) === 1)
    assert(r.find(_._1 === 1L).get === ((1L, 1, 10, 10L, passage)))
    // doc 2: the same passage sits at tokens 11..20
    assert(r.find(_._1 === 2L).get === ((2L, 11, 20, 10L, passage)))
    assert(!r.exists(_._1 === 3L), "clean docs emit no spans")
  }

  // --- real BMP media codec ---------------------------------------------

  test("bmpBytes writes a valid 24-bpp bottom-up BMP, golden bytes") {
    // 13 payload bytes at width 4 (12-byte rows) -> h = 2, zero-padded
    val payload = (1 to 13).map(_.toByte).toArray
    val b = Multimodal.bmpBytes(payload, width = 4)
    assert(b.length === 54 + 24)
    assert(b(0) === 'B'.toByte && b(1) === 'M'.toByte)
    // file size, pixel offset, dib size, width, height LE
    assert((b(2) & 0xff) === 78 && b(3) === 0 && (b(10) & 0xff) === 54)
    assert((b(14) & 0xff) === 40 && (b(18) & 0xff) === 4 && (b(22) & 0xff) === 2)
    assert((b(28) & 0xff) === 24 && (b(30) & 0xff) === 0, "24-bpp uncompressed")
    // bottom-up: file row 0 = image row 1 = payload byte 13 + 11 zeros
    assert(b.slice(54, 66).toSeq === (13.toByte +: Seq.fill(11)(0.toByte)))
    assert(b.slice(66, 78).toSeq === (1 to 12).map(_.toByte).toSeq)
  }

  test("parseBmp recovers dimensions and banded channel sums from real bytes") {
    // 48 payload bytes -> 4 rows, one per band at bands=4
    val payload = (1 to 48).map(_.toByte).toArray
    val (w, h, sums, cnts) = Multimodal.parseBmp(
      Multimodal.bmpBytes(payload, width = 4), bands = 4)
    assert(w === 4 && h === 4)
    assert(cnts.toSeq === Seq.fill(12)(4L))
    // band r channel c = sum of payload bytes {12r + c + 1, +3, +6, +9}
    val want = for (r <- 0 until 4; c <- 0 until 3)
      yield (0 until 4).map(k => 12 * r + 3 * k + c + 1).sum.toLong
    assert(sums.toSeq === want)
  }

  test("parseBmp handles top-down (negative height) and strided widths") {
    // width 3 -> rowBytes 9, stride 12: real padding exercised
    val payload = (1 to 18).map(_.toByte).toArray
    val b = Multimodal.bmpBytes(payload, width = 3)
    val (w, h, sums, _) = Multimodal.parseBmp(b, bands = 2)
    assert(w === 3 && h === 2)
    // flip to top-down: negate height, reorder file rows -> same sums
    val td = b.clone()
    val neg = -2
    td(22) = (neg & 0xff).toByte; td(23) = ((neg >> 8) & 0xff).toByte
    td(24) = ((neg >> 16) & 0xff).toByte; td(25) = ((neg >> 24) & 0xff).toByte
    val row0 = b.slice(54, 66); val row1 = b.slice(66, 78)
    System.arraycopy(row1, 0, td, 54, 12); System.arraycopy(row0, 0, td, 66, 12)
    val (_, h2, sums2, _) = Multimodal.parseBmp(td, bands = 2)
    assert(h2 === 2 && sums2.toSeq === sums.toSeq,
      "height sign only changes storage order, not content")
  }

  test("parseBmp rejects garbage loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.parseBmp("not a bitmap at all".getBytes("UTF-8"), 4)
    }
    val bad = Multimodal.bmpBytes((1 to 24).map(_.toByte).toArray, width = 4)
    bad(28) = 8 // claim 8-bpp
    intercept[IllegalArgumentException] { Multimodal.parseBmp(bad, 4) }
    intercept[IllegalArgumentException] {
      Multimodal.parseBmp(Multimodal.bmpBytes(Array.fill(24)(1.toByte), 4)
        .dropRight(4), 4) // truncated pixel array
    }
  }

  test("encodeBmp -> decodeBmp distributed round-trip matches local parse") {
    val docs = Seq((1L, "hello world of bitmaps"), (2L, "x"), (3L, ""))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("bytes"))
    val r = Multimodal.decodeBmp(Multimodal.encodeBmp(docs, width = 4), bands = 4)
      .select("media_id", "img_w", "img_h", "band_sums", "band_counts")
      .orderBy("media_id")
      .as[(Long, Int, Int, Seq[Long], Seq[Long])].collect()
    val local = Multimodal.parseBmp(
      Multimodal.bmpBytes("hello world of bitmaps".getBytes("UTF-8"), 4), 4)
    assert(r(0)._2 === 4 && r(0)._3 === local._2)
    assert(r(0)._4 === local._3.toSeq && r(0)._5 === local._4.toSeq)
    assert(r(2)._3 === 1 && r(2)._4.forall(_ === 0L),
      "empty payload still encodes one all-zero row")
  }

  test("wavBytes writes a canonical RIFF/WAVE 8-bit mono PCM file, golden bytes") {
    val payload = Array[Byte](0x80.toByte, 0x81.toByte, 0x7f.toByte) // 3 samples -> odd, padded
    val b = Multimodal.wavBytes(payload, sampleRate = 8000)
    assert(b.length === 48, "44-byte header + 3 data bytes + 1 pad")
    assert(new String(b.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") === "WAVE")
    assert(new String(b.slice(12, 16), "US-ASCII") === "fmt ")
    assert((b(20) & 0xff) === 1 && (b(22) & 0xff) === 1 && (b(34) & 0xff) === 8,
      "PCM, mono, 8-bit")
    assert(((b(24) & 0xff) | ((b(25) & 0xff) << 8)) === 8000)
    assert(new String(b.slice(36, 40), "US-ASCII") === "data")
    assert((b(40) & 0xff) === 3 && b(44) === 0x80.toByte && b(47) === 0,
      "data length excludes the alignment pad; pad byte is zero")
  }

  test("parseWav walks the chunk list past extra chunks and computes segment sums") {
    val payload = (0 until 8).map(v => (128 + v).toByte).toArray
    val plain = Multimodal.wavBytes(payload, 8000)
    // splice a LIST chunk between fmt and data, as real recorders emit
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    val spliced = plain.slice(0, 36) ++ list ++ plain.drop(36)
    // fix the RIFF size field (+12)
    val riffLen = ((spliced(4) & 0xff) | ((spliced(5) & 0xff) << 8)) + 12
    spliced(4) = (riffLen & 0xff).toByte; spliced(5) = ((riffLen >> 8) & 0xff).toByte
    val (rate, n, sumsq, cnts, zcs) = Multimodal.parseWav(spliced, segs = 4)
    assert(rate === 8000 && n === 8L)
    assert(cnts.toSeq === Seq(2L, 2L, 2L, 2L))
    // amplitudes 0,1 | 2,3 | 4,5 | 6,7
    assert(sumsq.toSeq === Seq(1L, 13L, 41L, 85L))
    // amps 0..7, mean 3.5: one mean-line crossing, between samples 3
    // and 4, attributed to sample 4's segment (index 2)
    assert(zcs.toSeq === Seq(0L, 0L, 1L, 0L))
  }

  test("parseWav rejects non-WAV and unsupported formats loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.parseWav("RIFFxxxxJUNK".getBytes("US-ASCII"), 4)
    }
    val stereo = Multimodal.wavBytes((1 to 4).map(_.toByte).toArray, 8000)
    stereo(22) = 2 // claim 2 channels
    intercept[IllegalArgumentException] { Multimodal.parseWav(stereo, 4) }
  }

  test("encodeWav -> decodeWav distributed round-trip matches local parse") {
    val docs = Seq((1L, "an audio payload of sorts"), (2L, "x"))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("bytes"))
    val r = Multimodal.decodeWav(Multimodal.encodeWav(docs), segs = 4)
      .select("media_id", "sample_rate", "n_samples", "seg_sumsq", "seg_counts")
      .orderBy("media_id")
      .as[(Long, Int, Long, Seq[Long], Seq[Long])].collect()
    val local = Multimodal.parseWav(
      Multimodal.wavBytes("an audio payload of sorts".getBytes("UTF-8"), 8000), 4)
    assert(r(0)._2 === 8000 && r(0)._3 === local._2)
    assert(r(0)._4 === local._3.toSeq && r(0)._5 === local._4.toSeq)
    assert(r(1)._3 === 1L && r(1)._5.toSeq === Seq(1L, 0L, 0L, 0L),
      "a 1-sample clip lands wholly in segment 0")
  }

  test("bandMeanFeatures: 6-dp means, empty bands score zero") {
    val df = Seq((Seq(10L, 0L, 300L), Seq(3L, 0L, 7L))).toDF("s", "c")
    val f = df.select(Multimodal.bandMeanFeatures(col("s"), col("c")).as("f"))
      .as[Seq[Double]].head()
    assert(f === Seq(3.333333, 0.0, 42.857143))
  }

  test("substringSpans keeps disjoint repeats as separate spans") {
    val p2 = (1 to 8).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, s"$passage mid1 mid2 mid3 mid4 mid5 mid6 mid7 mid8 mid9 $p2"),
      (2L, passage), (3L, p2)).toDF("doc_id", "text")
    val r = Dedup.substringSpans(docs, "doc_id", "text", n = 8)
      .filter(col("doc_id") === 1L).orderBy("span_start")
      .as[(Long, Int, Int, Long, String)].collect()
    assert(r.length === 2, "a 9-token unique gap keeps the two spans apart")
    assert(r(0)._2 === 1 && r(0)._3 === 10 && r(1)._4 === 8L)
  }
}
