package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "image", "0123456789abcdefghij".getBytes("UTF-8")),
    (2L, "audio", Array.fill[Byte](100)(7)),
    (3L, "video", Array.emptyByteArray)
  ).toDF("media_id", "kind", "bytes")

  test("content stats are pure expressions") {
    val r = Multimodal.withContentStats(media)
      .select("media_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 20L, 2L -> 100L, 3L -> 0L))
  }

  test("decodeStub: deterministic feature vector of requested dims") {
    val a = MediaDecodeStub.decodeStub(media, dims = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(a.values.forall(_.length === 8))
    assert(a.values.forall(_.forall(f => f >= -1.0f && f < 1.0f)))
    val b = MediaDecodeStub.decodeStub(media, dims = 8)
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(a === b) // deterministic
    assert(a(1L) !== a(2L)) // content-dependent
  }

  test("frameSample drops payload, keeps n slices") {
    val r = Multimodal.frameSample(media, n = 4, frameLen = 8)
    assert(!r.columns.contains("bytes"))
    val frames = r.filter(col("media_id") === 2).select("frames")
      .as[Seq[Array[Byte]]].head
    assert(frames.length === 4)
    assert(frames.forall(_.length === 8))
  }
}
