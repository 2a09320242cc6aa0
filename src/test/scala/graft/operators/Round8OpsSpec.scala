package graft.operators

import graft.SparkSpec

/** Round-8 operators: codec bounds hardening (overflow-crafted headers
  * must reject loudly, never mis-parse silently). */
class Round8OpsSpec extends SparkSpec {

  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  test("parseBmp rejects overflow-crafted header dimensions instead of zero-iterating") {
    // width near Int.MaxValue: 3*w overflows Int to a negative stride —
    // pre-fix the pixel loop ran zero iterations and returned all-zero
    // sums for a "valid" parse
    val b1 = Multimodal.bmpBytes(Array.fill(24)(1.toByte), width = 4)
    le32(b1, 18, Int.MaxValue - 2)
    val e1 = intercept[IllegalArgumentException] { Multimodal.parseBmp(b1, 4) }
    assert(e1.getMessage.contains("exceed"), s"got: ${e1.getMessage}")

    // hRaw = Int.MinValue survives math.abs as a negative Int
    val b2 = Multimodal.bmpBytes(Array.fill(24)(1.toByte), width = 4)
    le32(b2, 22, Int.MinValue)
    intercept[IllegalArgumentException] { Multimodal.parseBmp(b2, 4) }

    // adversarial PAIR whose stride*height product overflows even Long
    // back past the extent check
    val b3 = Multimodal.bmpBytes(Array.fill(24)(1.toByte), width = 4)
    le32(b3, 18, Int.MaxValue - 2); le32(b3, 22, Int.MinValue)
    intercept[IllegalArgumentException] { Multimodal.parseBmp(b3, 4) }
  }

  test("parseWav rejects a chunk length that wraps the Int extent check") {
    // len near Int.MaxValue: off + 8 + len wraps negative in Int
    // arithmetic and passed the bound pre-fix; the sample loop then blew
    // up with AIOOBE instead of the documented loud reject
    val b = Multimodal.wavBytes(Array[Byte](1, 2, 3, 4), sampleRate = 8000)
    le32(b, 40, Int.MaxValue - 4) // data chunk claims ~2^31 bytes
    val e = intercept[IllegalArgumentException] { Multimodal.parseWav(b, 4) }
    assert(e.getMessage.contains("overruns"), s"got: ${e.getMessage}")
  }
}
