package graft

import graft.plans.{WavPcm, WavSegments}

class WavSegmentsSpec extends SparkSuite {

  /** Independent WAV writer over signed sample values. */
  private def wav(samples: Seq[Int], fmtCode: Int = 1): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def tag(t: String): Unit = bos.write(t.getBytes("US-ASCII"))
    val dataSize = samples.length * 2
    tag("RIFF"); le32(36 + dataSize); tag("WAVE")
    tag("fmt "); le32(16); le16(fmtCode); le16(1); le32(16000)
    le32(32000); le16(2); le16(16)
    tag("data"); le32(dataSize)
    samples.foreach(v => le16(v & 0xffff))
    bos.toByteArray
  }

  private def segs(samples: Seq[Int], th: Int = 1000): Seq[(Long, Long, Long, Long)] = {
    val arr = WavSegments.compute(wav(samples), th)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  test("maximal runs with exclusive ends; trailing run closes at stream end") {
    val s = Seq(0, 0, 5000, 6000, 0, 7000) // run [2,4), trailing [5,6)
    assert(segs(s) == Seq((2L, 4L, 2L, 6000L), (5L, 6L, 1L, 7000L)))
  }

  test("all-silent decodes to zero segments; all-active to one") {
    assert(segs(Seq(0, 3, -2, 999)).isEmpty)
    assert(segs(Seq(2000, -3000, 1500)) == Seq((0L, 3L, 3L, 3000L)))
  }

  test("threshold boundary: |v| == threshold is active, negative included") {
    assert(segs(Seq(0, 1000, -1000, 0)) == Seq((1L, 3L, 2L, 1000L)))
    assert(segs(Seq(0, 999, -999, 0)).isEmpty)
  }

  test("non-PCM and undecodable blobs yield empty; WavPcm agrees on nulls") {
    assert(WavSegments.compute(wav(Seq(5000), fmtCode = 7), 1000).numElements() == 0)
    assert(WavSegments.compute(Array.fill[Byte](30)(1), 1000).numElements() == 0)
    assert(WavPcm.parse(wav(Seq(5000), fmtCode = 7)).isNullAt(0))
  }

  test("refactored WavPcm stats unchanged on a mixed stream") {
    val r = WavPcm.parse(wav(Seq(100, -32768, 32767, 0)))
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 100L + 32768L + 32767L)
    assert(r.getLong(2) == 32768L)
    assert(r.getLong(3) == 2L)
  }
}
