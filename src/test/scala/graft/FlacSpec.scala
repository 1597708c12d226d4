package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{AudioCellPlant, FlacEncode, FlacPcm, FlacPlantWide, WavFingerprint, WavPcm}

class FlacSpec extends AnyFunSuite {

  private def collect(b: Array[Byte]): (Int, Vector[Int]) = {
    val buf = Vector.newBuilder[Int]
    val n = FlacPcm.walk(b, new WavPcm.SampleSink {
      def sample(i: Int, v: Int): Unit = buf += v
    })
    (n, buf.result())
  }

  test("wide plant round-trips bit-exactly across subframe classes") {
    for (seed <- 0L to 40L) {
      val want = (0 until FlacPlantWide.nOf(seed))
        .map(i => FlacPlantWide.sampleAt(seed, i)).toVector
      val (n, got) = collect(FlacPlantWide.encode(seed))
      assert(n == want.length, s"seed $seed count")
      assert(got == want, s"seed $seed samples")
    }
  }

  test("cell plant round-trips at 1x and 2x; constant blocks exercised") {
    for (seed <- 1L to 12L; m <- Seq(1, 2)) {
      val want = AudioCellPlant.samples(seed, m).toVector
      val (n, got) = collect(FlacEncode.encode(AudioCellPlant.samples(seed, m)))
      assert(n == want.length && got == want, s"seed $seed m $m")
    }
  }

  test("stats fold matches a direct aggregate of the planted formulas") {
    val seed = 17L
    val row = FlacPcm.parse(FlacPlantWide.encode(seed))
    val sm = (0 until FlacPlantWide.nOf(seed)).map(i => FlacPlantWide.sampleAt(seed, i))
    assert(row.getLong(0) == sm.length)
    assert(row.getLong(1) == sm.map(v => math.abs(v.toLong)).sum)
    assert(row.getLong(2) == sm.map(v => math.abs(v.toLong)).max)
    assert(row.getLong(3) == sm.count(v => v == 32767 || v == -32768))
    assert(row.getLong(3) > 0, "plant must exercise clipping")
  }

  test("stereo independent and mid/side round-trip interleaved") {
    val inter = Array.tabulate(2 * 150) { k =>
      val i = k / 2
      if (k % 2 == 0) ((i * 613 + 7) % 20000) - 10000
      else ((i * 227 + 3) % 16000) - 8000
    }
    for (ms <- Seq(false, true)) {
      val (n, got) = collect(FlacEncode.encode(inter, channels = 2, midSide = ms))
      assert(n == inter.length, s"midSide=$ms count")
      assert(got == inter.toVector, s"midSide=$ms samples")
    }
  }

  test("garbage, null, truncated header, and wrong codec yield -1") {
    val sink = new WavPcm.SampleSink { def sample(i: Int, v: Int): Unit = () }
    assert(FlacPcm.walk(null, sink) == -1)
    assert(FlacPcm.walk(Array.fill[Byte](64)(9), sink) == -1)
    assert(FlacPcm.walk("fLaC".getBytes ++ Array.fill[Byte](10)(0), sink) == -1)
    // a WAV blob is not FLAC
    assert(FlacPcm.walk(AudioCellPlant.wavBytes(3L, 1), sink) == -1)
    // and a FLAC blob is not WAV
    assert(WavPcm.walk(FlacPlantWide.encode(3L), sink) == -1)
  }

  test("a corrupted tail frame stops at the last good frame (truncated shape)") {
    val seed = 9L
    val full = FlacPlantWide.encode(seed)
    val want = (0 until FlacPlantWide.nOf(seed)).map(i => FlacPlantWide.sampleAt(seed, i))
    // flip a byte near the end: the final frame's CRC must reject it
    val broken = full.clone()
    broken(broken.length - 3) = (broken(broken.length - 3) ^ 0x5a).toByte
    val (n, got) = collect(broken)
    assert(n >= 0 && n < want.length, "must stop early, not fail outright")
    assert(n % FlacEncode.BlockSize == 0, "stops on a frame boundary")
    assert(got == want.take(n).toVector, "good frames decode unchanged")
    // truncation mid-stream behaves the same way
    val (n2, got2) = collect(java.util.Arrays.copyOfRange(full, 0, full.length - 5))
    assert(n2 < want.length && got2 == want.take(n2).toVector)
  }

  test("hand-built LPC subframe decodes through the predictor") {
    // one 16-sample mono frame, LPC order 2, coefs (2, -1) <<0 on top of
    // Rice-coded residuals — built with the encoder's own bit-writer so
    // the decoder's LPC path is pinned without an external encoder
    val order = 2
    val warm = Array(100, 103)
    val res = Array.tabulate(14)(i => (i % 5) - 2)
    val bs = 16
    val head = new FlacEncode.BitWriter
    head.bits(0x664c6143L, 32)
    head.bit(1); head.bits(0, 7); head.bits(34, 24)
    head.bits(bs, 16); head.bits(bs, 16); head.bits(0, 24); head.bits(0, 24)
    head.bits(16000, 20); head.bits(0, 3); head.bits(15, 5); head.bits(bs.toLong, 36)
    (0 until 16).foreach(_ => head.bits(0, 8))
    val w = new FlacEncode.BitWriter
    w.bits(0x3ffe, 14); w.bit(0); w.bit(0)
    w.bits(7, 4); w.bits(0, 4); w.bits(0, 4); w.bits(4, 3); w.bit(0)
    FlacEncode.codedNumber(w, 0)
    w.bits(bs - 1, 16)
    val hb = w.toBytes
    val fw = new FlacEncode.BitWriter
    fw.bytes(hb)
    fw.bits(FlacPcm.crc8(hb, 0, hb.length), 8)
    fw.bit(0); fw.bits(32 + (order - 1), 6); fw.bit(0) // LPC order 2
    warm.foreach(v => fw.bits(v.toLong & 0xffff, 16))
    fw.bits(4, 4) // precision 5 bits
    fw.bits(0, 5) // shift 0
    fw.bits(2L & 0x1f, 5); fw.bits(-1L & 0x1f, 5) // coefs 2, -1
    fw.bits(0, 2); fw.bits(0, 4); fw.bits(3, 4) // rice method 0, po 0, param 3
    res.foreach { e =>
      val u = (e << 1) ^ (e >> 31)
      val q = u >>> 3
      (0 until q).foreach(_ => fw.bit(0)); fw.bit(1)
      fw.bits(u & 7, 3)
    }
    fw.alignZero()
    val fb = fw.toBytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.toBytes); out.write(fb)
    val crc = FlacPcm.crc16(fb, 0, fb.length)
    out.write((crc >> 8) & 0xff); out.write(crc & 0xff)
    val (n, got) = collect(out.toByteArray)
    val want = warm.toBuffer
    res.foreach(e => want += e + 2 * want(want.length - 1) - want(want.length - 2))
    assert(n == bs)
    assert(got == want.toVector)
  }

  test("wasted-bits subframe shifts decoded samples back up") {
    val bs = 8
    val head = new FlacEncode.BitWriter
    head.bits(0x664c6143L, 32)
    head.bit(1); head.bits(0, 7); head.bits(34, 24)
    head.bits(bs, 16); head.bits(bs, 16); head.bits(0, 24); head.bits(0, 24)
    head.bits(16000, 20); head.bits(0, 3); head.bits(15, 5); head.bits(bs.toLong, 36)
    (0 until 16).foreach(_ => head.bits(0, 8))
    val w = new FlacEncode.BitWriter
    w.bits(0x3ffe, 14); w.bit(0); w.bit(0)
    w.bits(7, 4); w.bits(0, 4); w.bits(0, 4); w.bits(4, 3); w.bit(0)
    FlacEncode.codedNumber(w, 0)
    w.bits(bs - 1, 16)
    val hb = w.toBytes
    val fw = new FlacEncode.BitWriter
    fw.bytes(hb)
    fw.bits(FlacPcm.crc8(hb, 0, hb.length), 8)
    // CONSTANT with wasted_bits = 2: flag 1 then unary 1 more zero+stop
    fw.bit(0); fw.bits(0, 6); fw.bit(1); fw.bit(0); fw.bit(1)
    fw.bits(25L & 0x3fff, 14) // 16 - 2 wasted → 14-bit constant 25 → 100
    fw.alignZero()
    val fb = fw.toBytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.toBytes); out.write(fb)
    val crc = FlacPcm.crc16(fb, 0, fb.length)
    out.write((crc >> 8) & 0xff); out.write(crc & 0xff)
    val (n, got) = collect(out.toByteArray)
    assert(n == bs && got == Vector.fill(bs)(100))
  }

  test("one envelope definition: WAV and FLAC of the same samples fingerprint identically") {
    for (seed <- 1L to 8L) {
      val wav = WavFingerprint.compute(AudioCellPlant.wavBytes(seed, 1), 32)
      val flac = graft.plans.FlacFingerprint.compute(
        FlacEncode.encode(AudioCellPlant.samples(seed, 1)), 32)
      assert(wav != null && flac != null, s"seed $seed")
      assert(wav.getLong(0) == flac.getLong(0), s"seed $seed n")
      assert(wav.getLong(1) == flac.getLong(1), s"seed $seed afp")
      // and the envelope equals the closed-form cell bytes' gradients
      var want = 0L
      (0 until 32).foreach { c =>
        if (AudioCellPlant.cellByte(seed, c) > AudioCellPlant.cellByte(seed, c + 1))
          want |= 1L << c
      }
      assert(wav.getLong(1) == want, s"seed $seed closed form")
    }
  }
}
