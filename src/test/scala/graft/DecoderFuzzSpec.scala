package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Crash-safety fuzz over every byte-level decoder: a 100 TB crawl WILL
  * contain every possible corruption, and an executor-killing throw on
  * one blob fails a 10-hour stage. Three adversarial families, all
  * seeded (deterministic reruns): pure garbage, truncations of VALID
  * plants at every length, and valid plants with random byte flips.
  * The contract is "never throws" — outputs may be nulls or salvaged
  * prefixes, but the call must return.
  */
class DecoderFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x9e3779b9L)

  private def garbage(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }

  private def decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "jpeg_pixels" -> (b => graft.plans.JpegPixels.parse(b)),
    "png_pixels" -> (b => graft.plans.PngPixels.parse(b)),
    "wav_pcm" -> (b => graft.plans.WavPcm.parse(b)),
    "avi_frames" -> (b => graft.plans.AviFrames.parse(b)),
    "magic_format" -> (b => graft.plans.MagicFormat.sniff(b)),
    "gif_pixels" -> (b => graft.plans.GifPixels.parse(b)),
    "mp4_header" -> (b => graft.plans.Mp4Header.parse(b)),
    "image_header" -> (b => graft.plans.ImageHeader.parse(b)),
    "wav_header" -> (b => graft.plans.WavHeader.parse(b)),
    "warc_records" -> (b => graft.plans.WarcRecords.parse(UTF8String.fromBytes(b))),
    "http_message" -> (b => graft.plans.HttpMessage.parse(b)),
    "gunzip_text" -> (b => graft.plans.GunzipText.gunzip(b)))

  test("pure garbage at many sizes: every decoder returns, never throws") {
    val sizes = Seq(0, 1, 2, 3, 7, 16, 64, 255, 1024, 65536)
    for ((name, f) <- decoders; n <- sizes; _ <- 1 to 3) {
      val b = garbage(n)
      try f(b)
      catch { case e: Throwable => fail(s"$name threw on ${n}B garbage: $e") }
    }
  }

  test("every truncation of a valid plant returns") {
    val plants: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("jpeg", graft.plans.JpegPlant.encode(9L), b => graft.plans.JpegPixels.parse(b)),
      ("jpeg-progressive", graft.plans.JpegPlant.encode(2L), b => graft.plans.JpegPixels.parse(b)),
      ("png", graft.plans.PngPlant.encode(9L), b => graft.plans.PngPixels.parse(b)),
      ("png-palette", graft.plans.PngPlant.encode(5L), b => graft.plans.PngPixels.parse(b)),
      ("gzip", graft.plans.GzipBytes.gzip(UTF8String.fromString("fuzz payload " * 20)),
        b => graft.plans.GunzipText.gunzip(b)))
    for ((name, full, f) <- plants; cut <- 0 to full.length) {
      try f(full.take(cut))
      catch { case e: Throwable => fail(s"$name threw at truncation $cut/${full.length}: $e") }
    }
  }

  test("random byte flips in valid plants return (salvage or nulls, never a throw)") {
    val jpeg = graft.plans.JpegPlant.encode(16L) // progressive (16%7==2)
    val png = graft.plans.PngPlant.encode(13L) // palette (13%4==1)
    val http = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Content-Encoding: gzip\r\n\r\n5\r\nhello\r\n0\r\n\r\n").getBytes
    for (_ <- 1 to 300) {
      val (src, f): (Array[Byte], Array[Byte] => Any) = rnd.nextInt(3) match {
        case 0 => (jpeg, b => graft.plans.JpegPixels.parse(b))
        case 1 => (png, b => graft.plans.PngPixels.parse(b))
        case _ => (http, b => graft.plans.HttpMessage.parse(b))
      }
      val mutated = src.clone()
      val flips = 1 + rnd.nextInt(4)
      (1 to flips).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      try f(mutated)
      catch { case e: Throwable => fail(s"decoder threw on ${flips}-byte mutation: $e") }
    }
  }
}
