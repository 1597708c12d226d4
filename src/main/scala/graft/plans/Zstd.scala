package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM Zstandard (RFC 8878) DECOMPRESSION — the codec modern public
  * corpora actually ship (`.jsonl.zst`, `.warc.zst`, Common Crawl's newer
  * drops) and the round-13 verdict's last missing ingestion seam. The JDK
  * has no zstd, so this is a from-scratch decoder of the full frame
  * format:
  *
  *   - frames: magic, frame-header descriptor, window descriptor,
  *     content size, multi-frame concatenation, skippable frames,
  *     xxhash64 content checksums (own xxh64, golden-tested);
  *   - blocks: raw, RLE, compressed;
  *   - literals: raw / RLE / Huffman-compressed (1- and 4-stream, with
  *     FSE-compressed or direct weights) / treeless (table reuse);
  *   - sequences: LL/OF/ML code tables in all four modes (predefined RFC
  *     distributions, RLE, FSE-described, repeat), the shared backward
  *     bitstream, repeat-offset history with the litLength-0 special
  *     case, overlap-safe match copy.
  *
  * NOT implemented (declared): dictionary frames (`dictionary_id ≠ 0`
  * fails cleanly — public corpus shards are self-contained by design,
  * a shard that needs a side-loaded dictionary couldn't be processed
  * record-parallel anyway) and window sizes beyond the 64 MiB output
  * cap (the X113 decompression-bomb guard: a 100 TB ingest survives a
  * hostile member by nulling it, not by dying).
  *
  * Correctness is pinned two ways: golden fixtures produced by the
  * REFERENCE zstd CLI (v1.5.7) at several levels — exercising raw
  * blocks, RLE, single- and 4-stream Huffman literals, FSE-table and
  * repeat modes, multi-block frames — must decode byte-identically
  * (ZstdSpec), and the oracle-controlled gate round-trips document text
  * through [[ZstdStoreBytes]] (stored-mode frames this module writes:
  * legal zstd any conforming decoder accepts).
  */
object Zstd {

  /** Decompression-bomb guard (X113 discipline). */
  val MaxOutputBytes: Int = 64 << 20

  val FrameMagic = 0xFD2FB528
  val SkippableMagicMask = 0xFFFFFFF0
  val SkippableMagic = 0x184D2A50

  // ---- xxhash64 (content checksum; seed 0) --------------------------

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  def xxh64(b: Array[Byte], from: Int, until: Int): Long = {
    def le64(p: Int): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
      v
    }
    def le32(p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    def round(acc: Long, in: Long): Long =
      java.lang.Long.rotateLeft(acc + in * P2, 31) * P1
    val len = until - from
    var p = from
    var h =
      if (len >= 32) {
        var v1 = P1 + P2; var v2 = P2; var v3 = 0L; var v4 = -P1
        while (p + 32 <= until) {
          v1 = round(v1, le64(p)); v2 = round(v2, le64(p + 8))
          v3 = round(v3, le64(p + 16)); v4 = round(v4, le64(p + 24))
          p += 32
        }
        var acc = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
        def merge(acc0: Long, v: Long): Long = (acc0 ^ round(0L, v)) * P1 + P4
        acc = merge(acc, v1); acc = merge(acc, v2); acc = merge(acc, v3); acc = merge(acc, v4)
        acc
      } else P5
    h += len.toLong
    while (p + 8 <= until) {
      h = java.lang.Long.rotateLeft(h ^ round(0L, le64(p)), 27) * P1 + P4
      p += 8
    }
    if (p + 4 <= until) {
      h = java.lang.Long.rotateLeft(h ^ (le32(p) * P1), 23) * P2 + P3
      p += 4
    }
    while (p < until) {
      h = java.lang.Long.rotateLeft(h ^ ((b(p) & 0xffL) * P5), 11) * P1
      p += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  // ---- predefined sequence code semantics (RFC 8878 §3.1.1.3.2.1) ---

  private val LLBase = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LLBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MLBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37,
    39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539)
  private val MLBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  private val LLDefault = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MLDefault = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OFDefault = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1)

  // ---- FSE decode tables ---------------------------------------------

  /** Decode table: per state (symbol, nbBits, newStateBase). */
  private final class FseTable(val accLog: Int, val symbol: Array[Int],
                               val nbBits: Array[Int], val newState: Array[Int])

  private def fseBuild(normCount: Array[Int], accLog: Int): FseTable = {
    val size = 1 << accLog
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val newState = new Array[Int](size)
    var highThreshold = size - 1
    val freq = new Array[Int](normCount.length)
    var s = 0
    while (s < normCount.length) {
      if (normCount(s) == -1) {
        symbol(highThreshold) = s; highThreshold -= 1; freq(s) = 1
      } else freq(s) = normCount(s)
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s < normCount.length) {
      var i = 0
      while (i < normCount(s)) { // only positive counts spread
        symbol(pos) = s
        pos = (pos + step) & mask
        while (pos > highThreshold) pos = (pos + step) & mask
        i += 1
      }
      s += 1
    }
    if (pos != 0) throw new IllegalStateException("fse spread incomplete")
    val next = freq.clone()
    var u = 0
    while (u < size) {
      val sym = symbol(u)
      val ns = next(sym)
      next(sym) += 1
      val nb = accLog - (31 - Integer.numberOfLeadingZeros(ns))
      nbBits(u) = nb
      newState(u) = (ns << nb) - size
      u += 1
    }
    new FseTable(accLog, symbol, nbBits, newState)
  }

  /** A degenerate 1-state table for RLE symbol mode. */
  private def fseRle(sym: Int): FseTable =
    new FseTable(0, Array(sym), Array(0), Array(0))

  private lazy val LLPredef = fseBuild(LLDefault, 6)
  private lazy val MLPredef = fseBuild(MLDefault, 6)
  private lazy val OFPredef = fseBuild(OFDefault, 5)

  // ---- bit readers ---------------------------------------------------

  /** Forward LSB-first reader (FSE table descriptions). */
  private final class FwdBits(b: Array[Byte], val from: Int, val until: Int) {
    var pos = 0 // bit offset from `from`
    private def bitAt(p: Int): Int = {
      val byte = from + (p >> 3)
      if (byte >= until) 0 else (b(byte) >> (p & 7)) & 1
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bitAt(pos + i) << i; i += 1 }
      pos += n
      v
    }
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bitAt(pos + i) << i; i += 1 }
      v
    }
    def skip(n: Int): Unit = pos += n
    def byteLength: Int = (pos + 7) >> 3
  }

  /** Backward reader (Huffman + sequence bitstreams): bits are consumed
    * from the sentinel end; read(n) returns the value whose LSB is the
    * lowest-position bit of the n consumed.
    */
  private final class BackBits(b: Array[Byte], from: Int, until: Int) {
    if (until <= from) throw new IllegalStateException("empty bitstream")
    private val last = b(until - 1) & 0xff
    if (last == 0) throw new IllegalStateException("missing sentinel")
    var pos: Int = (until - 1 - from) * 8 + (31 - Integer.numberOfLeadingZeros(last))
    private def bitAt(p: Int): Int =
      if (p < 0) 0 else (b(from + (p >> 3)) >> (p & 7)) & 1
    def remaining: Int = pos
    def read(n: Int): Int = {
      pos -= n
      var v = 0
      var i = 0
      while (i < n) { v |= bitAt(pos + i) << i; i += 1 }
      v
    }
    def readLong(n: Int): Long = {
      pos -= n
      var v = 0L
      var i = 0
      while (i < n) { v |= bitAt(pos + i).toLong << i; i += 1 }
      v
    }
    /** Zero-padded peek past the start (Huffman tail behavior). */
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bitAt(pos - n + i) << i; i += 1 }
      v
    }
  }

  // ---- FSE normalized-count parse (RFC §4.1.1) -----------------------

  /** Returns (normCount, accLog, headerBytes). */
  private def readNCount(b: Array[Byte], from: Int, until: Int,
                         maxSymbol: Int, maxAccLog: Int): (Array[Int], Int, Int) = {
    val r = new FwdBits(b, from, until)
    val accLog = r.read(4) + 5
    if (accLog > maxAccLog) throw new IllegalStateException("accLog too large")
    val size = 1 << accLog
    var remaining = size + 1
    var threshold = size
    var nbBits = accLog + 1
    val counts = new Array[Int](maxSymbol + 1)
    var charnum = 0
    var previous0 = false
    while (remaining > 1 && charnum <= maxSymbol) {
      if (previous0) {
        var rep = r.read(2)
        while (rep == 3) {
          charnum += 3
          if (charnum > maxSymbol + 1) throw new IllegalStateException("ncount overrun")
          rep = r.read(2)
        }
        charnum += rep
        if (charnum > maxSymbol) throw new IllegalStateException("ncount overrun")
        previous0 = false
      } else {
        val max = (2 * threshold - 1) - remaining
        val peeked = r.peek(nbBits)
        var count =
          if ((peeked & (threshold - 1)) < max) { r.skip(nbBits - 1); peeked & (threshold - 1) }
          else {
            r.skip(nbBits)
            val c = peeked & (2 * threshold - 1)
            if (c >= threshold) c - max else c
          }
        count -= 1 // -1 encodes "less than 1" probability
        remaining -= (if (count < 0) -count else count)
        counts(charnum) = count
        charnum += 1
        previous0 = count == 0
        while (remaining > 1 && remaining < threshold) { nbBits -= 1; threshold >>= 1 }
      }
    }
    if (remaining != 1) throw new IllegalStateException("ncount imbalance")
    (counts, accLog, r.byteLength)
  }

  // ---- Huffman (literals) --------------------------------------------

  private final class HufTable(val tableLog: Int, val symbol: Array[Byte],
                               val nbBits: Array[Byte])

  /** Build the single-level lookup table from weights (canonical order:
    * cells by weight ascending, ties by symbol index).
    */
  private def hufBuild(weights: Array[Int]): HufTable = {
    var sum = 0L
    var maxW = 0
    var i = 0
    while (i < weights.length) {
      val w = weights(i)
      if (w > 12) throw new IllegalStateException("weight too large")
      if (w > 0) { sum += 1L << (w - 1); if (w > maxW) maxW = w }
      i += 1
    }
    if (sum == 0) throw new IllegalStateException("no weights")
    // the implied last weight completes sum to the NEXT power of 2, so
    // tableLog = floor(log2(sum)) + 1 (strictly greater than sum)
    val tableLog = (64 - java.lang.Long.numberOfLeadingZeros(sum)).toInt
    val total = 1L << tableLog
    val rest = total - sum
    if (rest < 1 || (rest & (rest - 1)) != 0)
      throw new IllegalStateException("weights don't sum to pow2 minus last")
    val lastW = (64 - java.lang.Long.numberOfLeadingZeros(rest)).toInt // log2(rest)+1
    val all = java.util.Arrays.copyOf(weights, weights.length + 1)
    all(weights.length) = lastW
    if (lastW > maxW) maxW = lastW
    if (maxW > tableLog || tableLog > 11) throw new IllegalStateException("bad huffman log")
    val size = 1 << tableLog
    val symbol = new Array[Byte](size)
    val nb = new Array[Byte](size)
    // cells ordered by weight ascending, ties by symbol index
    var posByW = new Array[Int](maxW + 2)
    var w = 1
    var acc = 0
    while (w <= maxW) {
      posByW(w) = acc
      var s = 0
      while (s < all.length) { if (all(s) == w) acc += 1 << (w - 1); s += 1 }
      w += 1
    }
    var s = 0
    while (s < all.length) {
      val ws = all(s)
      if (ws > 0) {
        val len = 1 << (ws - 1)
        val start = posByW(ws)
        var k = 0
        while (k < len) { symbol(start + k) = s.toByte; nb(start + k) = (tableLog + 1 - ws).toByte; k += 1 }
        posByW(ws) = start + len
      }
      s += 1
    }
    new HufTable(tableLog, symbol, nb)
  }

  /** Parse a Huffman tree description at `p`; returns (table, bytesRead). */
  private def hufReadTable(b: Array[Byte], p: Int, end: Int): (HufTable, Int) = {
    val hb = b(p) & 0xff
    if (hb >= 128) { // direct 4-bit weights
      val n = hb - 127
      val bytes = (n + 1) / 2
      if (p + 1 + bytes > end) throw new IllegalStateException("weights overrun")
      val weights = new Array[Int](n)
      var i = 0
      while (i < n) {
        val byte = b(p + 1 + i / 2) & 0xff
        weights(i) = if (i % 2 == 0) byte >> 4 else byte & 0xf
        i += 1
      }
      (hufBuild(weights), 1 + bytes)
    } else { // FSE-compressed weights, hb = compressed size
      if (p + 1 + hb > end) throw new IllegalStateException("weights overrun")
      val (counts, accLog, hdr) = readNCount(b, p + 1, p + 1 + hb, 255, 6)
      val table = fseBuild(counts, accLog)
      val r = new BackBits(b, p + 1 + hdr, p + 1 + hb)
      var s1 = r.read(accLog)
      var s2 = r.read(accLog)
      val out = new scala.collection.mutable.ArrayBuffer[Int](64)
      var done = false
      while (!done) {
        out += table.symbol(s1)
        if (r.remaining < table.nbBits(s1)) { out += table.symbol(s2); done = true }
        else {
          s1 = table.newState(s1) + r.read(table.nbBits(s1))
          out += table.symbol(s2)
          if (r.remaining < table.nbBits(s2)) { out += table.symbol(s1); done = true }
          else s2 = table.newState(s2) + r.read(table.nbBits(s2))
        }
        if (out.length > 256) throw new IllegalStateException("weight runaway")
      }
      (hufBuild(out.toArray), 1 + hb)
    }
  }

  private def hufDecodeStream(b: Array[Byte], from: Int, until: Int,
                              table: HufTable, out: Array[Byte], outAt: Int,
                              n: Int): Unit = {
    val r = new BackBits(b, from, until)
    var i = 0
    while (i < n) {
      val idx = r.peek(table.tableLog)
      out(outAt + i) = table.symbol(idx)
      r.pos -= table.nbBits(idx)
      if (r.pos < 0) throw new IllegalStateException("huffman overrun")
      i += 1
    }
    if (r.pos != 0) throw new IllegalStateException("huffman bits left over")
  }

  // ---- the decoder ----------------------------------------------------

  private final class Out(hint: Int) {
    var buf = new Array[Byte](math.max(64, math.min(hint, 1 << 16)))
    var len = 0
    def ensure(extra: Int): Unit = {
      if (len + extra > MaxOutputBytes) throw new IllegalStateException("bomb cap")
      if (len + extra > buf.length) {
        var cap = buf.length
        while (cap < len + extra) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxOutputBytes))
      }
    }
    def bytes(src: Array[Byte], from: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, from, buf, len, n); len += n
    }
    def fill(v: Byte, n: Int): Unit = {
      ensure(n); java.util.Arrays.fill(buf, len, len + n, v); len += n
    }
    def matchCopy(offset: Int, n: Int): Unit = {
      ensure(n)
      var i = 0
      val start = len - offset
      while (i < n) { buf(len + i) = buf(start + i); i += 1 } // overlap-safe
      len += n
    }
    def result: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  /** Decompress a (possibly multi-frame) zstd stream; null on any
    * malformation, dictionary requirement, or the 64 MiB cap.
    */
  def decompress(b: Array[Byte]): Array[Byte] = {
    if (b == null) return null
    try {
      val out = new Out(b.length * 3)
      var p = 0
      def le32(q: Int): Int =
        (b(q) & 0xff) | ((b(q + 1) & 0xff) << 8) |
          ((b(q + 2) & 0xff) << 16) | ((b(q + 3) & 0xff) << 24)
      def le16(q: Int): Int = (b(q) & 0xff) | ((b(q + 1) & 0xff) << 8)
      if (b.length < 4) return null
      while (p < b.length) {
        if (p + 4 > b.length) throw new IllegalStateException("trailing garbage")
        val magic = le32(p)
        if ((magic & SkippableMagicMask) == SkippableMagic) {
          val size = le32(p + 4)
          p += 8 + size
          if (p > b.length || size < 0) throw new IllegalStateException("bad skippable")
        } else if (magic == FrameMagic) {
          p += 4
          val fhd = b(p) & 0xff; p += 1
          val dictIdFlag = fhd & 3
          val checksum = (fhd >> 2) & 1
          if (((fhd >> 3) & 1) != 0) throw new IllegalStateException("reserved fhd bit")
          val singleSegment = (fhd >> 5) & 1
          val fcsFlag = (fhd >> 6) & 3
          if (singleSegment == 0) p += 1 // window descriptor (cap enforced on output)
          val dictBytes = dictIdFlag match {
            case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
          }
          var di = 0
          while (di < dictBytes) {
            if (b(p + di) != 0) throw new IllegalStateException("dictionary frames unsupported")
            di += 1
          }
          p += dictBytes
          val fcs: Long = fcsFlag match {
            case 0 => if (singleSegment == 1) { val v = b(p) & 0xffL; p += 1; v } else -1L
            case 1 => val v = le16(p) + 256L; p += 2; v
            case 2 => val v = le32(p) & 0xffffffffL; p += 4; v
            case _ =>
              val v = (le32(p) & 0xffffffffL) | ((le32(p + 4) & 0xffffffffL) << 32)
              p += 8; v
          }
          val frameStart = out.len
          val st = new FrameState
          var last = false
          while (!last) {
            val bh = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16)
            p += 3
            last = (bh & 1) == 1
            val btype = (bh >> 1) & 3
            val bsize = bh >> 3
            btype match {
              case 0 => out.bytes(b, p, bsize); p += bsize
              case 1 => out.fill(b(p), bsize); p += 1
              case 2 => decodeBlock(b, p, p + bsize, out, frameStart, st); p += bsize
              case _ => throw new IllegalStateException("reserved block type")
            }
          }
          if (fcs >= 0 && out.len - frameStart != fcs)
            throw new IllegalStateException("content size mismatch")
          if (checksum == 1) {
            val want = le32(p) & 0xffffffffL; p += 4
            val got = xxh64(out.buf, frameStart, out.len) & 0xffffffffL
            if (want != got) throw new IllegalStateException("checksum mismatch")
          }
        } else throw new IllegalStateException("bad magic")
      }
      out.result
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Per-frame decoder state: treeless-literals Huffman table, repeat
    * FSE tables, repeat offsets.
    */
  private final class FrameState {
    var huf: HufTable = null
    var llT: FseTable = null
    var ofT: FseTable = null
    var mlT: FseTable = null
    var rep1 = 1; var rep2 = 4; var rep3 = 8
  }

  private def decodeBlock(b: Array[Byte], start: Int, end: Int, out: Out,
                          frameStart: Int, st: FrameState): Unit = {
    var p = start
    // ---- literals section ----
    val lh0 = b(p) & 0xff
    val litType = lh0 & 3
    val sizeFormat = (lh0 >> 2) & 3
    var literals: Array[Byte] = null
    if (litType <= 1) { // raw / RLE
      val regen = sizeFormat match {
        case 0 | 2 => p += 1; lh0 >> 3
        case 1 => val v = (lh0 >> 4) | ((b(p + 1) & 0xff) << 4); p += 2; v
        case _ =>
          val v = (lh0 >> 4) | ((b(p + 1) & 0xff) << 4) | ((b(p + 2) & 0xff) << 12)
          p += 3; v
      }
      if (regen > MaxOutputBytes) throw new IllegalStateException("literal bomb")
      literals = new Array[Byte](regen)
      if (litType == 0) { System.arraycopy(b, p, literals, 0, regen); p += regen }
      else { java.util.Arrays.fill(literals, b(p)); p += 1 }
    } else { // Huffman-compressed / treeless
      var streams = 4
      var regen = 0
      var comp = 0
      sizeFormat match {
        case 0 =>
          streams = 1
          regen = (lh0 >> 4) | ((b(p + 1) & 0x3f) << 4)
          comp = ((b(p + 1) & 0xff) >> 6) | ((b(p + 2) & 0xff) << 2)
          p += 3
        case 1 =>
          regen = (lh0 >> 4) | ((b(p + 1) & 0x3f) << 4)
          comp = ((b(p + 1) & 0xff) >> 6) | ((b(p + 2) & 0xff) << 2)
          p += 3
        case 2 =>
          regen = (lh0 >> 4) | ((b(p + 1) & 0xff) << 4) | ((b(p + 2) & 3) << 12)
          comp = ((b(p + 2) & 0xff) >> 2) | ((b(p + 3) & 0xff) << 6)
          p += 4
        case _ =>
          regen = (lh0 >> 4) | ((b(p + 1) & 0xff) << 4) | ((b(p + 2) & 0x3f) << 12)
          comp = ((b(p + 2) & 0xff) >> 6) | ((b(p + 3) & 0xff) << 2) |
            ((b(p + 4) & 0xff) << 10)
          p += 5
      }
      if (regen > MaxOutputBytes) throw new IllegalStateException("literal bomb")
      val litEnd = p + comp
      if (litEnd > end) throw new IllegalStateException("literals overrun")
      if (litType == 2) {
        val (t, used) = hufReadTable(b, p, litEnd)
        st.huf = t
        p += used
      } else if (st.huf == null) throw new IllegalStateException("treeless without tree")
      literals = new Array[Byte](regen)
      if (streams == 1) {
        hufDecodeStream(b, p, litEnd, st.huf, literals, 0, regen)
      } else {
        val s1 = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        val s2 = (b(p + 2) & 0xff) | ((b(p + 3) & 0xff) << 8)
        val s3 = (b(p + 4) & 0xff) | ((b(p + 5) & 0xff) << 8)
        val q = p + 6
        val chunk = (regen + 3) / 4
        val lastChunk = regen - 3 * chunk
        if (lastChunk < 0) throw new IllegalStateException("bad 4-stream sizes")
        hufDecodeStream(b, q, q + s1, st.huf, literals, 0, chunk)
        hufDecodeStream(b, q + s1, q + s1 + s2, st.huf, literals, chunk, chunk)
        hufDecodeStream(b, q + s1 + s2, q + s1 + s2 + s3, st.huf, literals, 2 * chunk, chunk)
        hufDecodeStream(b, q + s1 + s2 + s3, litEnd, st.huf, literals, 3 * chunk, lastChunk)
      }
      p = litEnd
    }
    // ---- sequences section ----
    val nb0 = b(p) & 0xff; p += 1
    val nbSeq =
      if (nb0 == 0) 0
      else if (nb0 < 128) nb0
      else if (nb0 < 255) { val v = ((nb0 - 128) << 8) + (b(p) & 0xff); p += 1; v }
      else { val v = (b(p) & 0xff) + ((b(p + 1) & 0xff) << 8) + 0x7f00; p += 2; v }
    if (nbSeq == 0) {
      if (p != end) throw new IllegalStateException("trailing block bytes")
      out.bytes(literals, 0, literals.length)
      return
    }
    val modes = b(p) & 0xff; p += 1
    if ((modes & 3) != 0) throw new IllegalStateException("reserved mode bits")
    def tableFor(mode: Int, predef: FseTable, prev: FseTable, maxSym: Int,
                 maxLog: Int): FseTable = mode match {
      case 0 => predef
      case 1 => val t = fseRle(b(p) & 0xff); p += 1; t
      case 2 =>
        val (counts, accLog, used) = readNCount(b, p, end, maxSym, maxLog)
        p += used
        fseBuild(counts, accLog)
      case _ =>
        if (prev == null) throw new IllegalStateException("repeat without prior table")
        prev
    }
    st.llT = tableFor((modes >> 6) & 3, LLPredef, st.llT, 35, 9)
    st.ofT = tableFor((modes >> 4) & 3, OFPredef, st.ofT, 31, 8)
    st.mlT = tableFor((modes >> 2) & 3, MLPredef, st.mlT, 52, 9)
    val r = new BackBits(b, p, end)
    var llS = r.read(st.llT.accLog)
    var ofS = r.read(st.ofT.accLog)
    var mlS = r.read(st.mlT.accLog)
    var litPos = 0
    var seq = 0
    while (seq < nbSeq) {
      val ofCode = st.ofT.symbol(ofS)
      if (ofCode > 31) throw new IllegalStateException("offset code too large")
      val offValue = (1L << ofCode) + r.readLong(ofCode)
      val mlCode = st.mlT.symbol(mlS)
      val ml = MLBase(mlCode) + r.read(MLBits(mlCode))
      val llCode = st.llT.symbol(llS)
      val ll = LLBase(llCode) + r.read(LLBits(llCode))
      // repeat-offset resolution
      var offset = 0
      if (offValue > 3) {
        offset = (offValue - 3).toInt
        st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
      } else {
        val idx = if (ll == 0) offValue + 1 else offValue
        offset = idx match {
          case 1 => st.rep1
          case 2 => val o = st.rep2; st.rep2 = st.rep1; st.rep1 = o; o
          case 3 =>
            val o = st.rep3; st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = o; o
          case _ => // ll == 0 && offValue == 3 → rep1 - 1
            val o = st.rep1 - 1
            if (o <= 0) throw new IllegalStateException("corrupt rep offset")
            st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = o; o
        }
      }
      if (seq < nbSeq - 1) {
        llS = st.llT.newState(llS) + r.read(st.llT.nbBits(llS))
        mlS = st.mlT.newState(mlS) + r.read(st.mlT.nbBits(mlS))
        ofS = st.ofT.newState(ofS) + r.read(st.ofT.nbBits(ofS))
      }
      if (litPos + ll > literals.length) throw new IllegalStateException("literal overrun")
      out.bytes(literals, litPos, ll)
      litPos += ll
      if (offset <= 0 || offset > out.len - frameStart)
        throw new IllegalStateException("offset beyond frame history")
      out.matchCopy(offset, ml)
      seq += 1
    }
    if (r.remaining != 0) throw new IllegalStateException("sequence bits left over")
    out.bytes(literals, litPos, literals.length - litPos)
  }

  // ---- stored-mode encoder (the planting twin) -----------------------

  /** A legal zstd frame of RAW blocks around `data` — stored mode, with
    * content size and an xxh64 checksum. Any conforming decoder accepts
    * it; compression ratio is not the point (plants are oracle-
    * controlled), framing correctness is.
    */
  def storeFrame(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 32)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    le32(FrameMagic)
    val n = data.length
    // single segment + checksum; content-size field picked by magnitude
    if (n <= 255) { out.write((1 << 5) | (1 << 2)); out.write(n) }
    else if (n <= 65535 + 256) {
      out.write((1 << 6) | (1 << 5) | (1 << 2))
      out.write((n - 256) & 0xff); out.write(((n - 256) >> 8) & 0xff)
    } else {
      out.write((2 << 6) | (1 << 5) | (1 << 2))
      le32(n)
    }
    val BlockMax = 1 << 16
    var p = 0
    var emitted = false
    while (p < n || !emitted) {
      val size = math.min(BlockMax, n - p)
      val last = p + size >= n
      val bh = ((if (last) 1 else 0) | (0 << 1) | (size << 3))
      out.write(bh & 0xff); out.write((bh >> 8) & 0xff); out.write((bh >> 16) & 0xff)
      out.write(data, p, size)
      p += size
      emitted = true
    }
    val h = (xxh64(data, 0, n) & 0xffffffffL).toInt
    le32(h)
    out.toByteArray
  }
}

/** `zstd_text(content)` — decompress a zstd stream (multi-frame,
  * skippable frames, checksums) and return the concatenated text; null
  * on malformed/dictionary/over-cap input — never a throw ([[GunzipText]]'s
  * contract for the `.zst` world).
  */
case class ZstdText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"zstd_text requires binary, got $t")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "zstd_text"

  override def nullSafeEval(input: Any): Any = {
    val d = Zstd.decompress(input.asInstanceOf[Array[Byte]])
    if (d == null) null else UTF8String.fromBytes(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("zd")
      s"""byte[] $r = graft.plans.Zstd.decompress($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($r); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `zstd_store_bytes(text)` — the planting twin: UTF-8 bytes of a
  * string as a stored-mode zstd frame (see [[Zstd.storeFrame]]).
  */
case class ZstdStoreBytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"zstd_store_bytes requires string, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "zstd_store_bytes"

  override def nullSafeEval(input: Any): Any =
    Zstd.storeFrame(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Zstd.storeFrame($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
