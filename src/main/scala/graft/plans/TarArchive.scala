package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** USTAR (POSIX.1-1988 tar) member walk — the container of the
  * WebDataset image/audio training-shard layout (a `.tar` whose members
  * group by basename into samples: `key.jpg` + `key.cls` + `key.json`).
  * A tar archive is a sequence of 512-byte header blocks, each followed
  * by ⌈size/512⌉ payload blocks; the archive ends at two consecutive
  * zero blocks. The header carries the name (NUL-terminated, plus the
  * ustar `prefix` field for long paths), the size in OCTAL ASCII, a
  * typeflag ('0'/NUL = file, '5' = directory), and a CHECKSUM — the
  * unsigned byte sum of the header with the checksum field read as
  * spaces. The walk VERIFIES the checksum: a corrupt header ends the
  * walk cleanly and the members before it still return (a real shard
  * is read to the last whole member, the WARC discipline).
  *
  * `tar_members(blob)` → array of (name, typeflag, size, payload)
  * structs. Per-row, shuffle-free, whole-stage codegen via a static
  * call; payload slices are copied (never aliased into the shard
  * buffer) so a selected member doesn't pin its whole shard.
  */
case class TarMembers(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"tar_members requires binary, got $t")
    }

  override def dataType: DataType =
    ArrayType(TarMembers.MemberSchema, containsNull = false)
  override def prettyName: String = "tar_members"

  override def nullSafeEval(input: Any): Any =
    TarMembers.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TarMembers.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TarMembers {

  val MemberSchema: StructType = new StructType()
    .add("name", StringType)
    .add("typeflag", StringType)
    .add("size", LongType)
    .add("payload", BinaryType)

  private def allZero(b: Array[Byte], at: Int): Boolean = {
    var i = 0
    while (i < 512) { if (b(at + i) != 0) return false; i += 1 }
    true
  }

  /** NUL-terminated ASCII field. */
  private def str(b: Array[Byte], at: Int, len: Int): String = {
    var end = at
    val lim = at + len
    while (end < lim && b(end) != 0) end += 1
    new String(b, at, end - at, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Octal numeric field (leading spaces/NULs tolerated, ends at
    * space/NUL) — returns -1 when no octal digit is present.
    */
  private def octal(b: Array[Byte], at: Int, len: Int): Long = {
    var i = at
    val lim = at + len
    while (i < lim && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = -1L
    while (i < lim && b(i) >= '0' && b(i) <= '7') {
      if (v < 0) v = 0
      v = v * 8 + (b(i) - '0')
      i += 1
    }
    v
  }

  /** Header checksum: unsigned byte sum with bytes 148-155 as spaces. */
  def checksumOf(b: Array[Byte], at: Int): Long = {
    var s = 0L
    var i = 0
    while (i < 512) {
      s += (if (i >= 148 && i < 156) 32 else b(at + i) & 0xff)
      i += 1
    }
    s
  }

  /** Static so generated code calls it directly. Never null. */
  def parse(b: Array[Byte]): GenericArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    if (b == null) return new GenericArrayData(Array.empty[AnyRef])
    val n = b.length
    var at = 0
    var done = false
    while (!done && at + 512 <= n) {
      if (allZero(b, at)) {
        // end marker is TWO zero blocks; one alone also ends the walk
        done = true
      } else {
        val stored = octal(b, at + 148, 8)
        if (stored < 0 || stored != checksumOf(b, at)) {
          done = true // corrupt header: keep members parsed so far
        } else {
          val name0 = str(b, at, 100)
          val prefix = str(b, at + 345, 155)
          val name = if (prefix.isEmpty) name0 else prefix + "/" + name0
          val size = math.max(0L, octal(b, at + 124, 12))
          val tfByte = b(at + 156)
          val typeflag = if (tfByte == 0) "0" else String.valueOf(tfByte.toChar)
          val avail = math.min(size, (n - at - 512).toLong).toInt
          if (avail < size) {
            done = true // truncated payload: drop the partial member
          } else {
            val payload = java.util.Arrays.copyOfRange(b, at + 512, at + 512 + avail)
            val row = new GenericInternalRow(4)
            row.update(0, UTF8String.fromString(name))
            row.update(1, UTF8String.fromString(typeflag))
            row.setLong(2, size)
            row.update(3, payload)
            out.add(row)
            val blocks = ((size + 511) / 512).toInt
            at += 512 + blocks * 512
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Deterministic REAL-tar planting for the [[TarMembers]] gate — the
  * [[PngPlant]] pattern for containers: one WebDataset-shaped shard per
  * doc_id, built by an independent writer (this encoder lays out
  * headers and computes checksums itself; the parser must beat genuine
  * 512-byte framing, octal fields, and checksum verification to
  * recover the closed-form member table the oracle restates).
  *
  * Layout per shard: a directory entry `d{id}/`, then two samples
  * `s{id}_{j}` (j = 0, 1) of three members each — `.txt` (the sample
  * text), `.cls` (the class label digits), `.json` (metadata) — the
  * canonical WebDataset triple. Payload strings are closed-form in
  * (id, j) so DuckDB states names, sizes, and payloads directly.
  */
case class TarPlant(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"tar_plant requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "tar_plant"

  override def nullSafeEval(input: Any): Any =
    TarPlant.encode(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TarPlant.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[TarPlant]]'s MEDIA sibling: the image-bearing WebDataset shard —
  * each sample is `{key}.png` (a REAL [[PngPlant]] image, seed
  * 2·id + j) plus `{key}.cls`. Payload bytes are a genuine encoder's
  * output, so member SIZES are not closed-form; gates over this plant
  * assert the DECODED facts (dims, dhash, cls), which are.
  */
case class TarPlantMedia(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"tar_plant_media requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "tar_plant_media"

  override def nullSafeEval(input: Any): Any =
    TarPlantMedia.encode(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TarPlantMedia.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TarPlantMedia {

  def seedOf(id: Long, j: Long): Long = 2 * id + j

  /** Static so generated code calls it directly. */
  def encode(id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var j = 0L
    while (j < 2) {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      TarPlant.writeMember(bos, s"s${id}_$j.png", PngPlant.encode(seedOf(id, j)), '0')
      TarPlant.writeMember(bos, s"s${id}_$j.cls",
        TarPlant.clsOf(id, j).getBytes(ascii), '0')
      j += 1
    }
    bos.write(new Array[Byte](1024)) // two zero end blocks
    bos.toByteArray
  }
}

object TarPlant {

  def txtOf(id: Long, j: Long): String = s"sample s${id}_$j text ${(id + j) % 13}"
  def clsOf(id: Long, j: Long): String = ((id + 3 * j) % 10).toString
  def jsonOf(id: Long, j: Long): String = s"""{"k":${(id * 7 + j) % 100}}"""

  private def header(name: String, size: Long, typeflag: Char): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
    def put(at: Int, s: String): Unit = {
      val sb = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(sb, 0, h, at, sb.length)
    }
    put(100, "0000644") // mode, NUL-terminated by the zero fill
    put(108, "0000000") // uid
    put(116, "0000000") // gid
    put(124, f"$size%011o") // size, octal
    put(136, "00000000000") // mtime
    h(156) = typeflag.toByte
    put(257, "ustar")  // magic (NUL-terminated)
    put(263, "00")     // version
    // checksum: field as spaces during the sum, then "%06o\0 "
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = TarMembers.checksumOf(h, 0)
    put(148, f"$sum%06o")
    h(154) = 0
    h(155) = ' '.toByte
    h
  }

  /** One member: header + payload + block padding (shared with the
    * media plant).
    */
  private[plans] def writeMember(bos: java.io.ByteArrayOutputStream,
      name: String, payload: Array[Byte], typeflag: Char): Unit = {
    bos.write(header(name, payload.length.toLong, typeflag))
    bos.write(payload)
    val pad = (512 - payload.length % 512) % 512
    bos.write(new Array[Byte](pad))
  }

  /** Static so generated code calls it directly. */
  def encode(id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    writeMember(bos, s"d$id/", Array.emptyByteArray, '5')
    var j = 0L
    while (j < 2) {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      writeMember(bos, s"s${id}_$j.txt", txtOf(id, j).getBytes(ascii), '0')
      writeMember(bos, s"s${id}_$j.cls", clsOf(id, j).getBytes(ascii), '0')
      writeMember(bos, s"s${id}_$j.json", jsonOf(id, j).getBytes(ascii), '0')
      j += 1
    }
    bos.write(new Array[Byte](1024)) // two zero end blocks
    bos.toByteArray
  }
}
