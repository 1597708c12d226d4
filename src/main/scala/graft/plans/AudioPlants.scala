package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** The CELL-content audio plant shared by the resample-invariance and
  * mixed-codec gates — the audio twin of [[PngPlantCell]]:
  *
  *   sample(s, m, i) = cellByte(s, i // (k·m))
  *   with k = 2 + s % 6, n = 33·k·m samples,
  *   cellByte(s, c) = first byte of md5("a" ‖ s ‖ ":" ‖ c)
  *
  * Every envelope cell of the 32-gradient-bit fingerprint
  * ([[WavFingerprint]] at cells = 32 → 33 index ranges) covers exactly
  * k·m identical samples, so the exact integer envelope is the 33 cell
  * bytes at ANY upsample factor m — an m = 2 plant IS the true 2×
  * resample (each sample held twice) of the m = 1 plant, and a FLAC
  * encoding of the same samples decodes to the same envelope. The md5
  * byte makes distinct docs' fingerprint bits independent coin flips
  * (the [[PngPlantCell]] lesson: arithmetic cell formulas leave
  * cross-doc hashes correlated and flood a keyless join with
  * coincidence pairs).
  */
object AudioCellPlant {

  /** Envelope cells of the production fingerprint (32 gradient bits). */
  val Cells = 33

  def kOf(s: Long): Int = (2 + s % 6).toInt
  def nOf(s: Long, m: Int): Int = Cells * kOf(s) * m

  /** The ONE formula the oracles restate. */
  def cellByte(s: Long, c: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"a$s:$c".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff
  }

  def sample(s: Long, m: Int, i: Int): Int = cellByte(s, i / (kOf(s) * m))

  /** The decoded 16-bit PCM sample sequence. */
  def samples(s: Long, m: Int): Array[Int] = {
    val n = nOf(s, m)
    val out = new Array[Int](n)
    val km = kOf(s) * m
    var c = -1
    var v = 0
    var i = 0
    while (i < n) {
      if (i / km != c) { c = i / km; v = cellByte(s, c) }
      out(i) = v
      i += 1
    }
    out
  }

  /** Real RIFF/WAVE bytes: mono 16-bit PCM of [[samples]]. */
  def wavBytes(s: Long, m: Int): Array[Byte] = {
    val sm = samples(s, m)
    val dataSize = sm.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    def tag(t: String): Unit = out.write(t.getBytes, 0, 4)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    tag("RIFF"); le32(36 + dataSize); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1); le16(1); le32(16000); le32(32000); le16(2); le16(16)
    tag("data"); le32(dataSize)
    sm.foreach(v => le16(v & 0xffff))
    out.toByteArray
  }
}

/** `wav_plant_cell(seed, m)` — [[AudioCellPlant.wavBytes]] as an
  * expression: the m× held-sample resample of the seed's cell-content
  * stream, as genuine RIFF bytes the [[WavPcm.walk]] decode must
  * recover.
  */
case class WavPlantCell(child: Expression, m: Int) extends UnaryExpression {
  require(m >= 1 && m <= 16, s"upsample factor out of range: $m")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"wav_plant_cell requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_plant_cell"

  override def nullSafeEval(input: Any): Any =
    AudioCellPlant.wavBytes(input.asInstanceOf[Long], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AudioCellPlant.wavBytes($c, $m)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
