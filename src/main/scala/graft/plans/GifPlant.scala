package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic REAL-GIF planting for the [[GifPixels]] gate — the
  * [[PngPlant]] discipline for the second image format: a doc_id-derived
  * indexed raster (palette size 4/8/16 by doc, every palette color
  * distinct by construction so palettization is lossless) encoded through
  * the JDK's own ImageIO GIF writer, which runs its OWN LZW compressor
  * and makes its own table/framing choices. The decode side must
  * therefore beat a real LZW stream it did not produce; the DuckDB
  * oracle restates the planted palette/pixel arithmetic directly, so any
  * slip in the sub-block walk, code widths, dictionary growth, or
  * palette mapping breaks the gate.
  */
case class GifPlant(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"gif_plant requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gif_plant"

  override def nullSafeEval(input: Any): Any =
    GifPlant.encode(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GifPlant.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GifPlant {

  def widthOf(docId: Long): Int = (4 + docId % 9).toInt
  def heightOf(docId: Long): Int = (4 + docId % 7).toInt

  /** Palette size 4/8/16 — three LZW starting code widths. */
  def paletteSizeOf(docId: Long): Int = 1 << (2 + (docId % 3)).toInt

  /** Static so generated code calls it directly. Pixel i (row-major) has
    * palette index (docId + i) % P; palette entry j is
    * (3·docId + 5j, 11·docId + 7j, 17·docId + 13j) mod 256 — restated
    * verbatim by the oracle SQL. Colors are pairwise distinct for P ≤ 16
    * (5j distinct mod 256), so the encoder cannot merge entries and the
    * round trip is exactly lossless.
    */
  def encode(docId: Long): Array[Byte] = {
    val w = widthOf(docId)
    val h = heightOf(docId)
    val pSize = paletteSizeOf(docId)
    val rA = new Array[Byte](pSize)
    val gA = new Array[Byte](pSize)
    val bA = new Array[Byte](pSize)
    var j = 0
    while (j < pSize) {
      rA(j) = ((docId * 3 + 5 * j) % 256).toByte
      gA(j) = ((docId * 11 + 7 * j) % 256).toByte
      bA(j) = ((docId * 17 + 13 * j) % 256).toByte
      j += 1
    }
    val icm = new java.awt.image.IndexColorModel(8, pSize, rA, gA, bA)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, ((docId + i) % pSize).toInt)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream(512)
    // interlace OFF explicitly: the JDK writer interlaces GIFs by
    // default, and the JDK READER then drops the final row of small
    // interlaced images (decode here is unaffected — stats are row-order
    // independent — but the plant should be canonical sequential bytes)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close()
    writer.dispose()
    out.toByteArray
  }
}
