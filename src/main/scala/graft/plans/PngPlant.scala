package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Deterministic REAL-PNG planting for the [[PngPixels]] gate — the
  * [[graft.multimodal.Multimodal.plantImage]] pattern, but emitting a
  * complete compressed image, not just a header: pixel (x, y) of a
  * doc_id-derived W×H RGB raster is integer arithmetic on
  * (doc_id, y·W + x), encoded through the JDK's own ImageIO PNG writer
  * (`javax.imageio` — standard library, a fully independent
  * implementation: IT picks the per-scanline filters and runs its own
  * Deflater). The decode side must therefore beat real filter choices
  * and a real zlib stream to recover the planted arithmetic — which the
  * DuckDB oracle restates directly, so a slip anywhere in the inflate /
  * unfilter / channel walk breaks the gate.
  *
  * Encoder handles are per-call; rasters here are ≤ 16×14 so the gate's
  * cost is dominated by deflate, not allocation. A real media pipeline
  * never runs this expression — it exists to feed [[PngPixels]] genuine
  * bytes under oracle control.
  */
case class PngPlant(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"png_plant requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_plant"

  override def nullSafeEval(input: Any): Any =
    PngPlant.encode(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PngPlant.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngPlant {

  /** Planted raster dimensions — small enough that per-row encoding is
    * cheap, varied enough that scanline count, row parity, and filter
    * heuristics differ across rows.
    */
  def widthOf(docId: Long): Int = (4 + docId % 13).toInt
  def heightOf(docId: Long): Int = (4 + docId % 11).toInt

  /** Static so generated code calls it directly. The pixel formulas are
    * restated verbatim by the oracle SQL (see
    * [[graft.multimodal.Multimodal.pixelStatsOracle]]). Three layouts
    * rotate by docId so one gate covers truecolor, PALETTE (type 3,
    * sub-byte depth, PLTE lookup), and 16-BIT grayscale (high-byte
    * projection): %4==1 → 16-entry indexed; %4==3 → ushort gray;
    * else 8-bit RGB.
    */
  def encode(docId: Long): Array[Byte] = {
    val w = widthOf(docId)
    val h = heightOf(docId)
    val img = (docId % 4) match {
      case 1 =>
        // 16-color palette: ImageIO writes a type-3 PNG with a PLTE and
        // 4-bit packed indices; every index is used (w*h >= 16)
        val rA = new Array[Byte](16); val gA = new Array[Byte](16); val bA = new Array[Byte](16)
        var j = 0
        while (j < 16) {
          rA(j) = ((docId + 17 * j) % 256).toByte
          gA(j) = ((docId * 7 + 23 * j) % 256).toByte
          bA(j) = ((docId * 13 + 29 * j) % 256).toByte
          j += 1
        }
        val icm = new java.awt.image.IndexColorModel(4, 16, rA, gA, bA)
        val im = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = y.toLong * w + x
            im.getRaster.setSample(x, y, 0, ((docId + i) % 16).toInt)
            x += 1
          }
          y += 1
        }
        im
      case 3 =>
        // 16-bit grayscale: decoder projects each sample to its high byte
        val im = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = y.toLong * w + x
            im.getRaster.setSample(x, y, 0, ((docId * 31 + 257 * i) % 65536).toInt)
            x += 1
          }
          y += 1
        }
        im
      case _ =>
        val im = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val i = y.toLong * w + x
            val r = ((docId + 3 * i) % 256).toInt
            val g = ((docId * 7 + 5 * i) % 256).toInt
            val b = ((docId * 13 + 11 * i) % 256).toInt
            im.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        im
    }
    val out = new java.io.ByteArrayOutputStream(1024)
    if (docId % 8 == 2) {
      // every eighth doc writes ADAM7-interlaced (ImageIO's progressive
      // mode) — same RGB pixel formula, so the same oracle gates it
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
    } else {
      javax.imageio.ImageIO.write(img, "png", out)
    }
    out.toByteArray
  }
}
