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
    writePng(img, docId % 8 == 2)
  }

  /** Shared ImageIO PNG write; `progressive` selects ADAM7 interlace. */
  private[plans] def writePng(img: java.awt.image.BufferedImage,
                              progressive: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    if (progressive) {
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

/** `png_plant_cell(seed, scale, gw, gh)` — the CROSS-RESOLUTION planting
  * twin for the resize-invariant near-dup gate: a real PNG of dimensions
  * ((gw+1)·scale) × (gh·scale) whose pixel (x, y) is the GRAY value of
  * its dHash grid cell, in closed form:
  *
  *   v(s, rr, c) = first byte of md5(s ‖ ":" ‖ (rr·(gw+1) + c))
  *   with rr = y // scale, c = x // scale  (r = g = b = v, so ITU-601
  *   gray is v exactly)
  *
  * Because every pixel of a cell carries the cell's value, the per-cell
  * integer mean equals v at ANY scale — a scale-2 plant IS the exact 2×
  * box-upscale of the scale-1 plant, and both reduce to the SAME
  * [[DhashCore]] hash. That makes the "thumbnails must match originals"
  * property a closed-form oracle: the DuckDB side computes the hash from
  * the 63 cell formulas directly, no pixel unnest. The md5 byte makes
  * the gradient bits of DISTINCT docs independent coin flips (an
  * arithmetic cell formula leaves the 56 bits linearly correlated
  * across seeds — measured: 31k coincidence pairs at sf0.01 — the same
  * structured-plant trap the 16-bit gotcha records), so the gate output
  * is exactly the planted twins at any fixture scale.
  */
case class PngPlantCell(child: Expression, scale: Int, gw: Int, gh: Int)
  extends UnaryExpression {
  require(scale >= 1 && scale <= 64, s"scale out of range: $scale")
  require(gw >= 1 && gh >= 1 && gw.toLong * gh <= 64,
    s"dhash grid must fit 64 bits, got ${gw}x$gh")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"png_plant_cell requires bigint, got $t")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_plant_cell"

  override def nullSafeEval(input: Any): Any =
    PngPlantCell.encode(input.asInstanceOf[Long], scale, gw, gh)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PngPlantCell.encode($c, $scale, $gw, $gh)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngPlantCell {

  /** The per-cell gray value — the ONE formula the oracle restates. */
  def cellValue(docId: Long, cellIdx: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$docId:$cellIdx".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff
  }

  /** Static so generated code calls it directly. */
  def encode(docId: Long, scale: Int, gw: Int, gh: Int): Array[Byte] = {
    val w = (gw + 1) * scale
    val h = gh * scale
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = cellValue(docId, (y / scale) * (gw + 1) + (x / scale))
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    PngPlant.writePng(im, progressive = false)
  }
}
