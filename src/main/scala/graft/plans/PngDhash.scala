package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructType}

/** `png_dhash(content, gw, gh)` — the difference-hash perceptual image
  * fingerprint over a decoded PNG: the standard near-duplicate-image
  * signal (image-dataset dedup runs exactly this before training).
  * The image is box-reduced to a (gw+1) × gh grayscale grid and bit
  * (r·gw + c) is set when grid[r][c] > grid[r][c+1] — horizontal
  * brightness gradients survive re-encoding, scaling, and small edits,
  * while any crop/rewrite of content flips many bits.
  *
  * Output struct: (width, height, dhash) — ONE decode serves both the
  * fingerprint and the dimension-class key the near-dup join buckets
  * on (a production media table carries dims as metadata columns; the
  * expression recovers them for tables that don't). NULL when the
  * stream is malformed or the image is smaller than the grid
  * (w < gw+1 or h < gh — a thumbnail that can't fill every cell has no
  * meaningful gradient signature; when w ≥ gw+1 the floor map is onto,
  * so every cell is non-empty and the division is total).
  *
  * Every step is exact integer arithmetic so a SQL engine reproduces
  * the hash bit-for-bit from the pixel values alone:
  * gray = (299·r + 587·g + 114·b) DIV 1000 (ITU-R 601 integer form),
  * cell of pixel (x, y) = (x·(gw+1) DIV w, y·gh DIV h), cell value =
  * sum(gray) DIV count.
  *
  * Rides [[PngPixels.walk]]'s shared decode core (one standards-path
  * PNG decode, two consumers); per-row, shuffle-free, codegen via a
  * static call — the same discipline as the stats expression.
  */
case class PngDhash(child: Expression, gw: Int, gh: Int) extends UnaryExpression {
  require(gw >= 1 && gh >= 1 && gw.toLong * gh <= 64,
    s"dhash grid must fit 64 bits, got ${gw}x$gh")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"png_dhash requires binary, got $t")
    }

  override def dataType: DataType = PngDhash.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "png_dhash"

  override def nullSafeEval(input: Any): Any =
    PngDhash.compute(input.asInstanceOf[Array[Byte]], gw, gh)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dh")
      s"""InternalRow $r = graft.plans.PngDhash.compute($c, $gw, $gh);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngDhash {

  val Schema: StructType = new StructType()
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("dhash", LongType)

  /** Static for codegen. Null = malformed or sub-grid. Grid and fold
    * arithmetic live in [[DhashCore]] — the one dHash definition the
    * JPEG and GIF expressions share, so identical pixels fingerprint
    * identically across formats.
    */
  def compute(b: Array[Byte], gw: Int, gh: Int): InternalRow = {
    if (b == null || b.length < 33) return null
    // cheap header read: width/height at the fixed IHDR offsets (walk
    // re-validates); a sub-grid image rejects before any decode work
    val w = ((b(16) & 0xffL) << 24 | (b(17) & 0xffL) << 16 |
      (b(18) & 0xffL) << 8 | (b(19) & 0xffL)).toInt
    val h = ((b(20) & 0xffL) << 24 | (b(21) & 0xffL) << 16 |
      (b(22) & 0xffL) << 8 | (b(23) & 0xffL)).toInt
    if (w < gw + 1 || h < gh) return null
    val sink = new DhashCore.GridSink(gw, gh, w, h)
    val info = PngPixels.walk(b, sink)
    if (info == null) return null
    // walk validated the real header; dims must agree with the probe
    if (info.w != w || info.h != h) return null
    DhashCore.row(w, h, DhashCore.fold(sink, gw, gh))
  }
}
