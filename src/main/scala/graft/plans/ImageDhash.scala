package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Format-agnostic difference-hash core — the [[PngDhash]] grid/fold
  * arithmetic factored out so every decoder that speaks the shared
  * [[PngPixels.RgbSink]] visitor gets the SAME fingerprint for the
  * same pixels: one dHash definition, three codecs ([[PngPixels]],
  * [[JpegPixels]], [[GifPixels]]). That property is what makes the
  * MIXED-format near-dup join meaningful — a JPEG re-encode of a PNG
  * hashes into the same Hamming neighborhood because both rides reduce
  * through identical integer arithmetic (ITU-601 gray, floor box
  * reduce, per-cell integer means, horizontal gradient bits).
  *
  * Exactness discipline is unchanged from [[PngDhash]]: every step is
  * integer-only, so a SQL oracle recomputes each bit from planted
  * pixel formulas.
  */
object DhashCore {

  /** Grid sink: accumulates per-cell gray sums over (gw+1) × gh.
    * Alpha is ignored — dHash is a luminance-gradient signature.
    */
  final class GridSink(gw: Int, gh: Int, w: Int, h: Int) extends PngPixels.RgbSink {
    val cols = gw + 1
    val sum = new Array[Long](cols * gh)
    val cnt = new Array[Long](cols * gh)
    def pixel(x: Int, y: Int, r: Int, g: Int, bl: Int, a: Int): Unit = {
      val gray = (299 * r + 587 * g + 114 * bl) / 1000
      val c = (x.toLong * cols / w).toInt
      val rr = (y.toLong * gh / h).toInt
      val i = rr * cols + c
      sum(i) += gray
      cnt(i) += 1
    }
  }

  /** Fold the filled grid into the 64-bit gradient hash: bit
    * (r·gw + c) set when cell (r, c) > cell (r, c+1). Caller
    * guarantees w ≥ gw+1 so every cell is non-empty (floor map onto).
    */
  def fold(sink: GridSink, gw: Int, gh: Int): Long = {
    var hash = 0L
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < gw) {
        val i = r * sink.cols + c
        val av = sink.sum(i) / sink.cnt(i)
        val an = sink.sum(i + 1) / sink.cnt(i + 1)
        if (av > an) hash |= 1L << (r * gw + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** The (width, height, dhash) result row all three expressions share
    * ([[PngDhash.Schema]] is the one schema).
    */
  def row(w: Int, h: Int, hash: Long): InternalRow = {
    val out = new GenericInternalRow(3)
    out.setInt(0, w); out.setInt(1, h); out.setLong(2, hash)
    out
  }
}

/** `jpeg_dhash(content, gw, gh)` — the [[PngDhash]] fingerprint over a
  * decoded baseline/progressive JPEG, riding [[JpegPixels.walk]]'s
  * shared visitor (one entropy decode serves stats and fingerprint
  * consumers alike). NULL on malformed streams or sub-grid images
  * (w < gw+1 or h < gh). On the DC-exact [[JpegPlant]] fixtures the
  * decoded pixels equal the planted block values exactly, so the gate
  * oracle restates every hash bit in closed form; arbitrary-photo
  * decode fidelity is golden-tested in JpegPixelsSpec.
  */
case class JpegDhash(child: Expression, gw: Int, gh: Int) extends UnaryExpression {
  require(gw >= 1 && gh >= 1 && gw.toLong * gh <= 64,
    s"dhash grid must fit 64 bits, got ${gw}x$gh")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"jpeg_dhash requires binary, got $t")
    }

  override def dataType: DataType = PngDhash.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_dhash"

  override def nullSafeEval(input: Any): Any =
    JpegDhash.compute(input.asInstanceOf[Array[Byte]], gw, gh)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dh")
      s"""InternalRow $r = graft.plans.JpegDhash.compute($c, $gw, $gh);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegDhash {
  /** Static for codegen. Null = malformed or sub-grid. */
  def compute(b: Array[Byte], gw: Int, gh: Int): InternalRow = {
    var sink: DhashCore.GridSink = null
    val dims = JpegPixels.walk(b, (w, h) => {
      if (w < gw + 1 || h < gh) null
      else { sink = new DhashCore.GridSink(gw, gh, w, h); sink }
    })
    if (dims < 0 || sink == null) return null
    DhashCore.row((dims >>> 32).toInt, dims.toInt, DhashCore.fold(sink, gw, gh))
  }
}

/** `gif_dhash(content, gw, gh)` — the same fingerprint over a decoded
  * GIF frame, riding [[GifPixels.walk]]'s LZW stream visitor. NULL on
  * malformed streams or sub-grid images. The [[GifPlant]] palette and
  * index formulas make every planted pixel closed-form, so the gate
  * oracle recomputes each hash bit exactly.
  */
case class GifDhash(child: Expression, gw: Int, gh: Int) extends UnaryExpression {
  require(gw >= 1 && gh >= 1 && gw.toLong * gh <= 64,
    s"dhash grid must fit 64 bits, got ${gw}x$gh")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"gif_dhash requires binary, got $t")
    }

  override def dataType: DataType = PngDhash.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "gif_dhash"

  override def nullSafeEval(input: Any): Any =
    GifDhash.compute(input.asInstanceOf[Array[Byte]], gw, gh)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dh")
      s"""InternalRow $r = graft.plans.GifDhash.compute($c, $gw, $gh);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GifDhash {
  /** Static for codegen. Null = malformed or sub-grid. */
  def compute(b: Array[Byte], gw: Int, gh: Int): InternalRow = {
    var sink: DhashCore.GridSink = null
    val dims = GifPixels.walk(b, (w, h, _) => {
      if (w < gw + 1 || h < gh) null
      else { sink = new DhashCore.GridSink(gw, gh, w, h); sink }
    })
    if (dims < 0 || sink == null) return null
    DhashCore.row((dims >>> 32).toInt, dims.toInt, DhashCore.fold(sink, gw, gh))
  }
}
