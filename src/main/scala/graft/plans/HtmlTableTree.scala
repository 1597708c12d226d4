package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `html_table_tree(html)` — the REAL nesting-aware table extractor
  * behind [[graft.text.HtmlTables]]'s declared parser swap point: a
  * single per-row stack scan that recovers EVERY table at EVERY depth,
  * outer-cell text included (the regex grammar can only pick the
  * innermost table of a nested run — a depth-2 wrapper's own cells
  * were dropped by design until round 12).
  *
  * One array element per cell:
  * `struct<tbl, depth, parent, row, colidx, header, cell>` —
  *  - `tbl`: table index in DOCUMENT ORDER of the opening tag (the
  *    innermost-only extractor's indices are a subsequence);
  *  - `depth`: 0 = top level; `parent`: enclosing table's `tbl`, −1
  *    at top level — the (tbl, parent) edges reconstruct the tree;
  *  - `row`/`colidx`/`header`: the [[graft.text.HtmlTables.cells]]
  *    contract — colidx is colspan-aware (running span sum; quoting
  *    styles `"2"`, `'2'`, `2` all honored), header flags any row
  *    containing a `<th>`;
  *  - `cell`: the cell's OWN character data — text of inline markup
  *    flows in (tags stripped), a nested table's content does NOT
  *    (it belongs to the nested table's cells; the wrapper cell sees
  *    only its own text around the nested table), trimmed.
  *
  * Tolerant by the crawl discipline: comments skipped, stray close
  * tags ignored, unclosed tables/rows/cells close implicitly at EOF,
  * `<br/>`-style self-closing inline tags are just stripped. Per-row,
  * shuffle-free, codegen via static call.
  */
case class HtmlTableTree(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"html_table_tree requires string, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tbl", IntegerType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("parent", IntegerType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("colidx", IntegerType, nullable = false),
    StructField("header", IntegerType, nullable = false),
    StructField("cell", StringType, nullable = false))), containsNull = false)

  override def prettyName: String = "html_table_tree"

  override def nullSafeEval(input: Any): Any =
    HtmlTableTree.parse(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HtmlTableTree.parse($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlTableTree {

  private val ColspanRe =
    java.util.regex.Pattern.compile("(?i)colspan\\s*=\\s*[\"']?(\\d+)")

  private final class TState(val idx: Int, val depth: Int, val parent: Int) {
    var row = -1
    var colSum = 0
    var rowOpen = false
    var rowHasTh = false
    var cellOpen = false
    var cellStart = 0
    val buf = new java.lang.StringBuilder
    // (colidx, text) of the open row, flushed with the header flag
    val rowCells = ArrayBuffer.empty[(Int, String)]
  }

  def parse(html: String): ArrayData = {
    val out = ArrayBuffer.empty[(Int, Int, Int, Int, Int, Int, String)]
    val stack = ArrayBuffer.empty[TState]
    var nextIdx = 0

    def top: TState = stack.last

    def closeCell(): Unit = if (stack.nonEmpty && top.cellOpen) {
      val t = top
      t.rowCells += ((t.cellStart, t.buf.toString.trim))
      t.buf.setLength(0)
      t.cellOpen = false
    }

    def flushRow(): Unit = if (stack.nonEmpty && top.rowOpen) {
      closeCell()
      val t = top
      val h = if (t.rowHasTh) 1 else 0
      t.rowCells.foreach { case (c, txt) =>
        out += ((t.idx, t.depth, t.parent, t.row, c, h, txt))
      }
      t.rowCells.clear()
      t.rowOpen = false
    }

    def closeTable(): Unit = if (stack.nonEmpty) {
      flushRow()
      stack.remove(stack.length - 1)
      ()
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val gt = html.indexOf('>', i + 1)
          if (gt < 0) i = n // dangling '<...' at EOF: drop
          else {
            val tag = html.substring(i + 1, gt)
            val isClose = tag.startsWith("/")
            val body = if (isClose) tag.substring(1) else tag
            var e = 0
            while (e < body.length && Character.isLetter(body.charAt(e))) e += 1
            val name = body.substring(0, e).toLowerCase(java.util.Locale.ROOT)
            name match {
              case "table" if !isClose =>
                val parent = if (stack.isEmpty) -1 else top.idx
                stack += new TState(nextIdx, stack.length, parent)
                nextIdx += 1
              case "table" => closeTable()
              case "tr" if stack.nonEmpty =>
                if (isClose) flushRow()
                else {
                  flushRow()
                  val t = top
                  t.row += 1
                  t.colSum = 0
                  t.rowHasTh = false
                  t.rowOpen = true
                }
              case "td" | "th" if stack.nonEmpty =>
                if (isClose) closeCell()
                else {
                  closeCell()
                  val t = top
                  if (!t.rowOpen) { t.row += 1; t.colSum = 0; t.rowHasTh = false; t.rowOpen = true }
                  val m = ColspanRe.matcher(tag)
                  val span = if (m.find()) math.max(1, m.group(1).toInt) else 1
                  t.cellStart = t.colSum
                  t.colSum += span
                  t.cellOpen = true
                  if (name == "th") t.rowHasTh = true
                }
              case _ => () // inline/unknown tags stripped; their text flows
            }
            i = gt + 1
          }
        }
      } else {
        if (stack.nonEmpty && top.cellOpen) top.buf.append(c)
        i += 1
      }
    }
    while (stack.nonEmpty) closeTable() // tolerant EOF

    val rows: Array[Any] = out.sortBy(r => (r._1, r._4, r._5)).map { r =>
      new GenericInternalRow(Array[Any](
        r._1, r._2, r._3, r._4, r._5, r._6, UTF8String.fromString(r._7))): InternalRow
    }.toArray
    new GenericArrayData(rows)
  }
}
