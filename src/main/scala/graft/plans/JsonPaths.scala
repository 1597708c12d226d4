package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `json_paths(s)` — the JSON schema-profiling walk: every node of a
  * JSON document as a (path, jtype) pair, array elements collapsed to
  * `[*]` — the raw material of the "what is actually in this JSON
  * column" report every ETL team runs before writing extraction code
  * (get_json_object needs the path; THIS is how you learn the paths).
  *
  * Paths: `$` root, `.key` per object member, `[*]` per array element;
  * jtype ∈ object | array | string | number | boolean | null. A
  * malformed document (bad syntax anywhere, or trailing garbage)
  * yields the single pair ($, malformed) — failure counts group
  * cleanly next to real types, the PngPixels null discipline.
  *
  * The walker is a strict recursive-descent JSON parser (string
  * escapes incl. \\uXXXX, full number grammar, true/false/null) —
  * not a regex: paths inside string VALUES must not leak. Per-row,
  * shuffle-free, codegen via a static call.
  */
case class JsonPaths(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"json_paths requires string, got $t")
    }

  override def dataType: DataType =
    ArrayType(JsonPaths.PairSchema, containsNull = false)
  override def prettyName: String = "json_paths"

  override def nullSafeEval(input: Any): Any =
    JsonPaths.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.JsonPaths.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonPaths {

  val PairSchema: StructType = new StructType()
    .add("path", StringType)
    .add("jtype", StringType)

  private final class Walker(val s: String) {
    var i = 0
    val out = new java.util.ArrayList[AnyRef]()
    def fail(): Nothing = throw Malformed

    def ws(): Unit = {
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    }

    def emit(path: String, t: String): Unit = {
      val r = new GenericInternalRow(2)
      r.update(0, UTF8String.fromString(path))
      r.update(1, UTF8String.fromString(t))
      out.add(r)
    }

    def value(path: String): Unit = {
      ws()
      if (i >= s.length) fail()
      s.charAt(i) match {
        case '{' => obj(path)
        case '[' => arr(path)
        case '"' => stringLit(); emit(path, "string")
        case 't' => lit3("true"); emit(path, "boolean")
        case 'f' => lit3("false"); emit(path, "boolean")
        case 'n' => lit3("null"); emit(path, "null")
        case c if c == '-' || (c >= '0' && c <= '9') => number(); emit(path, "number")
        case _ => fail()
      }
    }

    def lit3(word: String): Unit = {
      if (!s.startsWith(word, i)) fail()
      i += word.length
    }

    def stringLit(): Unit = {
      i += 1 // opening quote
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"') { i += 1; return }
        if (c == '\\') {
          if (i + 1 >= s.length) fail()
          s.charAt(i + 1) match {
            case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 2
            case 'u' =>
              if (i + 5 >= s.length) fail()
              var k = i + 2
              while (k < i + 6) {
                val h = s.charAt(k)
                if (!((h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') ||
                  (h >= 'A' && h <= 'F'))) fail()
                k += 1
              }
              i += 6
            case _ => fail()
          }
        } else i += 1
      }
      fail() // unterminated
    }

    def number(): Unit = {
      if (s.charAt(i) == '-') i += 1
      if (i >= s.length) fail()
      if (s.charAt(i) == '0') i += 1
      else if (s.charAt(i) >= '1' && s.charAt(i) <= '9') {
        while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      } else fail()
      if (i < s.length && s.charAt(i) == '.') {
        i += 1
        if (i >= s.length || s.charAt(i) < '0' || s.charAt(i) > '9') fail()
        while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (i >= s.length || s.charAt(i) < '0' || s.charAt(i) > '9') fail()
        while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
    }

    def keyString(): String = {
      val start = i
      stringLit()
      // raw key text between the quotes (escapes kept verbatim: the
      // profile's paths are labels, not re-parsed expressions)
      s.substring(start + 1, i - 1)
    }

    def obj(path: String): Unit = {
      emit(path, "object")
      i += 1 // '{'
      ws()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return }
      var more = true
      while (more) {
        ws()
        if (i >= s.length || s.charAt(i) != '"') fail()
        val k = keyString()
        ws()
        if (i >= s.length || s.charAt(i) != ':') fail()
        i += 1
        value(path + "." + k)
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else if (i < s.length && s.charAt(i) == '}') { i += 1; more = false }
        else fail()
      }
    }

    def arr(path: String): Unit = {
      emit(path, "array")
      i += 1 // '['
      ws()
      if (i < s.length && s.charAt(i) == ']') { i += 1; return }
      var more = true
      while (more) {
        value(path + "[*]")
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else if (i < s.length && s.charAt(i) == ']') { i += 1; more = false }
        else fail()
      }
    }
  }

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Static so generated code calls it directly. Never null. */
  def parse(u: UTF8String): GenericArrayData = {
    if (u == null) return new GenericArrayData(Array.empty[AnyRef])
    val w = new Walker(u.toString)
    try {
      w.value("$")
      w.ws()
      if (w.i != w.s.length) w.fail() // trailing garbage
      new GenericArrayData(w.out.toArray)
    } catch {
      case Malformed =>
        val r = new GenericInternalRow(2)
        r.update(0, UTF8String.fromString("$"))
        r.update(1, UTF8String.fromString("malformed"))
        new GenericArrayData(Array[AnyRef](r))
    }
  }
}
