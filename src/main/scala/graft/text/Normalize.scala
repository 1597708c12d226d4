package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UD1 `normalize_text` (`preprocess_and_store_parquets.py:111-138`)
  * re-expressed as a pure Catalyst composition: `lower` → 4 domain-keyword
  * removals → whitespace collapse → email strip → file-path strip → digit
  * strip → trim.
  *
  * The reference runs this as a Python UDF — a per-row JVM↔Python
  * serialization wall (`BatchEvalPython` breaks whole-stage codegen). As a
  * `Column → Column` composition every step is a codegen'd native
  * expression, so the whole chain stays inside one WholeStageCodegen span
  * and the scan's column pruning still applies. A Scala-UDF twin exists
  * only to demonstrate the UDF registration surface.
  *
  * Step ORDER is semantics: the reference collapses whitespace BEFORE
  * stripping digits, so digit runs leave behind un-collapsed spaces —
  * faithfully preserved here.
  */
object Normalize {

  /** (pattern, replacement) chain ↔ `preprocess_and_store_parquets.py:121-132`.
    * Patterns are valid in both Java regex (Spark) and RE2 (DuckDB oracle).
    */
  val Replacements: Seq[(String, String)] = Seq(
    ("\\bencounter id\\b", ""),
    ("\\blong text id\\b", ""),
    ("\\barea affected\\b", ""),
    ("\\baffected applications\\b", ""),
    ("\\s+", " "),
    ("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", ""),
    ("([A-Za-z]:)?(\\\\[\\w-]+)+\\\\?([\\w-]+(\\.\\w+)*)?", ""),
    ("\\d+", " ")
  )

  /** The full normalize chain as a native expression tree. */
  def normalizeText(c: Column): Column = {
    val replaced = Replacements.foldLeft(lower(c)) {
      case (acc, (pat, rep)) => regexp_replace(acc, pat, rep)
    }
    trim(replaced)
  }

  /** Scala-UDF twin — same spec, in-JVM (no pickle boundary) but opaque to
    * codegen. Kept to cover the reference's UDF registration surface
    * (`preprocess_and_store_parquets.py:141`); the expression form above is
    * what pipelines use.
    */
  val normalizeTextScala: String => String = { text =>
    if (text == null) null
    else {
      val lowered = text.toLowerCase
      val replaced = Replacements.foldLeft(lowered) { case (acc, (pat, rep)) =>
        acc.replaceAll(pat, rep)
      }
      replaced.trim
    }
  }

  /** DuckDB equivalent of [[normalizeText]] applied to column expr `c` —
    * generated from the same [[Replacements]] so the two can't drift.
    * DuckDB regexp_replace needs the 'g' flag (Spark is global by default).
    */
  def normalizeSql(c: String): String = {
    // The runtime pattern string (e.g. `\bencounter id\b`) is already the
    // regex RE2 should see; DuckDB single-quoted literals keep backslashes,
    // so the pattern passes through verbatim.
    val replaced = Replacements.foldLeft(s"lower($c)") { case (acc, (pat, rep)) =>
      s"regexp_replace($acc, '${pat.replace("'", "''")}', '$rep', 'g')"
    }
    s"trim($replaced)"
  }
}
