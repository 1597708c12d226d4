package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the reference's month-bucket predicate
  *
  *   `concat_ws('-', month(d), year(d)) = 'M-YYYY'`
  *   (↔ `preprocess_and_store_parquets.py:102`)
  *
  * into the sargable range `d >= first-of-month AND d < first-of-next-month`.
  *
  * The derived-expression form defeats parquet min/max row-group pruning —
  * every month pass re-scans the whole fact table (the scale-killer flagged
  * in round 1). With this rule, user code written in the reference's
  * faithful style gets partition/row-group pruning automatically; the scan
  * shows the pushed date bounds in `PushedFilters`.
  *
  * Semantics preserved exactly — in EVERY boolean context:
  *   - NULL date: original → concat_ws skips NULLs → `'' = 'M-YYYY'` →
  *     false (not NULL). A bare range `NULL >= lo` would be NULL — same
  *     rows under a top-level Filter but DIFFERENT rows under NOT(...)
  *     (false negates to kept, NULL stays dropped). The rewrite therefore
  *     emits `IsNotNull(d) AND lo <= d < hi`, which is false for NULL
  *     dates exactly like the original, so the rule is sound anywhere in
  *     the condition tree, including under Not.
  *   - Only fires when the literal parses as an unpadded `M-YYYY` bucket
  *     (the reference's `MONTH()` rendering); zero-padded or malformed
  *     literals — which can never equal an unpadded concat — fold to false.
  *   - `month(ts)` arrives as `Month(Cast(ts, DateType))`; the range is
  *     emitted against the UNDERLYING timestamp column (session TZ is
  *     pinned UTC) so the comparison reaches the scan uncast.
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`).
  */
object SargableMonthRule extends Rule[LogicalPlan] {

  private val Bucket = "^(1[0-2]|[1-9])-(\\d{4})$".r

  /** The analyzer wraps month()/year() (ints) in an implicit string cast
    * inside concat_ws — unwrap it.
    */
  private object StrCast {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(child, StringType, _, _) => Some(child)
      case other => Some(other)
    }
  }

  /** Extract (underlying column expr, lo, hi literals) if `concat` is the
    * month-bucket shape over a date/timestamp expression.
    */
  private def rangeFor(concat: Expression, bucket: String): Option[(Expression, Literal, Literal)] =
    (concat, bucket) match {
      case (ConcatWs(Seq(Literal(sep: UTF8String, _), StrCast(Month(m)), StrCast(Year(y)))), Bucket(mm, yyyy))
          if sep.toString == "-" && m.semanticEquals(y) =>
        val lo = java.time.LocalDate.of(yyyy.toInt, mm.toInt, 1)
        val hi = lo.plusMonths(1)
        // UTC midnight in micros; valid for NTZ always, and for TZ'd
        // timestamps exactly when the session clock is UTC (this engine
        // pins it; guarded anyway).
        def microsLit(x: java.time.LocalDate, t: org.apache.spark.sql.types.DataType) =
          Literal(x.toEpochDay * 86400L * 1000000L, t)
        m match {
          case Cast(ts, DateType, _, _)
              if ts.dataType == TimestampNTZType ||
                (ts.dataType == TimestampType && conf.sessionLocalTimeZone == "UTC") =>
            Some((ts, microsLit(lo, ts.dataType), microsLit(hi, ts.dataType)))
          case d if d.dataType == DateType =>
            def dLit(x: java.time.LocalDate) = Literal(x.toEpochDay.toInt, DateType)
            Some((d, dLit(lo), dLit(hi)))
          case _ => None
        }
      case _ => None
    }

  private def rewrite(e: Expression): Expression = e match {
    case eq @ EqualTo(concat: ConcatWs, Literal(b: UTF8String, _)) =>
      rangeFor(concat, b.toString)
        .map { case (col, lo, hi) =>
          And(IsNotNull(col), And(GreaterThanOrEqual(col, lo), LessThan(col, hi))) }
        .getOrElse(eq)
    case eq @ EqualTo(Literal(b: UTF8String, _), concat: ConcatWs) =>
      rangeFor(concat, b.toString)
        .map { case (col, lo, hi) =>
          And(IsNotNull(col), And(GreaterThanOrEqual(col, lo), LessThan(col, hi))) }
        .getOrElse(eq)
    case other => other.mapChildren(rewrite)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = rewrite(cond)
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}
