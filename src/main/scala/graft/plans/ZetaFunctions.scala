package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{BoolAnd, BoolOr, CountIf}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** The ZetaSQL-dialect function delta (reference
  * extensions/sql/zetasql/.../SupportedZetaSqlBuiltinFunctions.java): the
  * Calcite-standard surface is already covered by Spark's builtins; this
  * registers the GoogleSQL-NAMED functions and the handful with semantic
  * deltas, each as a thin composition of native codegen'd Catalyst
  * expressions (no UDFs, whole-stage codegen intact).
  *
  * Semantic deltas expressed here:
  *  - SAFE_ arithmetic (FN_SAFE_ADD_INT64 …): NULL instead of error — the
  *    try_* evaluation mode (TryAdd/TrySubtract/TryMultiply);
  *    SAFE_DIVIDE returns NULL on a zero divisor (plain Spark double
  *    division would return ±Inf/NaN).
  *  - IEEE_DIVIDE: the opposite choice, ±Inf/NaN instead of error — plain
  *    double division.
  *  - GENERATE_ARRAY returns an EMPTY array when the range and step
  *    disagree (Spark's sequence() auto-reverses the step).
  *  - PARSE_DATE/FORMAT_DATE/PARSE_TIMESTAMP/FORMAT_TIMESTAMP use
  *    strftime-style %-format strings, translated at plan time to the
  *    Java patterns the native expressions take (literal formats only).
  *  - TIMESTAMP_DIFF/ADD/SUB take the ZetaSQL argument order
  *    (TIMESTAMP_DIFF(later, earlier, unit) — unit as a string literal,
  *    the one adaptation SQL function syntax forces).
  *  - ARRAY_AT_OFFSET is 0-based, ORDINAL 1-based; the SAFE_ variants map
  *    to try_element_at. (Out-of-bounds yields NULL rather than an error —
  *    Spark's non-ANSI element_at — documented divergence for the
  *    non-SAFE forms.)
  *
  * Documented out of scope: BIGNUMERIC/NUMERIC overloads (Spark DECIMAL
  * covers via the same expressions), AEAD crypto, NET_*, proto/ST_
  * geography, FARM_FINGERPRINT (no Spark/DuckDB counterpart to verify
  * against), and TRUNC-with-digits (colliding with Spark's date trunc
  * builtin; round() covers the common use).
  */
object ZetaFunctions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def nullLit(dt: DataType) = Literal.create(null, dt)

  private def dbl(e: Expression) = Cast(e, DoubleType)

  /** strftime → java.time pattern translation for the %-directives the
    * reference's GoogleSQL dialect documents; literal text is quoted so
    * alphabetic characters can't be misread as pattern letters. */
  private[graft] def strftimeToJava(fmt: String): String = {
    val dir = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'e' -> "d",
      'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss", 'j' -> "DDD",
      'b' -> "MMM", 'B' -> "MMMM", 'a' -> "EEE", 'A' -> "EEEE",
      'p' -> "a", 'z' -> "xx", 'Z' -> "zzz", 'Q' -> "q",
      'F' -> "yyyy-MM-dd", 'T' -> "HH:mm:ss", 'R' -> "HH:mm")
    val out = new StringBuilder
    var i = 0
    def quoted(s: String): String =
      if (s.exists(_.isLetter)) "'" + s.replace("'", "''") + "'"
      else s.replace("'", "''")
    val lit = new StringBuilder
    def flush(): Unit = { if (lit.nonEmpty) { out ++= quoted(lit.toString); lit.clear() } }
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        val c = fmt(i + 1)
        if (c == '%') { lit += '%'; i += 2 }
        else dir.get(c) match {
          case Some(p) => flush(); out ++= p; i += 2
          case None => throw new IllegalArgumentException(
            s"unsupported strftime directive %$c in '$fmt'")
        }
      } else { lit += fmt(i); i += 1 }
    }
    flush()
    out.toString
  }

  private def fmtLit(e: Expression, fn: String): Literal = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
      Literal(strftimeToJava(s.toString))
    case other => throw new IllegalArgumentException(
      s"$fn: the format must be a string literal, got $other")
  }

  private def unitLit(e: Expression, fn: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: the unit must be a string literal ('SECOND'…'YEAR'), got $other")
  }

  type Fn = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** The registered delta, consumed by [[GraftExtensions]]. */
  val all: Seq[Fn] = Seq(
    (FunctionIdentifier("safe_divide"),
      info("safe_divide", "safe_divide(x, y) - NULL on zero divisor, else x/y as double"),
      (a: Seq[Expression]) =>
        // LEGACY eval: under the ANSI default, even the never-taken branch
        // must not be the erroring form at codegen time; semantics for a
        // non-zero divisor are identical in every mode
        If(EqualTo(dbl(a(1)), Literal(0.0)), nullLit(DoubleType),
          Divide(dbl(a(0)), dbl(a(1)), EvalMode.LEGACY))),
    (FunctionIdentifier("safe_add"),
      info("safe_add", "safe_add(x, y) - NULL on overflow instead of error"),
      (a: Seq[Expression]) => new TryAdd(a(0), a(1))),
    (FunctionIdentifier("safe_subtract"),
      info("safe_subtract", "safe_subtract(x, y) - NULL on overflow instead of error"),
      (a: Seq[Expression]) => new TrySubtract(a(0), a(1))),
    (FunctionIdentifier("safe_multiply"),
      info("safe_multiply", "safe_multiply(x, y) - NULL on overflow instead of error"),
      (a: Seq[Expression]) => new TryMultiply(a(0), a(1))),
    (FunctionIdentifier("safe_negate"),
      info("safe_negate", "safe_negate(x) - NULL on overflow (e.g. -MIN_INT64)"),
      (a: Seq[Expression]) => new TrySubtract(Literal(0L), a(0))),
    (FunctionIdentifier("ieee_divide"),
      info("ieee_divide", "ieee_divide(x, y) - double division, ±Inf/NaN on zero divisor"),
      // Spark SQL has no IEEE division in ANY eval mode (ANSI errors,
      // LEGACY yields NULL), so the ±Inf/NaN cases are constructed: x/±0
      // → sign(x)·Inf, 0/0 and NaN/0 → NaN. (The sign of a negative zero
      // divisor is not honored — both zeros route to sign(x)·(+Inf).)
      (a: Seq[Expression]) => {
        val ad = dbl(a(0)); val bd = dbl(a(1))
        If(EqualTo(bd, Literal(0.0)),
          CaseWhen(Seq(
            (IsNull(ad), nullLit(DoubleType)),
            (IsNaN(ad), Literal(Double.NaN)),
            (EqualTo(ad, Literal(0.0)), Literal(Double.NaN)),
            (GreaterThan(ad, Literal(0.0)), Literal(Double.PositiveInfinity))),
            Literal(Double.NegativeInfinity)),
          Divide(ad, bd, EvalMode.LEGACY))
      }),
    (FunctionIdentifier("is_inf"),
      info("is_inf", "is_inf(x) - true when x is ±Infinity"),
      (a: Seq[Expression]) => EqualTo(Abs(dbl(a(0))), Literal(Double.PositiveInfinity))),
    (FunctionIdentifier("logical_and"),
      info("logical_and", "logical_and(bool) - aggregate AND over non-NULL inputs"),
      (a: Seq[Expression]) => BoolAnd(a.head).toAggregateExpression()),
    (FunctionIdentifier("logical_or"),
      info("logical_or", "logical_or(bool) - aggregate OR over non-NULL inputs"),
      (a: Seq[Expression]) => BoolOr(a.head).toAggregateExpression()),
    (FunctionIdentifier("countif"),
      info("countif", "countif(cond) - count of rows where cond is true"),
      (a: Seq[Expression]) => CountIf(a.head).toAggregateExpression()),
    (FunctionIdentifier("format"),
      info("format", "format(fmt, args...) - printf-style formatting"),
      (a: Seq[Expression]) => FormatString(a: _*)),
    (FunctionIdentifier("generate_array"),
      info("generate_array",
        "generate_array(a, b[, step]) - inclusive range; EMPTY when range and step disagree"),
      (a: Seq[Expression]) => {
        val step = if (a.length > 2) a(2) else Literal(1L)
        val empty = Literal.create(Array.empty[Long], org.apache.spark.sql.types.ArrayType(LongType))
        val stepL = Cast(step, LongType)
        val wrongWay = Or(
          And(GreaterThan(stepL, Literal(0L)), GreaterThan(Cast(a(0), LongType), Cast(a(1), LongType))),
          And(LessThan(stepL, Literal(0L)), LessThan(Cast(a(0), LongType), Cast(a(1), LongType))))
        If(wrongWay, empty, new Sequence(Cast(a(0), LongType), Cast(a(1), LongType), stepL))
      }),
    (FunctionIdentifier("generate_date_array"),
      info("generate_date_array", "generate_date_array(d1, d2) - inclusive day sequence"),
      (a: Seq[Expression]) => new Sequence(a(0), a(1))),
    (FunctionIdentifier("parse_date"),
      info("parse_date", "parse_date('%Y-%m-%d', s) - strftime-format date parse"),
      (a: Seq[Expression]) => new ParseToDate(a(1), fmtLit(a(0), "parse_date"))),
    (FunctionIdentifier("format_date"),
      info("format_date", "format_date('%Y-%m-%d', d) - strftime-format date render"),
      (a: Seq[Expression]) => DateFormatClass(a(1), fmtLit(a(0), "format_date"))),
    (FunctionIdentifier("parse_timestamp"),
      info("parse_timestamp", "parse_timestamp('%Y-%m-%d %H:%M:%S', s) - strftime parse"),
      (a: Seq[Expression]) => new ParseToTimestamp(a(1), fmtLit(a(0), "parse_timestamp"))),
    (FunctionIdentifier("format_timestamp"),
      info("format_timestamp", "format_timestamp('%Y-%m-%d', ts) - strftime render"),
      (a: Seq[Expression]) => DateFormatClass(a(1), fmtLit(a(0), "format_timestamp"))),
    (FunctionIdentifier("timestamp_diff"),
      info("timestamp_diff",
        "timestamp_diff(later, earlier, 'HOUR') - whole units between (ZetaSQL arg order)"),
      (a: Seq[Expression]) =>
        new TimestampDiff(unitLit(a(2), "timestamp_diff"), a(1), a(0))),
    (FunctionIdentifier("timestamp_add"),
      info("timestamp_add", "timestamp_add(ts, n, 'HOUR') - add n units"),
      (a: Seq[Expression]) =>
        new TimestampAdd(unitLit(a(2), "timestamp_add"), a(1), a(0))),
    (FunctionIdentifier("timestamp_sub"),
      info("timestamp_sub", "timestamp_sub(ts, n, 'HOUR') - subtract n units"),
      (a: Seq[Expression]) =>
        new TimestampAdd(unitLit(a(2), "timestamp_sub"), UnaryMinus(a(1)), a(0))),
    (FunctionIdentifier("array_at_offset"),
      info("array_at_offset", "array_at_offset(arr, i) - 0-based element (NULL out of bounds)"),
      (a: Seq[Expression]) => ElementAt(a(0), Add(a(1), Literal(1)))),
    (FunctionIdentifier("array_at_ordinal"),
      info("array_at_ordinal", "array_at_ordinal(arr, i) - 1-based element (NULL out of bounds)"),
      (a: Seq[Expression]) => ElementAt(a(0), a(1))),
    (FunctionIdentifier("approx_quantiles"),
      info("approx_quantiles",
        "approx_quantiles(x, n) - n+1 approximate split points (min … max), ZetaSQL shape"),
      (a: Seq[Expression]) => {
        val n = a(1) match {
          case Literal(i: Int, _) if i >= 1 => i
          case other => throw new IllegalArgumentException(
            s"approx_quantiles: n must be a positive integer literal, got $other")
        }
        val pts = (0 to n).map(i => Literal(i.toDouble / n))
        new org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile(
          a(0), CreateArray(pts)).toAggregateExpression()
      }),
    (FunctionIdentifier("safe_array_at_offset"),
      info("safe_array_at_offset", "safe_array_at_offset(arr, i) - 0-based, NULL out of bounds"),
      // try_element_at still ERRORS on index 0 (INVALID_INDEX_OF_ZERO), so
      // a negative offset must short-circuit to NULL before the +1 shift
      (a: Seq[Expression]) => If(LessThan(a(1), Literal(0)),
        Literal.create(null, org.apache.spark.sql.types.NullType),
        new TryElementAt(a(0), Add(a(1), Literal(1))))),
    (FunctionIdentifier("safe_array_at_ordinal"),
      info("safe_array_at_ordinal", "safe_array_at_ordinal(arr, i) - 1-based, NULL out of bounds"),
      (a: Seq[Expression]) => If(LessThanOrEqual(a(1), Literal(0)),
        Literal.create(null, org.apache.spark.sql.types.NullType),
        new TryElementAt(a(0), a(1)))))
}
