package graft.plans

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.cep.Pattern

/** SQL MATCH_RECOGNIZE (reference extensions/sql impl/rel/BeamMatchRel
  * .java:67, parsed by Calcite's standard grammar) for Spark SQL, which
  * has no native row-pattern clause.
  *
  * Supported subset — the linear patterns the reference's CEP tests
  * exercise (impl/cep/, nfa/NFATest.java), matching [[graft.cep.Pattern]]:
  *
  * {{{
  * SELECT ... FROM <table | (subquery)> MATCH_RECOGNIZE (
  *   PARTITION BY c1 [, c2 ...]
  *   ORDER BY c1 [, c2 ...]          -- ASC only
  *   MEASURES m1 AS a1 [, ...]       -- FIRST(S.c) | LAST(S.c) |
  *                                   -- COUNT(S.*) | COUNT(*) | partition col
  *   [ONE ROW PER MATCH]
  *   [AFTER MATCH SKIP PAST LAST ROW]
  *   PATTERN (S1[+*?] S2[+*?] ...)
  *   DEFINE S1 AS <predicate>, ...   -- current-row predicates; symbols
  * ) [AS alias] ...                  -- without DEFINE default to TRUE
  * }}}
  *
  * DEFINE predicates may qualify columns with their own symbol name
  * (`P.event_type = 'purchase'`); PREV/NEXT navigation and ALL ROWS PER
  * MATCH are not supported (rejected with a clear error).
  *
  * Execution: the clause is rewritten at parse time — the source relation
  * gets one codegen'd boolean column per DEFINE symbol (predicates run in
  * the scan stage), rows shuffle ONCE on the partition key, each key's
  * rows are sorted in-task and scanned by the backtracking matcher, and
  * the measures project per match. The rewritten query then parses
  * normally with the match output standing in for the clause, so arbitrary
  * outer SELECT/JOIN/ORDER BY compose. At 100 TB this is the same plan
  * shape as any keyed stateful op: one hash exchange + per-key work.
  */
object MatchRecognize {

  private[plans] final case class Clause(
      partitionCols: Seq[String], orderCols: Seq[String],
      measures: Seq[(Measure, String)],
      pattern: Seq[(String, Pattern.Quant)],
      defines: Seq[(String, String)])

  private[plans] sealed trait Measure
  private case class First(sym: String, field: String) extends Measure
  private case class Last(sym: String, field: String) extends Measure
  private case class CountSym(sym: String) extends Measure // COUNT(S.*)
  private case object CountAll extends Measure             // COUNT(*)
  private case class PartCol(name: String) extends Measure

  // `FROM <operand> MATCH_RECOGNIZE ( ... ) [AS? alias]`
  private val ClauseStart = "(?i)MATCH_RECOGNIZE\\s*\\(".r

  private val Sections =
    ("(?is)^\\s*PARTITION\\s+BY\\s+(.*?)\\s+ORDER\\s+BY\\s+(.*?)\\s+MEASURES\\s+(.*?)\\s+" +
      "(?:ONE\\s+ROW\\s+PER\\s+MATCH\\s+)?(?:AFTER\\s+MATCH\\s+SKIP\\s+PAST\\s+LAST\\s+ROW\\s+)?" +
      "PATTERN\\s*\\((.*?)\\)\\s*DEFINE\\s+(.*?)\\s*$").r

  private val MeasureFirst = "(?i)^FIRST\\s*\\(\\s*(\\w+)\\s*\\.\\s*(\\w+)\\s*\\)$".r
  private val MeasureLast = "(?i)^LAST\\s*\\(\\s*(\\w+)\\s*\\.\\s*(\\w+)\\s*\\)$".r
  private val MeasureCountSym = "(?i)^COUNT\\s*\\(\\s*(\\w+)\\s*\\.\\s*\\*\\s*\\)$".r
  private val MeasureCountAll = "(?i)^COUNT\\s*\\(\\s*\\*\\s*\\)$".r
  private val PatternSym = "(\\w+)([+*?]?)".r

  /** If `sqlText` contains a MATCH_RECOGNIZE clause, execute it against
    * the active session, register the match output as a temp view, and
    * return the query text with the clause replaced by that view. */
  def rewrite(spark: SparkSession, sqlText: String): Option[String] =
    ClauseStart.findFirstMatchIn(sqlText).map { m =>
      val (body, afterClause) = balanced(sqlText, m.end - 1)
      val (source, beforeSource) = sourceOperand(sqlText, m.start)
      val clause = parseClause(body)
      // reject out-of-subset constructs loudly rather than mis-executing
      if ("(?i)ALL\\s+ROWS\\s+PER\\s+MATCH".r.findFirstIn(body).isDefined)
        throw new IllegalArgumentException(
          "MATCH_RECOGNIZE: ALL ROWS PER MATCH is not supported (ONE ROW PER MATCH only)")
      if ("(?i)SKIP\\s+TO".r.findFirstIn(body).isDefined)
        throw new IllegalArgumentException(
          "MATCH_RECOGNIZE: only AFTER MATCH SKIP PAST LAST ROW is supported")
      val src =
        if (source.startsWith("(")) spark.sql(source.stripPrefix("(").stripSuffix(")"))
        else spark.table(source)
      val out = run(src, clause)
      val view = s"graft_match_recognize_${viewCounter.incrementAndGet()}"
      out.createOrReplaceTempView(view)
      // drop an optional `AS? alias` after the clause and alias the view
      val (alias, rest) = trailingAlias(afterClause)
      beforeSource + view + alias.map(a => s" AS $a").getOrElse("") + rest
    }

  private val viewCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Text of the balanced (...) starting at `open`, exclusive of parens,
    * plus the remainder after the closing paren. */
  private def balanced(text: String, open: Int): (String, String) = {
    var depth = 0; var i = open
    while (i < text.length) {
      text.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return (text.substring(open + 1, i), text.substring(i + 1))
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("MATCH_RECOGNIZE: unbalanced parentheses")
  }

  /** The FROM operand immediately preceding the clause — a (possibly
    * qualified) table name or a parenthesized subquery — plus the query
    * text before it. */
  private def sourceOperand(text: String, clauseStart: Int): (String, String) = {
    var end = clauseStart - 1
    while (end >= 0 && text.charAt(end).isWhitespace) end -= 1
    require(end >= 0, "MATCH_RECOGNIZE: no source relation before the clause")
    if (text.charAt(end) == ')') { // (subquery): balance backward
      var depth = 0; var i = end
      while (i >= 0) {
        text.charAt(i) match {
          case ')' => depth += 1
          case '(' =>
            depth -= 1
            if (depth == 0) return (text.substring(i, end + 1), text.substring(0, i))
          case _ =>
        }
        i -= 1
      }
      throw new IllegalArgumentException("MATCH_RECOGNIZE: unbalanced subquery parens")
    } else { // identifier token (allow dots for qualified names)
      var i = end
      while (i >= 0 && (text.charAt(i).isLetterOrDigit || "._`".contains(text.charAt(i)))) i -= 1
      (text.substring(i + 1, end + 1), text.substring(0, i + 1))
    }
  }

  /** An optional `AS? alias` directly after the clause. */
  private def trailingAlias(rest: String): (Option[String], String) = {
    val m = "(?is)^\\s+(?:AS\\s+)?([a-zA-Z_]\\w*)".r.findFirstMatchIn(rest)
    // don't eat keywords that legally follow a FROM operand
    val keywords = Set("where", "group", "order", "limit", "having", "union",
      "intersect", "except", "join", "inner", "left", "right", "full", "cross", "on")
    m match {
      case Some(mm) if !keywords.contains(mm.group(1).toLowerCase) =>
        (Some(mm.group(1)), rest.substring(mm.end))
      case _ => (None, rest)
    }
  }

  private[plans] def parseClause(body: String): Clause = body.trim match {
    case Sections(part, order, measures, pattern, defines) =>
      val pat = PatternSym.findAllMatchIn(pattern).map { m =>
        val q = m.group(2) match {
          case "+" => Pattern.Plus
          case "*" => Pattern.Star
          case "?" => Pattern.Opt
          case _ => Pattern.One
        }
        (m.group(1).toUpperCase, q: Pattern.Quant)
      }.toSeq
      require(pat.nonEmpty, "MATCH_RECOGNIZE: empty PATTERN")
      val partCols = part.split(",").map(_.trim).toSeq
      val defs = splitTopLevel(defines).map { d =>
        val i = "(?i)\\s+AS\\s+".r.findFirstMatchIn(d).getOrElse(
          throw new IllegalArgumentException(s"MATCH_RECOGNIZE: DEFINE needs 'sym AS pred': $d"))
        (d.substring(0, i.start).trim.toUpperCase, d.substring(i.end).trim)
      }
      val ms = splitTopLevel(measures).map { m =>
        val i = "(?i)\\s+AS\\s+".r.findFirstMatchIn(m).getOrElse(
          throw new IllegalArgumentException(s"MATCH_RECOGNIZE: MEASURES needs 'expr AS name': $m"))
        val (e, name) = (m.substring(0, i.start).trim, m.substring(i.end).trim)
        val measure = e match {
          case MeasureFirst(s, f) => First(s.toUpperCase, f)
          case MeasureLast(s, f) => Last(s.toUpperCase, f)
          case MeasureCountSym(s) => CountSym(s.toUpperCase)
          case MeasureCountAll() => CountAll
          case c if partCols.exists(_.equalsIgnoreCase(c)) => PartCol(c)
          case other => throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: unsupported measure '$other' " +
              "(FIRST/LAST(sym.col), COUNT(sym.*), COUNT(*), or a partition column)")
        }
        (measure: Measure, name)
      }
      Clause(partCols, order.split(",").map(_.trim.replaceAll("(?i)\\s+ASC$", "")).toSeq,
        ms, pat, defs)
    case other => throw new IllegalArgumentException(
      s"MATCH_RECOGNIZE: expected PARTITION BY ... ORDER BY ... MEASURES ... " +
        s"PATTERN (...) DEFINE ..., got: $other")
  }

  /** Split on commas not nested inside parentheses or quotes. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQuote = false; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inQuote = !inQuote
        case '(' if !inQuote => depth += 1
        case ')' if !inQuote => depth -= 1
        case ',' if !inQuote && depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start).trim
    out.result().filter(_.nonEmpty)
  }

  /** Execute the clause: symbol predicates as codegen'd boolean columns,
    * one shuffle on the partition key, in-task sort + backtracking scan,
    * one output row per match. */
  private[plans] def run(src: DataFrame, c: Clause): DataFrame = {
    val srcSchema = src.schema
    val symNames = c.pattern.map(_._1).distinct
    // strip own-symbol qualifiers: `P.event_type` → `event_type`
    val symPrefix = ("(?i)\\b(" + symNames.mkString("|") + ")\\s*\\.").r
    val defMap = c.defines.toMap
    val predCols = symNames.map { s =>
      val pred = defMap.getOrElse(s, "true")
      expr(symPrefix.replaceAllIn(pred, "")).cast("boolean").as(s"__sym_$s")
    }
    val base = src.select(srcSchema.fieldNames.map(col).toSeq ++ predCols: _*)

    val n = srcSchema.length
    val symIdx = symNames.zipWithIndex.map { case (s, i) => s -> (n + i) }.toMap
    val partIdx = c.partitionCols.map(srcSchema.fieldIndex)
    val orderIdx = c.orderCols.map(srcSchema.fieldIndex)
    val keySchema = StructType(partIdx.map(srcSchema(_)))
    // ONE ROW PER MATCH output = PARTITION BY columns + MEASURES (standard)
    val outSchema = StructType(
      partIdx.map(srcSchema(_)) ++ c.measures.map {
        case (First(_, f), name) => StructField(name, srcSchema(f).dataType)
        case (Last(_, f), name) => StructField(name, srcSchema(f).dataType)
        case (CountSym(_), name) => StructField(name, LongType, nullable = false)
        case (CountAll, name) => StructField(name, LongType, nullable = false)
        case (PartCol(p), name) => StructField(name, srcSchema(srcSchema.fieldIndex(p)).dataType)
      })
    val fieldIdx: Map[String, Int] = srcSchema.fieldNames.zipWithIndex.toMap
    val partPos: Map[String, Int] =
      c.partitionCols.zipWithIndex.map { case (p, i) => p.toLowerCase -> i }.toMap

    val pat = c.pattern.map { case (s, q) =>
      val i = symIdx(s)
      Pattern.Sym[Row](s, r => !r.isNullAt(i) && r.getBoolean(i), q)
    }.toIndexedSeq

    // ORDER BY comparison: natural per-column ordering, nulls first (ASC)
    val ordering: Ordering[Row] = (a: Row, b: Row) => {
      var cmp = 0; var i = 0
      while (cmp == 0 && i < orderIdx.length) {
        val (x, y) = (a.get(orderIdx(i)), b.get(orderIdx(i)))
        cmp =
          if (x == null && y == null) 0
          else if (x == null) -1
          else if (y == null) 1
          else x.asInstanceOf[Comparable[Any]].compareTo(y)
        i += 1
      }
      cmp
    }

    def measureValue(m: Measure, key: Row, mm: Pattern.Match[Row]): Any = m match {
      case First(s, f) =>
        mm.bindings.collectFirst { case (n2, r) if n2 == s => r.get(fieldIdx(f)) }.orNull
      case Last(s, f) =>
        mm.bindings.reverseIterator.collectFirst { case (n2, r) if n2 == s => r.get(fieldIdx(f)) }.orNull
      case CountSym(s) => mm.bindings.count(_._1 == s).toLong
      case CountAll => mm.bindings.length.toLong
      case PartCol(p) => key.get(partPos(p.toLowerCase))
    }

    base.groupByKey(r => Row.fromSeq(partIdx.map(r.get)))(Encoders.row(keySchema))
      .flatMapGroups { (key: Row, it: Iterator[Row]) =>
        val evs = it.toIndexedSeq.sorted(ordering)
        Pattern.matchAll(evs, pat).iterator.map { mm =>
          Row.fromSeq(key.toSeq ++
            c.measures.map { case (m, _) => measureValue(m, key, mm) })
        }
      }(Encoders.row(outSchema))
  }
}

/** Session parser that recognizes the MATCH_RECOGNIZE clause and rewrites
  * it through [[MatchRecognize]]; everything else delegates verbatim.
  * Installed by [[GraftExtensions]] via injectParser. */
class MatchRecognizeParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def maybeRewrite(sqlText: String): String =
    if ("(?i)MATCH_RECOGNIZE".r.findFirstIn(sqlText).isDefined)
      MatchRecognize.rewrite(spark, sqlText).getOrElse(sqlText)
    else sqlText

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(maybeRewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(maybeRewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
