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
  *   [ONE ROW PER MATCH | ALL ROWS PER MATCH]
  *   [AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW | TO FIRST sym | TO LAST sym]
  *   PATTERN (S1[+*?] S2[+*?] ...)
  *   DEFINE S1 AS <predicate>, ...   -- current-row predicates; symbols
  * ) [AS alias] ...                  -- without DEFINE default to TRUE
  * }}}
  *
  * ONE ROW PER MATCH (default) emits partition columns + measures with
  * FINAL semantics; ALL ROWS PER MATCH emits every source column +
  * measures with RUNNING semantics (the standard's default there), and
  * CLASSIFIER() reports the matched row's symbol.
  *
  * DEFINE predicates may qualify columns with their own symbol name
  * (`P.event_type = 'purchase'`) and may navigate physically with
  * `PREV(col [, n])` / `NEXT(col [, n])` (SQL-standard physical
  * navigation over the partition's ORDER BY sequence, the semantics of
  * the reference's Calcite planner — impl/cep/CEPCall.java operators).
  * AFTER MATCH SKIP PAST LAST ROW (default) emits non-overlapping
  * matches; SKIP TO NEXT ROW resumes at the row after the match start —
  * overlapping (sliding) matches; SKIP TO FIRST/LAST <sym> resumes AT
  * the first/last row bound to <sym> (W-shapes sharing a peak), with the
  * standard's runtime errors when <sym> is absent from a match or the
  * resumption row is the match start. A DEFINE referencing ANOTHER
  * symbol's binding (`B AS B.price > A.price`) is not supported —
  * rejected with a clear error, never silently mis-executed.
  *
  * Execution: the clause is rewritten at parse time — the source relation
  * is hash-repartitioned ONCE on the partition key and sorted in-task by
  * (partition, order) keys; PREV/NEXT become lag/lead window columns whose
  * exchange+sort requirements are already satisfied (no second shuffle);
  * each DEFINE becomes one codegen'd boolean column (predicates run in the
  * scan stage); and a per-partition grouped scan runs the backtracking
  * matcher key-run by key-run, projecting the measures per match. The
  * rewritten query then parses normally with the match output standing in
  * for the clause, so arbitrary outer SELECT/JOIN/ORDER BY compose. At
  * 100 TB this is the same plan shape as any keyed stateful op: one hash
  * exchange + per-key work.
  *
  * The parse-time rewrite is LAZY: it builds the match DataFrame (pure
  * transformations) and registers it as a temp view without executing
  * anything, so `EXPLAIN` on a MATCH_RECOGNIZE query shows the full plan
  * — exchange, window columns, the grouped match scan — with zero
  * execution (runtime skip errors, e.g. a SKIP TO loop, accordingly
  * surface at materialization, not at parse). The residual caveat is
  * only that each clause occurrence registers a session temp view.
  */
object MatchRecognize {

  private[plans] final case class Clause(
      partitionCols: Seq[String], orderCols: Seq[String],
      measures: Seq[(Measure, String)],
      pattern: Seq[(String, Pattern.Quant)],
      defines: Seq[(String, String)],
      allRows: Boolean,
      skip: Pattern.Skip)

  private[plans] sealed trait Measure
  private case class First(sym: String, field: String) extends Measure
  private case class Last(sym: String, field: String) extends Measure
  private case class CountSym(sym: String) extends Measure // COUNT(S.*)
  private case object CountAll extends Measure             // COUNT(*)
  private case class PartCol(name: String) extends Measure
  private case object Classifier extends Measure           // CLASSIFIER()

  // `FROM <operand> MATCH_RECOGNIZE ( ... ) [AS? alias]`
  private val ClauseStart = "(?i)MATCH_RECOGNIZE\\s*\\(".r

  private val Sections =
    ("(?is)^\\s*PARTITION\\s+BY\\s+(.*?)\\s+ORDER\\s+BY\\s+(.*?)\\s+MEASURES\\s+(.*?)\\s+" +
      "(?:(ONE\\s+ROW|ALL\\s+ROWS)\\s+PER\\s+MATCH\\s+)?" +
      "(?:AFTER\\s+MATCH\\s+SKIP\\s+(PAST\\s+LAST\\s+ROW|TO\\s+NEXT\\s+ROW|TO\\s+(?:FIRST|LAST)\\s+\\w+)\\s+)?" +
      "PATTERN\\s*\\((.*?)\\)\\s*DEFINE\\s+(.*?)\\s*$").r

  private val MeasureFirst = "(?i)^FIRST\\s*\\(\\s*(\\w+)\\s*\\.\\s*(\\w+)\\s*\\)$".r
  private val MeasureLast = "(?i)^LAST\\s*\\(\\s*(\\w+)\\s*\\.\\s*(\\w+)\\s*\\)$".r
  private val MeasureCountSym = "(?i)^COUNT\\s*\\(\\s*(\\w+)\\s*\\.\\s*\\*\\s*\\)$".r
  private val MeasureCountAll = "(?i)^COUNT\\s*\\(\\s*\\*\\s*\\)$".r
  private val MeasureClassifier = "(?i)^CLASSIFIER\\s*\\(\\s*\\)$".r
  private val PatternSym = "(\\w+)([+*?]\\??|)".r

  /** True iff position `pos` falls inside a quoted SQL literal/identifier
    * or a comment. A real scanner (not quote-parity): tracks single- and
    * double-quoted strings, backtick identifiers, backslash escapes
    * (Spark's default non-ANSI mode escapes 'it\'s' as well as doubling),
    * `--` line comments and bracketed comments, so an escaped quote can't
    * flip the state and misclassify a genuine clause. */
  private def inLiteral(text: String, pos: Int): Boolean = {
    var i = 0
    var state = 0 // 0 plain, 1 '…', 2 "…", 3 `…`, 4 --…\n, 5 /*…*/
    while (i < pos) {
      val c = text.charAt(i)
      state match {
        case 0 =>
          if (c == '\'') state = 1
          else if (c == '"') state = 2
          else if (c == '`') state = 3
          else if (c == '-' && i + 1 < text.length && text.charAt(i + 1) == '-') { state = 4; i += 1 }
          else if (c == '/' && i + 1 < text.length && text.charAt(i + 1) == '*') { state = 5; i += 1 }
        case 1 | 2 =>
          val q = if (state == 1) '\'' else '"'
          if (c == '\\') i += 1 // skip escaped char
          else if (c == q) {
            if (i + 1 < text.length && text.charAt(i + 1) == q) i += 1 // doubled quote
            else state = 0
          }
        case 3 => if (c == '`') state = 0
        case 4 => if (c == '\n') state = 0
        case 5 => if (c == '*' && i + 1 < text.length && text.charAt(i + 1) == '/') { state = 0; i += 1 }
      }
      i += 1
    }
    state != 0
  }

  /** If `sqlText` contains a MATCH_RECOGNIZE clause (outside string
    * literals), execute it against the active session, register the match
    * output as a temp view, and return the query text with the clause
    * replaced by that view. Repeats until no clause remains, so a query
    * with several MATCH_RECOGNIZE clauses rewrites each of them. */
  def rewrite(spark: SparkSession, sqlText: String): Option[String] =
    ClauseStart.findAllMatchIn(sqlText)
      .find(m => !inLiteral(sqlText, m.start)).map { m =>
      val (body, afterClause) = balanced(sqlText, m.end - 1)
      val (source, beforeSource) = sourceOperand(sqlText, m.start)
      val clause = parseClause(body)
      val src =
        if (source.startsWith("(")) spark.sql(source.stripPrefix("(").stripSuffix(")"))
        else spark.table(source)
      val out = run(src, clause)
      val view = s"graft_match_recognize_${viewCounter.incrementAndGet()}"
      out.createOrReplaceTempView(view)
      // drop an optional `AS? alias` after the clause and alias the view
      val (alias, rest) = trailingAlias(afterClause)
      val once = beforeSource + view + alias.map(a => s" AS $a").getOrElse("") + rest
      rewrite(spark, once).getOrElse(once) // further clauses, if any
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
      "intersect", "except", "join", "inner", "left", "right", "full", "cross",
      "on", "window", "lateral", "sort", "cluster", "distribute", "semi",
      "anti", "natural", "using", "select", "from", "qualify")
    m match {
      case Some(mm) if !keywords.contains(mm.group(1).toLowerCase) =>
        (Some(mm.group(1)), rest.substring(mm.end))
      case _ => (None, rest)
    }
  }

  private[plans] def parseClause(body: String): Clause = body.trim match {
    case Sections(part, order, measures, rowsPerMatch, skipSpec, pattern, defines) =>
      val pat = PatternSym.findAllMatchIn(pattern).map { m =>
        val q = m.group(2) match {
          case "+" => Pattern.Plus
          case "*" => Pattern.Star
          case "?" => Pattern.Opt
          case "+?" => Pattern.PlusReluctant
          case "*?" => Pattern.StarReluctant
          case "??" => Pattern.OptReluctant
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
          case MeasureClassifier() => Classifier
          case c if partCols.exists(_.equalsIgnoreCase(c)) => PartCol(c)
          case other => throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: unsupported measure '$other' " +
              "(FIRST/LAST(sym.col), COUNT(sym.*), COUNT(*), CLASSIFIER(), or a partition column)")
        }
        (measure: Measure, name)
      }
      Clause(partCols, order.split(",").map(_.trim.replaceAll("(?i)\\s+ASC$", "")).toSeq,
        ms, pat, defs,
        allRows = rowsPerMatch != null && rowsPerMatch.toUpperCase.startsWith("ALL"),
        skip = Option(skipSpec).map(_.toUpperCase.replaceAll("\\s+", " ").trim) match {
          case Some("TO NEXT ROW") => Pattern.ToNextRow
          case Some(s) if s.startsWith("TO FIRST ") =>
            Pattern.ToFirstSym(s.stripPrefix("TO FIRST "))
          case Some(s) if s.startsWith("TO LAST ") =>
            Pattern.ToLastSym(s.stripPrefix("TO LAST "))
          case _ => Pattern.PastLastRow
        })
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

  /** Case-insensitive field resolution (spark.sql.caseSensitive=false
    * semantics, matching the rest of the SQL surface). */
  private def fieldIndexCI(schema: StructType, name: String): Int = {
    val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    if (i < 0) throw new IllegalArgumentException(
      s"MATCH_RECOGNIZE: column '$name' not found in ${schema.fieldNames.mkString(", ")}")
    i
  }

  /** A physical-navigation call in a DEFINE: PREV/NEXT of a source column
    * at `offset`, materialized as a lag/lead window column `genName`. */
  private case class Nav(isPrev: Boolean, offset: Int, column: String) {
    def genName: String = s"__nav_${if (isPrev) "prev" else "next"}_${offset}_${column.toLowerCase}"
  }

  private val NavCall = "(?i)\\b(PREV|NEXT)\\s*\\(".r
  private val NavArgs = "(?is)^\\s*(?:(\\w+)\\s*\\.\\s*)?(\\w+)\\s*(?:,\\s*(\\d+)\\s*)?$".r

  /** Rewrite PREV/NEXT calls in one DEFINE predicate to generated nav
    * column references, validating the subset (simple column operand,
    * optionally qualified by the defining symbol, optional int offset). */
  private def rewriteNav(sym: String, pred: String, schema: StructType,
      symNames: Seq[String]): (String, Seq[Nav]) = {
    val navs = Seq.newBuilder[Nav]
    var text = pred
    var m = NavCall.findFirstMatchIn(text)
    while (m.isDefined) {
      val mm = m.get
      val (inner, _) = balanced(text, mm.end - 1)
      inner match {
        case NavArgs(qual, column, off) =>
          if (qual != null && !qual.equalsIgnoreCase(sym))
            throw new IllegalArgumentException(
              s"MATCH_RECOGNIZE: DEFINE $sym navigates '$qual.$column' — PREV/NEXT may " +
                "only reference the defining symbol (physical navigation)")
          val offset = Option(off).map(_.toInt).getOrElse(1)
          val nav = Nav(mm.group(1).equalsIgnoreCase("PREV"), offset,
            schema.fieldNames(fieldIndexCI(schema, column)))
          navs += nav
          val close = mm.end + inner.length // balanced close paren position
          text = text.substring(0, mm.start) + nav.genName + text.substring(close + 1)
        case other => throw new IllegalArgumentException(
          s"MATCH_RECOGNIZE: unsupported ${mm.group(1).toUpperCase} operand '$other' " +
            "(only PREV/NEXT(col [, n]) over a source column is supported)")
      }
      m = NavCall.findFirstMatchIn(text)
    }
    (text, navs.result())
  }

  /** Execute the clause: PREV/NEXT as lag/lead columns and symbol
    * predicates as codegen'd boolean columns — all inside ONE hash
    * exchange on the partition key (the window's distribution and sort
    * requirements are pre-satisfied by repartition + sortWithinPartitions)
    * — then a per-partition grouped backtracking scan, one output row per
    * match. */
  private[plans] def run(src: DataFrame, c: Clause): DataFrame = {
    val srcSchema = src.schema
    val symNames = c.pattern.map(_._1).distinct
    val defMap = c.defines.toMap
    val allNavs = scala.collection.mutable.LinkedHashSet[Nav]()
    val rewritten: Map[String, String] = symNames.map { s =>
      val raw = defMap.getOrElse(s, "true")
      val (navFree, navs) = rewriteNav(s, raw, srcSchema, symNames)
      allNavs ++= navs
      // a qualifier of ANOTHER pattern symbol is a cross-symbol reference
      // (DEFINE B AS B.price > A.price) — out of subset, reject loudly
      // rather than silently binding both to the current row
      "\\b(\\w+)\\s*\\.".r.findAllMatchIn(navFree).foreach { q =>
        val qual = q.group(1)
        if (symNames.exists(_.equalsIgnoreCase(qual)) && !qual.equalsIgnoreCase(s))
          throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE: DEFINE $s references $qual's binding ('${q.matched}') — " +
              "cross-symbol references are not supported (use PREV/NEXT physical navigation)")
      }
      // strip the defining symbol's OWN qualifier only: `P.x` → `x`
      s -> ("(?i)\\b" + java.util.regex.Pattern.quote(s) + "\\s*\\.").r
        .replaceAllIn(navFree, "")
    }.toMap

    val partNames = c.partitionCols.map(p => srcSchema.fieldNames(fieldIndexCI(srcSchema, p)))
    val orderNames = c.orderCols.map(o => srcSchema.fieldNames(fieldIndexCI(srcSchema, o)))

    // One exchange: hash-repartition on the partition key, then an in-task
    // sort on (partition, order) — which also pre-satisfies the lag/lead
    // window's requirements, so PREV/NEXT add NO extra shuffle or sort.
    val partitioned = src
      .repartition(partNames.map(col): _*)
      .sortWithinPartitions((partNames ++ orderNames).map(col): _*)
    val withNav =
      if (allNavs.isEmpty) partitioned
      else {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(partNames.map(col): _*).orderBy(orderNames.map(col): _*)
        allNavs.foldLeft(partitioned) { (df, nav) =>
          val fn = if (nav.isPrev) org.apache.spark.sql.functions.lag(col(nav.column), nav.offset)
                   else org.apache.spark.sql.functions.lead(col(nav.column), nav.offset)
          df.withColumn(nav.genName, fn.over(w))
        }
      }
    val predCols = symNames.map(s =>
      expr(rewritten(s)).cast("boolean").as(s"__sym_$s"))
    val base = withNav.select(srcSchema.fieldNames.map(col).toSeq ++ predCols: _*)

    val n = srcSchema.length
    val symIdx = symNames.zipWithIndex.map { case (s, i) => s -> (n + i) }.toMap
    val partIdx = partNames.map(srcSchema.fieldIndex)
    // Output shape (standard): ONE ROW PER MATCH = PARTITION BY columns +
    // MEASURES; ALL ROWS PER MATCH = every source column + MEASURES, one
    // row per matched input row with RUNNING measure semantics.
    def srcField(f: String) = srcSchema(fieldIndexCI(srcSchema, f))
    val measureFields = c.measures.map {
      case (First(_, f), name) => StructField(name, srcField(f).dataType)
      case (Last(_, f), name) => StructField(name, srcField(f).dataType)
      case (CountSym(_), name) => StructField(name, LongType, nullable = false)
      case (CountAll, name) => StructField(name, LongType, nullable = false)
      case (Classifier, name) => StructField(name, org.apache.spark.sql.types.StringType)
      case (PartCol(p), name) => StructField(name, srcField(p).dataType)
    }
    val outSchema =
      if (c.allRows) StructType(srcSchema.fields.toSeq ++ measureFields)
      else StructType(partIdx.map(srcSchema(_)) ++ measureFields)
    val fieldIdx: Map[String, Int] =
      srcSchema.fieldNames.zipWithIndex.map { case (f, i) => f.toLowerCase -> i }.toMap
    val partPos: Map[String, Int] =
      c.partitionCols.zipWithIndex.map { case (p, i) => p.toLowerCase -> i }.toMap

    val pat = c.pattern.map { case (s, q) =>
      val i = symIdx(s)
      Pattern.Sym[Row](s, r => !r.isNullAt(i) && r.getBoolean(i), q)
    }.toIndexedSeq

    // Measure over the bindings PREFIX [0..upTo] — RUNNING semantics (the
    // standard's default in ALL ROWS PER MATCH); at upTo = last index this
    // is exactly the FINAL value ONE ROW PER MATCH reports.
    def measureValue(m: Measure, key: IndexedSeq[Any],
        mm: Pattern.Match[Row], upTo: Int): Any = m match {
      case First(s, f) =>
        mm.bindings.iterator.take(upTo + 1)
          .collectFirst { case (n2, r) if n2 == s => r.get(fieldIdx(f.toLowerCase)) }.orNull
      case Last(s, f) =>
        mm.bindings.take(upTo + 1).reverseIterator
          .collectFirst { case (n2, r) if n2 == s => r.get(fieldIdx(f.toLowerCase)) }.orNull
      case CountSym(s) => mm.bindings.iterator.take(upTo + 1).count(_._1 == s).toLong
      case CountAll => (upTo + 1).toLong
      case Classifier => mm.bindings(upTo)._1
      case PartCol(p) => key(partPos(p.toLowerCase))
    }
    val measures = c.measures
    val allRows = c.allRows
    val skipMode = c.skip

    // Grouped scan: rows arrive partition-clustered and (part, order)-
    // sorted, so each key's events are a contiguous sorted run — buffer
    // one run at a time (memory bound: max events per key, the bound every
    // MATCH_RECOGNIZE engine carries) and emit its matches.
    base.mapPartitions { rows =>
      new Iterator[Row] {
        private val in = rows.buffered
        private var pending: Iterator[Row] = Iterator.empty
        private def fill(): Unit =
          while (!pending.hasNext && in.hasNext) {
            val key: IndexedSeq[Any] = partIdx.map(in.head.get).toIndexedSeq
            val buf = scala.collection.mutable.ArrayBuffer[Row]()
            while (in.hasNext && partIdx.map(in.head.get).toIndexedSeq == key) buf += in.next()
            pending = Pattern.matchAll(buf.toIndexedSeq, pat, skipMode).iterator.flatMap { mm =>
              if (allRows)
                mm.bindings.indices.iterator.map { i =>
                  Row.fromSeq(mm.bindings(i)._2.toSeq.take(n) ++
                    measures.map { case (m, _) => measureValue(m, key, mm, i) })
                }
              else Iterator.single(Row.fromSeq(key ++ measures.map { case (m, _) =>
                measureValue(m, key, mm, mm.bindings.length - 1) }))
            }
          }
        override def hasNext: Boolean = { fill(); pending.hasNext }
        override def next(): Row = { fill(); pending.next() }
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
