package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Hex, Literal, OctetLength, SessionWindow, TimeWindow, Unhex}

/** SparkSessionExtensions for the SQL front end (SURVEY.md §7.3):
  *
  *  - Streaming-SQL windowing syntax: the reference's GROUP BY
  *    TUMBLE/HOP/SESSION(...) (BeamAggregationRule.java:121,
  *    BeamTableFunctionScanRel.java:116) becomes the SQL functions
  *    `tumble(ts, size)`, `hop(ts, slide, size)`, `session(ts, gap)` —
  *    thin aliases for Catalyst's native TimeWindow/SessionWindow
  *    expressions, so `GROUP BY tumble(ts, '1 hour')` plans identically
  *    to the DataFrame `window()` path (streaming-capable, AQE-friendly).
  *  - Reference extra-UDF names (impl/udf/BuiltinStringFunctions.java):
  *    TO_HEX / FROM_HEX / LENGTH_BYTES registered as aliases of the
  *    codegen'd builtin expressions.
  *
  * Install via `SparkSession.builder.withExtensions(GraftExtensions)` or
  * `Graft.install(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(tumble)
    e.injectFunction(hop)
    e.injectFunction(sessionFn)
    e.injectFunction(toHex)
    e.injectFunction(fromHex)
    e.injectFunction(lengthBytes)
    e.injectFunction(charNgramHashes)
    e.injectFunction(tdigestSketch)
    e.injectFunction(tdigestMerge)
    e.injectFunction(tdigestQuantile)
    // ZetaSQL-dialect delta (SAFE_ arithmetic, strftime parse/format,
    // GoogleSQL names) — see ZetaFunctions
    ZetaFunctions.all.foreach(e.injectFunction)
    e.injectTableFunction(seqgenTvf)
    // SQL MATCH_RECOGNIZE (reference BeamMatchRel.java:67): recognized by
    // a delegating parser and rewritten onto the graft.cep engine
    e.injectParser((session, delegate) => new MatchRecognizeParser(session, delegate))
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private val tumble = (FunctionIdentifier("tumble"),
    info("tumble", "tumble(ts, size) - fixed event-time window struct"),
    (args: Seq[Expression]) => new TimeWindow(args(0), args(1)))

  private val hop = (FunctionIdentifier("hop"),
    info("hop", "hop(ts, slide, size) - sliding event-time window struct"),
    (args: Seq[Expression]) => new TimeWindow(args(0), args(2), args(1)))

  private val sessionFn = (FunctionIdentifier("session"),
    info("session", "session(ts, gap) - gap-merged session window struct"),
    (args: Seq[Expression]) => new SessionWindow(args(0), args(1)))

  private val toHex = (FunctionIdentifier("to_hex"),
    info("to_hex", "to_hex(bytes) - hex encoding"),
    (args: Seq[Expression]) => Hex(args.head))

  private val fromHex = (FunctionIdentifier("from_hex"),
    info("from_hex", "from_hex(str) - hex decoding"),
    (args: Seq[Expression]) => Unhex(args.head))

  private val lengthBytes = (FunctionIdentifier("length_bytes"),
    info("length_bytes", "length_bytes(str) - byte length of UTF-8 encoding"),
    (args: Seq[Expression]) => OctetLength(args.head))

  private val charNgramHashes = (FunctionIdentifier("char_ngram_hashes"),
    info("char_ngram_hashes",
      "char_ngram_hashes(str, n) - distinct xxhash64 values of the char n-grams"),
    (args: Seq[Expression]) => CharNgramHashes(args(0), args(1) match {
      case Literal(i: Int, _) => i
      case other => throw new IllegalArgumentException(
        s"char_ngram_hashes: n must be an integer literal, got $other")
    }))

  private val tdigestSketch = (FunctionIdentifier("tdigest_sketch"),
    info("tdigest_sketch",
      "tdigest_sketch(col[, compression]) - mergeable t-digest quantile sketch (binary)"),
    (args: Seq[Expression]) => TDigestSketchAgg(args.head, args match {
      case Seq(_, Literal(d: Double, _)) => d
      case Seq(_, Literal(i: Int, _)) => i.toDouble
      case Seq(_) => 200.0
      case other => throw new IllegalArgumentException(
        s"tdigest_sketch: compression must be a numeric literal, got $other")
    }))

  private val tdigestMerge = (FunctionIdentifier("tdigest_merge"),
    info("tdigest_merge", "tdigest_merge(sketch) - merge serialized t-digests"),
    (args: Seq[Expression]) => TDigestMergeAgg(args.head))

  private val tdigestQuantile = (FunctionIdentifier("tdigest_quantile"),
    info("tdigest_quantile", "tdigest_quantile(sketch, q) - quantile estimate"),
    (args: Seq[Expression]) => TDigestQuantile(args(0), args(1)))

  /** Table-valued function over the graft-seqgen DSv2 source — the
    * reference's UDTF surface is table functions in the FROM clause
    * (BeamTableFunctionScanRel.java:116; GenerateSequence for bounded
    * sequences), and this registers one natively:
    * `SELECT * FROM graft_seqgen(count[, from])` plans as the same DSv2
    * relation the DataFrame path reads (splittable batch scan, pushdown
    * intact) — not a driver-materialized LocalRelation. */
  private val seqgenTvf = (FunctionIdentifier("graft_seqgen"),
    info("graft_seqgen",
      "graft_seqgen(count[, from]) - bounded event-sequence table (value, ts)"),
    (args: Seq[Expression]) => {
      def longArg(e: Expression, name: String): Long = e match {
        case Literal(v: Int, _) => v.toLong
        case Literal(v: Long, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_seqgen: $name must be an integer literal, got $other")
      }
      val count = longArg(args.head, "count")
      val from = if (args.length > 1) longArg(args(1), "from") else 0L
      val options = new java.util.HashMap[String, String]
      options.put("count", count.toString)
      options.put("from", from.toString)
      org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation.create(
        new graft.sources.seqgen.SeqGenTable,
        None, None,
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(options))
    })

  /** Register the same functions on an already-built session (extensions
    * normally apply at builder time; this covers driver-provided sessions). */
  def install(spark: SparkSession): Unit = {
    (Seq(tumble, hop, sessionFn, toHex, fromHex, lengthBytes, charNgramHashes,
      tdigestSketch, tdigestMerge, tdigestQuantile) ++ ZetaFunctions.all).foreach {
      case (ident, inf, builder) =>
        spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
    spark.sessionState.tableFunctionRegistry.registerFunction(
      seqgenTvf._1, seqgenTvf._2, seqgenTvf._3)
  }
}

/** `CREATE EXTERNAL TABLE name [(…)] TYPE fmt LOCATION 'path'` — the
  * reference's DDL (extensions/sql parserImpls.ftl:142-236) mapped onto
  * Spark's catalog. v1: regex-translated to a temp view over the native
  * reader (schema inferred from the source; declared columns ignored). */
object Ddl {
  private val CreateExt =
    """(?is)\s*CREATE\s+EXTERNAL\s+TABLE\s+(\w+)\s*(?:\(.*?\))?\s*TYPE\s+'?(\w+)'?\s+LOCATION\s+'([^']+)'\s*""".r

  def execute(spark: SparkSession, ddl: String): DataFrame = ddl match {
    case CreateExt(name, fmt, location) =>
      val reader = fmt.toLowerCase match {
        case "text" => spark.read.text(location)
        case other => spark.read.format(other).load(location)
      }
      reader.createOrReplaceTempView(name)
      spark.table(name)
    case _ =>
      throw new IllegalArgumentException(
        s"unsupported DDL (expected CREATE EXTERNAL TABLE … TYPE … LOCATION '…'): $ddl")
  }
}
