package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text statistics for the training-data feature set
  * (quality scoring, language ID, token counting — TextAnalysis): all
  * counts the declarative formulation needs, in a single walk over the
  * string's code points instead of five interpreted split/filter/aggregate
  * lambda chains per document.
  *
  * Semantics replicate the declarative versions bit-for-bit (they are
  * DuckDB-oracle-checked):
  *  - tokens = Java-regex `split(trim(text), "\\s+", -1)` semantics: trim
  *    strips 0x20 only; a leading whitespace run yields one empty token;
  *    an empty trimmed string yields zero tokens.
  *  - lengths count code points, not bytes.
  *  - stopword/marker matching is case-insensitive ASCII (markers are
  *    ASCII words; a token containing non-ASCII can only match via exotic
  *    case-foldings like the Kelvin sign, which we ignore).
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("text_len", IntegerType, nullable = false),
    StructField("n_alnum_runs", IntegerType, nullable = false),
    StructField("m_de", IntegerType, nullable = false),
    StructField("m_en", IntegerType, nullable = false),
    StructField("m_es", IntegerType, nullable = false),
    StructField("m_fr", IntegerType, nullable = false),
    StructField("m_it", IntegerType, nullable = false)))

  private val stopwords = java.util.Set.of(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "that", "this", "it", "as")
  private val deM = java.util.Set.of("der", "die", "und", "das", "ist")
  private val enM = java.util.Set.of("the", "and", "of", "to", "is")
  private val esM = java.util.Set.of("el", "la", "de", "que", "los")
  private val frM = java.util.Set.of("le", "la", "et", "les", "des")
  private val itM = java.util.Set.of("il", "di", "che", "la", "per")

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
  private def isAlnum(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  def compute(s: UTF8String): InternalRow = {
    val nBytes = s.numBytes()
    // decode to code points once (ASCII fast path: bytes are code points)
    val ascii = nBytes == s.numChars()
    val cps: Array[Int] =
      if (ascii) null
      else s.toString.codePoints().toArray
    val len = if (ascii) nBytes else cps.length
    def cp(i: Int): Int = if (ascii) s.getByte(i) & 0xFF else cps(i)

    // trim 0x20 only (Spark/DuckDB trim semantics)
    var from = 0
    var until = len
    while (from < until && cp(from) == ' ') from += 1
    while (until > from && cp(until - 1) == ' ') until -= 1

    var nTokens = 0
    var sumTokenLen = 0L
    var nStop = 0
    var mDe = 0; var mEn = 0; var mEs = 0; var mFr = 0; var mIt = 0

    if (until > from) {
      // Java split(…, "\\s+", -1): leading separator run emits one empty
      // token; token boundaries at whitespace runs
      var i = from
      if (isWs(cp(i))) { nTokens += 1 } // leading empty token, length 0
      val tokBuf = new java.lang.StringBuilder(16)
      while (i < until) {
        while (i < until && isWs(cp(i))) i += 1
        if (i < until) {
          val start = i
          tokBuf.setLength(0)
          var asciiTok = true
          while (i < until && !isWs(cp(i))) {
            val c = cp(i)
            if (c < 128) {
              tokBuf.append(Character.toLowerCase(c.toChar))
            } else asciiTok = false
            i += 1
          }
          nTokens += 1
          sumTokenLen += (i - start)
          if (asciiTok && tokBuf.length() <= 4) {
            val tok = tokBuf.toString
            if (stopwords.contains(tok)) nStop += 1
            if (deM.contains(tok)) mDe += 1
            if (enM.contains(tok)) mEn += 1
            if (esM.contains(tok)) mEs += 1
            if (frM.contains(tok)) mFr += 1
            if (itM.contains(tok)) mIt += 1
          }
        } else {
          nTokens += 1 // trailing separator run: one trailing empty token
        }
      }
    }

    // punct / non-ws / alnum runs over the RAW text
    var nNonWs = 0
    var nPunct = 0
    var nRuns = 0
    var inRun = false
    var j = 0
    while (j < len) {
      val c = cp(j)
      if (!isWs(c)) {
        nNonWs += 1
        if (!isAlnum(c)) nPunct += 1
      }
      if (isAlnum(c)) {
        if (!inRun) { nRuns += 1; inRun = true }
      } else inRun = false
      j += 1
    }

    new GenericInternalRow(Array[Any](
      nTokens, sumTokenLen, nStop, nNonWs, nPunct, len, nRuns,
      mDe, mEn, mEs, mFr, mIt))
  }
}
