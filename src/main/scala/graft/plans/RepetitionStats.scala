package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass duplicate-n-gram counts for the Gopher/MassiveText
  * repetition filters (TextAnalysis.withRepetitionFeatures): total and
  * DISTINCT word 2-gram / 3-gram counts per document.
  *
  * The declarative formulation materializes every n-gram as a
  * `concat_ws` string and runs `array_distinct` over the UTF8String
  * arrays — measured 447 s over the 10M-doc pipeline corpus, almost all
  * of it allocation and interpreted per-element lambda evaluation. This
  * kernel interns tokens to dense int ids in one walk and counts
  * distinct n-grams as packed-long keys (trigrams via an interned
  * (id1,id2) pair id, so (pair, id3) stays injective — EXACT distinct
  * counting, no hash-collision approximation).
  *
  * Tokenization replicates `split(lower(trim(text)), "\\s+")` (Spark's
  * 2-arg split = Java regex, limit -1) bit-for-bit, because the t86 gate
  * is DuckDB-oracle-checked against that formula:
  *  - trim strips 0x20 only;
  *  - a leading non-space whitespace run yields a leading EMPTY token,
  *    a trailing run a trailing empty token (limit -1 keeps it);
  *  - an empty trimmed string yields ONE empty token;
  *  - n-grams join tokens with a single space — tokens never contain
  *    whitespace, so distinct joined strings ≡ distinct token tuples.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false),
    StructField("n_distinct_trigrams", LongType, nullable = false)))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  def compute(s: UTF8String): InternalRow = {
    // lower + trim via the same UTF8String ops Spark's lower/trim use
    val t = s.trim().toLowerCase.toString
    // tokenize with Java-split(-1) semantics without the regex engine
    val ids = new java.util.ArrayList[Integer]()
    val internMap = new java.util.HashMap[String, Integer]()
    def intern(tok: String): Integer = {
      var id = internMap.get(tok)
      if (id == null) { id = internMap.size(); internMap.put(tok, id) }
      id
    }
    if (t.isEmpty) ids.add(intern(""))
    else {
      var i = 0
      val n = t.length
      if (isWs(t.charAt(0))) ids.add(intern("")) // leading empty token
      while (i < n) {
        while (i < n && isWs(t.charAt(i))) i += 1
        if (i < n) {
          val start = i
          while (i < n && !isWs(t.charAt(i))) i += 1
          ids.add(intern(t.substring(start, i)))
        } else ids.add(intern("")) // trailing ws run: limit -1 keeps it
      }
    }
    val m = ids.size()
    var nBi = 0L; var dBi = 0L; var nTri = 0L; var dTri = 0L
    if (m >= 2) {
      nBi = (m - 1).toLong
      val biSet = new java.util.HashSet[java.lang.Long]()
      var i = 0
      while (i < m - 1) {
        biSet.add((ids.get(i).longValue() << 32) | ids.get(i + 1).longValue())
        i += 1
      }
      dBi = biSet.size().toLong
      if (m >= 3) {
        nTri = (m - 2).toLong
        val pairIds = new java.util.HashMap[java.lang.Long, Integer]()
        val triSet = new java.util.HashSet[java.lang.Long]()
        i = 0
        while (i < m - 2) {
          val pk: java.lang.Long = (ids.get(i).longValue() << 32) | ids.get(i + 1).longValue()
          var pid = pairIds.get(pk)
          if (pid == null) { pid = pairIds.size(); pairIds.put(pk, pid) }
          triSet.add((pid.longValue() << 32) | ids.get(i + 2).longValue())
          i += 1
        }
        dTri = triSet.size().toLong
      }
    }
    new GenericInternalRow(Array[Any](nBi, dBi, nTri, dTri))
  }
}
