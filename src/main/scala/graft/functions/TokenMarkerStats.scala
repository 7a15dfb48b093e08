package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics for the text-analysis queries: whitespace
  * token count, non-space char count, BPE-ish regex piece count, and
  * marker-vocabulary hits (en/es/de/fr language markers + stopwords).
  *
  * Replaces five interpreted higher-order `filter(tokens, isin)` /
  * `size(split(...))` chains with a single codegen'd scan. Each field is
  * defined to be value-identical to the built-in spelling the oracle SQL
  * uses:
  *  - ws_tokens  = len(string_split(norm,' '))   (empty text ⇒ 1 — split
  *                 of '' yields [''])
  *  - alpha_len  = length(replace(norm,' ',''))
  *  - re_tokens  = regexp_count(norm,'[a-z0-9]+|[^a-z0-9 ]')
  *  - en/es/de/fr/stop = marker-token occurrence counts
  * where norm = trim(regexp_replace(lower(text),'\s+',' ')).
  */
case class TokenMarkerStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_marker_stats needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = TokenMarkerStats.schema

  override def prettyName: String = "token_marker_stats"

  override protected def nullSafeEval(input: Any): Any =
    TokenMarkerStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenMarkerStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenMarkerStats =
    copy(child = newChild)
}

object TokenMarkerStats {

  val schema: StructType = StructType(Seq(
    "ws_tokens", "alpha_len", "re_tokens", "en", "es", "de", "fr", "stop")
    .map(StructField(_, LongType, nullable = false)))

  private def toSet(words: Seq[String]) = {
    val s = new java.util.HashSet[String]()
    words.foreach(s.add)
    s
  }
  // vocabularies fixed in graft.ops.Text — single source of truth
  private lazy val markerSets: Array[java.util.HashSet[String]] =
    graft.ops.Text.langMarkers.map(m => toSet(m._2)).toArray
  private lazy val stopSet = toSet(graft.ops.Text.stopwords)

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val text = s.toLowerCase.toString
    var ws = 0L; var alpha = 0L; var re = 0L
    val marks = new Array[Long](markerSets.length)
    var stop = 0L
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      var inRun = false
      while (i < len && !isWs(text.charAt(i))) {
        val c = text.charAt(i)
        if (isAlnum(c)) { if (!inRun) { re += 1; inRun = true } }
        else { re += 1; inRun = false }
        i += 1
      }
      if (i > start) {
        ws += 1
        alpha += i - start
        val tok = text.substring(start, i)
        var m = 0
        while (m < marks.length) {
          if (markerSets(m).contains(tok)) marks(m) += 1
          m += 1
        }
        if (stopSet.contains(tok)) stop += 1
      }
    }
    // split('') yields [''] — one empty token, zero chars
    if (ws == 0L) ws = 1L
    new GenericInternalRow(Array[Any](ws, alpha, re,
      marks(0), marks(1), marks(2), marks(3), stop))
  }

  /** Column-API entry point. */
  def apply(text: Column): Column =
    GraftBridge.column(TokenMarkerStats(GraftBridge.expression(text)))
}
