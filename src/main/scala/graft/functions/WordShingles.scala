package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column in one native pass.
  *
  * Semantically identical to the built-in spelling
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ", ...)))`
  * over `split(normalized, " ")` — and to the DuckDB oracle's
  * `SELECT DISTINCT w[i]||' '||w[i+1]||' '||w[i+2]` — but those
  * higher-order functions evaluate INTERPRETED per array element (they
  * don't participate in whole-stage codegen), which made the shingle
  * projection the dominant cost of both dedup_minhash and
  * dedup_ngram_jaccard. Here: lowercase once, scan for `\s`-delimited
  * tokens (ASCII whitespace, matching the regex class the built-ins
  * used), assemble shingles into a first-occurrence-ordered set.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 16, s"shingle size out of range: $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** `\s` in the default Java regex flavor (what `split("\\s+")` used). */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val text = s.toLowerCase.toString
    // tokenize: runs of non-whitespace
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) toks.add(text.substring(start, i))
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // distinct shingles, first-occurrence order (matches array_distinct)
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))
}
