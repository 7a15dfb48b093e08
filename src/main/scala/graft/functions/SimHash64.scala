package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash of a document in one native scan.
  *
  * Semantics identical to the exploded spelling in
  * [[graft.ops.Dedup.simhash]]'s original form — token hash = first 15
  * hex chars of md5(token) as a 60-bit integer; signature bit i set iff
  * the occurrence-weighted ±1 sum over tokens is positive (summing ±1
  * per OCCURRENCE equals weighting distinct tokens by count). Computing
  * it per document in a single pass removes the token explode, the
  * (doc, token) count shuffle, and the 60-aggregate signature shuffle —
  * the whole signature stage becomes a narrow projection.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val text = s.toLowerCase.toString
    val sums = new Array[Int](60)
    val md = digest.get()
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) {
        md.reset()
        md.update(text.substring(start, i).getBytes("UTF-8"))
        val d = md.digest()
        // 60-bit value of the first 15 hex chars = first 7.5 bytes,
        // big-endian (matches conv(substr(md5,1,15),16,10))
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >> 4)
        var bit = 0
        while (bit < 60) {
          if (((h >> bit) & 1L) == 1L) sums(bit) += 1 else sums(bit) -= 1
          bit += 1
        }
      }
    }
    var sig = 0L
    var bit = 0
    while (bit < 60) {
      if (sums(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Column-API entry point. */
  def apply(text: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(text)))
}
