package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `k` MinHash permutation hashes of one shingle in a single pass:
  * element i is the lowercase md5 hex of the UTF-8 bytes of `"i|" + s` —
  * byte-identical to the built-in spelling `md5(concat(lit("i|"), s))`
  * and to the DuckDB oracle's `md5('i|'||s)`, so signatures stay
  * engine-portable.
  *
  * Why native: the built-in spelling evaluates k independent
  * concat→UTF8String→md5 expression trees per row (k allocations of the
  * concatenated string + k digest instances). This expression converts
  * the shingle to bytes ONCE, reuses a thread-local MessageDigest, and
  * emits one array — the dominant projection inside dedup_minhash.
  */
case class MinHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 64, s"numHashes out of range: $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhashes needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "minhashes"

  override protected def nullSafeEval(input: Any): Any =
    MinHashes.compute(input.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashes.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashes =
    copy(child = newChild)
}

object MinHashes {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** UTF-8 bytes of `"i|"` for i in 0..63, computed once. */
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(64)(i => s"$i|".getBytes("UTF-8"))

  private val hexChars = "0123456789abcdef".toCharArray

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val md = digest.get()
    val base = s.getBytes
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      md.reset()
      md.update(prefixes(i))
      md.update(base)
      val d = md.digest()
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(j * 2) = hexChars((d(j) >> 4) & 0xf)
        hex(j * 2 + 1) = hexChars(d(j) & 0xf)
        j += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(s: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashes(GraftBridge.expression(s), numHashes))
}
