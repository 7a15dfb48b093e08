package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** L1-normalized 16-bin byte histogram of a binary payload — the cheap,
  * codec-free feature extractor for opaque media columns: each byte
  * lands in bin `value / 16`, counts divide by total length. The result
  * is a plain `array<double>` feature vector, so every §2.C vector
  * operator (cosine top-k, LSH, centroids) applies to media payloads
  * unchanged. One native scan per row; empty payloads yield the zero
  * vector.
  */
case class ByteHistogram(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_histogram needs a binary input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "byte_histogram"

  override protected def nullSafeEval(input: Any): Any =
    ByteHistogram.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteHistogram.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
    copy(child = newChild)
}

object ByteHistogram {
  val Bins = 16

  /** Called from both interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): ArrayData = {
    val counts = new Array[Long](Bins)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xff) >> 4) += 1
      i += 1
    }
    val out = new Array[Any](Bins)
    val n = if (bytes.length == 0) 1.0 else bytes.length.toDouble
    var b = 0
    while (b < Bins) { out(b) = counts(b) / n; b += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def apply(bin: Column): Column =
    GraftBridge.column(ByteHistogram(GraftBridge.expression(bin)))
}
