package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused multi-table LSH signature over an `array<double>` vector: all
  * `numTables × bits` hyperplane dot products in ONE pass over the
  * vector, returning the per-table bucket ids as `array<bigint>`.
  *
  * The composed spelling — `bits` [[VectorDot]]s per table folded into a
  * `when(...> 0, 1<<j)` sum — reads the vector `numTables × bits` times
  * and, past ~10 bits, the generated expression tree falls out of
  * whole-stage codegen entirely (the round-12 512k grid measured b=10
  * at 5× and b=12 at 8× the b=9 cost — the "codegen cliff"). This
  * kernel reads each element once and accumulates every plane's dot
  * simultaneously.
  *
  * FP parity contract (what the seeded-planes-inlined C7 oracle rests
  * on): each plane's accumulator adds `±1.0 * e(i)` in ascending `i`
  * order — the identical operation sequence per plane as the separate
  * left-to-right dots, so every dot, every sign test, and every bucket
  * is bit-identical to the composed spelling (LshSignatureSpec pins
  * equality row-for-row).
  *
  * The planes ride in the expression as a flattened ±1 sign array laid
  * out `[element][plane]` so the inner loop is stride-1 over planes for
  * one broadcast element value. */
case class LshSignature(child: Expression, signs: Array[Byte],
                        numTables: Int, bits: Int)
    extends UnaryExpression {

  private val planes = numTables * bits
  require(signs.length % planes == 0,
    s"sign array (${signs.length}) must be a multiple of tables*bits ($planes)")
  private val dim = signs.length / planes

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_signature needs array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "lsh_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = math.min(e.numElements(), dim)
    val acc = new Array[Double](planes)
    var i = 0
    while (i < n) {
      val v = e.getDouble(i)
      val base = i * planes
      var p = 0
      while (p < planes) { acc(p) += signs(base + p) * v; p += 1 }
      i += 1
    }
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var b = 0L
      var j = 0
      while (j < bits) { if (acc(t * bits + j) > 0) b |= (1L << j); j += 1 }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sg = ctx.addReferenceObj("signs", signs, "byte[]")
    val acc = ctx.freshName("acc")
    val out = ctx.freshName("out")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val t = ctx.freshName("t")
    val j = ctx.freshName("j")
    val v = ctx.freshName("v")
    val b = ctx.freshName("b")
    val n = ctx.freshName("n")
    val base = ctx.freshName("base")
    nullSafeCodeGen(ctx, ev, e => {
      s"""
         |final int $n = java.lang.Math.min($e.numElements(), $dim);
         |final double[] $acc = new double[$planes];
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = $e.getDouble($i);
         |  final int $base = $i * $planes;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    $acc[$p] += $sg[$base + $p] * $v;
         |  }
         |}
         |final long[] $out = new long[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $b = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ($acc[$t * $bits + $j] > 0) $b |= (1L << $j);
         |  }
         |  $out[$t] = $b;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

object LshSignature {
  /** Column-API entry point from the seeded plane set (±1 doubles,
    * `planes(t*bits + j)(i)`), re-laid out `[element][plane]` for the
    * kernel's stride-1 inner loop. */
  def apply(vec: Column, planes: Array[Array[Double]],
            numTables: Int, bits: Int): Column = {
    val dim = planes.head.length
    val signs = new Array[Byte](dim * planes.length)
    for (i <- 0 until dim; p <- planes.indices)
      signs(i * planes.length + p) = if (planes(p)(i) > 0) 1 else -1
    GraftBridge.column(
      LshSignature(GraftBridge.expression(vec), signs, numTables, bits))
  }
}
