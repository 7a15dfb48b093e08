package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native SDC (symmetric distance computation) lookup-sum:
  * `Σ_m dtabs(m)(a_m)(b_m)` over two dense PQ code arrays and the
  * broadcast M×k×k distance tables.
  *
  * This is THE per-candidate kernel of the whole semantic-dedup family
  * (C76/C76a, C79/C79a, D20/D22) — executed once per code pair inside
  * the Σcell² stage, millions of times per run. The built-in spelling
  * (`aggregate(zip_with(zip_with(...)))`) builds a struct per subspace
  * and walks the lambda interpreter per element: HigherOrderFunction
  * expressions are CodegenFallback, so the hottest loop in the family
  * ran interpreted with ~3 allocations per subspace. This expression
  * generates a primitive loop of 2 array unwraps + 1 double load per
  * subspace, allocates nothing, and stays inside whole-stage codegen.
  * SdcDistSpec pins value-identity against the HOF spelling.
  *
  * Out-of-range codes (a model/codes mismatch) throw rather than read
  * garbage: UnsafeArrayData does not bounds-check primitive loads.
  */
case class SdcDist(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def codes(t: DataType) = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    def tabs(t: DataType) = t match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    if (codes(first.dataType) && codes(second.dataType) && tabs(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sdc_dist needs (array<int>, array<int>, array<array<array<double>>>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "sdc_dist"

  override protected def nullSafeEval(a: Any, b: Any, t: Any): Any = {
    val ca = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val tabs = t.asInstanceOf[ArrayData]
    val m = math.min(ca.numElements(), cb.numElements())
    require(m <= tabs.numElements(), s"sdc_dist: $m codes but only " +
      s"${tabs.numElements()} tables")
    var s = 0.0
    var i = 0
    while (i < m) {
      val tab = tabs.getArray(i)
      val ia = ca.getInt(i)
      if (ia < 0 || ia >= tab.numElements())
        throw new IllegalArgumentException(s"sdc_dist: code $ia out of range")
      val row = tab.getArray(ia)
      val ib = cb.getInt(i)
      if (ib < 0 || ib >= row.numElements())
        throw new IllegalArgumentException(s"sdc_dist: code $ib out of range")
      s += row.getDouble(ib)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, t) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val tab = ctx.freshName("tab")
      val row = ctx.freshName("row")
      val ia = ctx.freshName("ia")
      val ib = ctx.freshName("ib")
      s"""
         |final int $m = java.lang.Math.min($a.numElements(), $b.numElements());
         |if ($m > $t.numElements()) {
         |  throw new IllegalArgumentException("sdc_dist: more codes than tables");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $tab = $t.getArray($i);
         |  final int $ia = $a.getInt($i);
         |  if ($ia < 0 || $ia >= $tab.numElements()) {
         |    throw new IllegalArgumentException("sdc_dist: code out of range");
         |  }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $tab.getArray($ia);
         |  final int $ib = $b.getInt($i);
         |  if ($ib < 0 || $ib >= $row.numElements()) {
         |    throw new IllegalArgumentException("sdc_dist: code out of range");
         |  }
         |  $s += $row.getDouble($ib);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SdcDist =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SdcDist {
  /** Column-API entry point (no session registration needed). */
  def apply(a: Column, b: Column, dtabs: Column): Column =
    GraftBridge.column(SdcDist(GraftBridge.expression(a),
      GraftBridge.expression(b), GraftBridge.expression(dtabs)))
}
