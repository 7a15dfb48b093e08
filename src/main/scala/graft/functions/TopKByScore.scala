package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: the k (id, score) pairs ranked by
  * (score DESC, id ASC), as `array<struct<id:bigint, score:double>>`
  * in rank order.
  *
  * The point is the PARTIAL-AGGREGATION shape: `window row_number() <=
  * k` must SORT its whole partition first, and `groupBy.max` collapses
  * to one row — neither gives "k rows per group with map-side
  * collapse". This aggregate folds any candidate stream into k-element
  * states in the hash-aggregate map BEFORE the shuffle, so a
  * quadratic-ish candidate stage (the kNN-graph build's Σcell² pair
  * stream) ships k structs per group instead of the stream itself —
  * measured the difference between a 512k-vector graph build spilling
  * the disk dry (a ~58 GB (src,dst,cos) shuffle) and one that fits in
  * memory.
  *
  * Exact and deterministic: the comparator is a total order (ties on
  * score break by ascending id — the same (cos DESC, dst) order the
  * window spelling used), update/merge keep the k best under it, and
  * null ids/scores are skipped like SQL aggregates skip nulls. */
case class TopKByScore(
    idExpr: Expression, scoreExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Double)]] {

  require(k >= 1, s"k must be positive: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType == LongType && scoreExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score needs (bigint, double), got " +
        s"(${idExpr.dataType.simpleString}, ${scoreExpr.dataType.simpleString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"
  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Double)] =
    mutable.ArrayBuffer.empty

  /** Spark's double total order (SQLOrderingUtil.compareDoubles): NaN
    * is GREATEST (so a NaN score ranks FIRST, exactly like the window
    * `row_number() over (order by score desc)` spelling this aggregate
    * replaces), and -0.0 == 0.0. Primitive `>`/`==` would silently
    * rank NaN LAST and break the equals-the-window-spelling contract
    * on overflowing cosines (Inf/Inf). */
  private def cmpScore(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  // total order: higher score first (NaN greatest), lower id breaks ties
  private def beats(a: (Long, Double), b: (Long, Double)): Boolean = {
    val c = cmpScore(a._2, b._2)
    c > 0 || (c == 0 && a._1 < b._1)
  }

  /** Insert keeping the buffer rank-sorted and bounded at k. O(k) —
    * k is a small constant (graph degree), so a heap buys nothing. */
  private def insert(buf: mutable.ArrayBuffer[(Long, Double)],
                     cand: (Long, Double)): Unit = {
    if (buf.size >= k && !beats(cand, buf.last)) return
    var i = buf.size
    while (i > 0 && beats(cand, buf(i - 1))) i -= 1
    buf.insert(i, cand)
    if (buf.size > k) buf.remove(buf.size - 1)
  }

  override def update(buf: mutable.ArrayBuffer[(Long, Double)],
                      input: InternalRow): mutable.ArrayBuffer[(Long, Double)] = {
    val id = idExpr.eval(input)
    val sc = scoreExpr.eval(input)
    if (id != null && sc != null)
      insert(buf, (id.asInstanceOf[Long], sc.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Long, Double)],
                     other: mutable.ArrayBuffer[(Long, Double)]): mutable.ArrayBuffer[(Long, Double)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Double)]): Any =
    new GenericArrayData(buf.map { case (id, sc) => InternalRow(id, sc) }.toArray)

  override def serialize(buf: mutable.ArrayBuffer[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (id, sc) => out.writeLong(id); out.writeDouble(sc) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Long, Double)]
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readDouble())); i += 1 }
    buf
  }
}

object TopKByScore {
  /** Column-API entry point. */
  def apply(id: Column, score: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScore(GraftBridge.expression(id), GraftBridge.expression(score), k)
        .toAggregateExpression())
}
