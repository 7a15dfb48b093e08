package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch as a native Catalyst
  * aggregate (Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD
  * 2007): keep the `k` smallest DISTINCT hash values seen. Unlike HLL
  * (A8a/A24, distinct counts only), a KMV sketch supports SET
  * OPERATIONS between sketches — the k smallest of a union of two
  * sketches is a valid sketch OF THE UNION, and the fraction of those
  * that appear in both inputs estimates the Jaccard similarity — so
  * per-corpus sketches answer "how much do these two crawls overlap?"
  * with no join over the underlying keys at all.
  *
  * Estimator: with hashes uniform on [0,1) (xxhash64 mapped by
  * u = v/2^64 + 1/2 — monotone in the signed long, so the buffer
  * orders by plain signed comparison), the unbiased distinct estimate
  * is (k-1)/u_(k); when fewer than k distinct values exist the sketch
  * IS the value set and every estimate is exact.
  *
  * Scale: the buffer never exceeds k longs, merging is a set-union
  * trim (associative, commutative, and — unlike Misra–Gries —
  * MERGE-ORDER INDEPENDENT: the k smallest of a multiset do not
  * depend on arrival order, so results are bit-stable under any
  * repartitioning; the spec asserts this). A 100 TB corpus's
  * per-source shingle universe collapses to k×8 bytes per source.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch needs a long hash input (e.g. xxhash64(col)), got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  override def update(buffer: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val h = v.asInstanceOf[Long]
    if (buffer.size < k) buffer += h
    else if (h < buffer.last && !buffer.contains(h)) {
      buffer -= buffer.last
      buffer += h
    }
    buffer
  }

  override def merge(buffer: mutable.TreeSet[Long],
                     other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach { h =>
      if (buffer.size < k) buffer += h
      else if (h < buffer.last && !buffer.contains(h)) {
        buffer -= buffer.last
        buffer += h
      }
    }
    buffer
  }

  /** Sorted ascending (signed == the u-order, see class doc). */
  override def eval(buffer: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { s += in.readLong(); i += 1 }
    s
  }
}

object KmvSketch {
  /** Column face: aggregates a long-hash column to the sorted k-min
    * array. Pair with [[distinctEstimate]] / [[unionSketch]] /
    * [[jaccardEstimate]] for the estimator algebra. */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      KmvSketch(GraftBridge.expression(c), k).toAggregateExpression())

  /** 2^64 as a double, for the signed-long → [0,1) uniformity map. */
  private val Two64 = 1.8446744073709552e19

  private def unit(v: Column): Column = v.cast("double") / Two64 + 0.5

  /** Distinct-count estimate from a sketch array: exact below k
    * (the sketch holds the whole value set), (k-1)/u_(k) at k.
    * `hashBits` names the hash's value space: 64 = full signed-long
    * hashes (xxhash64) mapped by the signed-shift unit; anything
    * smaller = non-negative `hashBits`-bit hashes (e.g. the md5-derived
    * 60-bit values the oracle-parity faces use) mapped by v / 2^bits. */
  def distinctEstimate(sketch: Column, k: Int, hashBits: Int = 64): Column = {
    val u =
      if (hashBits == 64) unit(element_at(sketch, k))
      else element_at(sketch, k).cast("double") / math.pow(2.0, hashBits)
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit(k - 1).cast("double") / u)
  }

  /** The k smallest of two sketches' union — a valid KMV sketch of
    * the union of the two underlying sets. */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Jaccard estimate: the fraction of the union sketch's values
    * present in BOTH input sketches (Beyer et al. 2007, §5.2).
    * Two empty sketches (a source whose documents all shingle to
    * nothing) estimate 0.0, not 0/0 = NaN. */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val x = unionSketch(a, b, k)
    when(size(x) === 0, lit(0.0)).otherwise(
      size(filter(x, v => array_contains(a, v) && array_contains(b, v)))
        .cast("double") / size(x))
  }
}
