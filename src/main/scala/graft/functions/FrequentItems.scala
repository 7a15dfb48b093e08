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
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst aggregate —
  * the 100 TB answer to "what are the most frequent tokens" when the
  * exact answer (`ngram_counts`/`text_vocab`) would shuffle one row per
  * DISTINCT term: the sketch keeps at most `k` counters per partial
  * aggregate, so the shuffle carries k rows per map task no matter how
  * large the vocabulary grows, and merging is counter addition plus one
  * prune. Bounds (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): with n total items,
  *   est ≤ true  and  true − est ≤ n/(k+1),
  * so every term with true frequency > n/(k+1) is guaranteed present.
  * Estimates depend on merge order (like every MG implementation), so
  * the query face is rows-only with a spec asserting the bounds —
  * never hash-compared against an exact oracle.
  *
  * Update is the classic decrement-all-on-overflow (amortized O(1):
  * each decrement is paid for by an earlier increment); merge sums the
  * two summaries and, if over k counters, subtracts the (k+1)-th
  * largest count from all and drops the non-positive ones.
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"frequent_items needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"frequent_items needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "frequent_items"
  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItems =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val term = v.asInstanceOf[UTF8String].toString
    buffer.get(term) match {
      case Some(c) => buffer.update(term, c + 1)
      case None if buffer.size < k => buffer.update(term, 1L)
      case None =>
        // decrement-all: the unseen item and one unit of every counter
        // cancel out; counters hitting zero free their slot
        val dead = mutable.ArrayBuffer.empty[String]
        buffer.keysIterator.foreach { key =>
          val nc = buffer(key) - 1
          if (nc <= 0) dead += key else buffer.update(key, nc)
        }
        dead.foreach(buffer.remove)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (term, c) =>
      buffer.update(term, buffer.getOrElse(term, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest count from everything; at most k
      // counters stay strictly positive
      val cut = buffer.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.keysIterator.foreach { key =>
        val nc = buffer(key) - cut
        if (nc <= 0) dead += key else buffer.update(key, nc)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }
}

object FrequentItems {
  /** Column face: `frequentItems(col, k)` aggregates to
    * `array<struct<term, est>>` sorted by estimate descending. */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      FrequentItems(GraftBridge.expression(c), k).toAggregateExpression())
}
