package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.LongType

import graft.functions.{ByteHistogram, FrequentItems, KmvSketch, MinHashes, NearestCentroids, SimHash64, TokenMarkerStats, VectorDot, WordShingles}

/** Session extensions: registers graft's native expressions in the SQL
  * function registry so the whole kernel set works from plain SQL —
  * `SELECT simhash64(text), minhashes(word_shingles(text, 3), 16) ...`
  * — giving the reference's Athena-style SQL users the same operators
  * the DataFrame faces use (one implementation, two spellings).
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * — the Column API (each expression's `apply`) needs no registration
  * and works on any session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** SQL scalar args (shingle size, hash count, top-n) arrive as
    * expressions; the native constructors take Ints. Only foldable
    * integral literals are accepted — a column-valued size would make
    * the expression's OUTPUT TYPE data-dependent, which SQL cannot
    * plan. */
  private def intArg(e: Expression, fn: String, arg: String): Int = e match {
    case lit: Literal if lit.foldable =>
      lit.value match {
        case i: Int => i
        case l: Long => l.toInt
        case s: Short => s.toInt
        case b: Byte => b.toInt
        case other =>
          throw new IllegalArgumentException(
            s"$fn: $arg must be an integer literal, got $other")
      }
    case other =>
      throw new IllegalArgumentException(
        s"$fn: $arg must be a literal, got ${other.sql}")
  }

  private def fn(name: String, clazz: Class[_], arity: String)
                (builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(arity.split(",").map(_.trim.toInt).contains(children.length),
          s"$name takes $arity argument(s), got ${children.length}")
        builder(children)
      })

  /** (identifier, info, builder) triples — the exact shape
    * `SparkSessionExtensions.injectFunction` consumes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      fn("vector_dot", classOf[VectorDot], "2") { c =>
        VectorDot(c.head, c(1))
      },
      fn("word_shingles", classOf[WordShingles], "2") { c =>
        WordShingles(c.head, intArg(c(1), "word_shingles", "n"))
      },
      fn("minhashes", classOf[MinHashes], "2") { c =>
        MinHashes(c.head, intArg(c(1), "minhashes", "num_hashes"))
      },
      fn("simhash64", classOf[SimHash64], "1") { c =>
        SimHash64(c.head)
      },
      fn("token_marker_stats", classOf[TokenMarkerStats], "1") { c =>
        TokenMarkerStats(c.head)
      },
      fn("nearest_centroids", classOf[NearestCentroids], "3") { c =>
        NearestCentroids(c.head, c(1), intArg(c(2), "nearest_centroids", "n"))
      },
      fn("byte_histogram", classOf[ByteHistogram], "1") { c =>
        ByteHistogram(c.head)
      },
      // aggregate: the analyzer wraps a bare AggregateFunction in its
      // AggregateExpression when resolving SQL calls
      fn("frequent_items", classOf[FrequentItems], "2") { c =>
        FrequentItems(c.head, intArg(c(1), "frequent_items", "k"))
      },
      fn("kmv_sketch", classOf[KmvSketch], "2") { c =>
        KmvSketch(c.head, intArg(c(1), "kmv_sketch", "k"))
      },
      // Spark's own bloom-filter pair, re-exposed by name: the engine
      // registers them internal-only (the optimizer's runtime-filter
      // machinery builds them directly), so SQL users can't spell the
      // standing-index membership probe graft's incremental dedup is
      // built on. Estimated-items arrives as an integral literal and is
      // re-typed to the LongType the aggregate's type check demands.
      fn("bloom_filter_agg", classOf[BloomFilterAggregate], "1, 2") { c =>
        if (c.length == 1) new BloomFilterAggregate(c.head)
        else new BloomFilterAggregate(c.head,
          Literal(intArg(c(1), "bloom_filter_agg", "est_items").toLong, LongType))
      },
      fn("might_contain", classOf[BloomFilterMightContain], "2") { c =>
        BloomFilterMightContain(c.head, c(1))
      })

  /** Injects the full function set into an EXISTING session's registry —
    * the runtime face for sessions built without
    * `spark.sql.extensions=graft.GraftExtensions` (the verify/bench
    * mains, notebooks attached to a shared cluster). Idempotent:
    * re-registration replaces the same builders. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
