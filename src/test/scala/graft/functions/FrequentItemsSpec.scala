package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Text, TextQueries}

/** The Misra–Gries bounds are the correctness contract (estimates are
  * merge-order dependent, so there is no exact oracle): with n items
  * and k counters, est ≤ true, true − est ≤ n/(k+1), and every term
  * with true frequency > n/(k+1) is present in the summary. */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  private lazy val exact: Map[String, Long] = {
    val toks = graft.sources.Tables(spark, sfDir, "documents")
      .select(explode(Text.tokens(col("text"))).as("t"))
      .as[String].collect()
    toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
  }

  private def summaryOf(partitions: Int): Map[String, Long] =
    graft.sources.Tables(spark, sfDir, "documents")
      .repartition(partitions)
      .select(explode(Text.tokens(col("text"))).as("t"))
      .agg(FrequentItems(col("t"), K).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select($"e.term", $"e.est").as[(String, Long)]
      .collect().toMap

  test("sketch bounds hold: undercount only, within n/(k+1), full heavy-hitter coverage") {
    val n = exact.values.sum
    val slack = n / (K + 1)
    Seq(3, 11).foreach { parts =>
      val sk = summaryOf(parts)
      assert(sk.nonEmpty && sk.size <= K)
      sk.foreach { case (t, est) =>
        val truth = exact.getOrElse(t, 0L)
        assert(est <= truth, s"overcount for '$t': est $est > true $truth")
        assert(truth - est <= slack,
          s"error beyond n/(k+1) for '$t': true $truth est $est slack $slack")
      }
      exact.filter(_._2 > slack).keys.foreach { t =>
        assert(sk.contains(t), s"heavy hitter '$t' missing at $parts partitions")
      }
    }
  }

  test("serialize/deserialize roundtrip preserves the summary") {
    val agg = FrequentItems(
      org.apache.spark.sql.GraftBridge.expression(col("x")), 4)
    val buf = agg.createAggregationBuffer()
    buf.update("alpha", 7L); buf.update("beta", 2L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }

  test("merge prunes to k and only ever lowers counts") {
    val agg = FrequentItems(
      org.apache.spark.sql.GraftBridge.expression(col("x")), 2)
    val a = agg.createAggregationBuffer()
    a.update("p", 10L); a.update("q", 4L)
    val b = agg.createAggregationBuffer()
    b.update("r", 3L); b.update("q", 1L)
    val m = agg.merge(a, b)
    // combined (p 10, q 5, r 3) minus the 3rd-largest (3) -> p 7, q 2
    assert(m.size <= 2 && m("p") == 7L && m("q") == 2L && !m.contains("r"))
  }

  test("token_topk_sketch face: the rescored top-20 IS the exact top-20") {
    val rows = TextQueries.tokenTopkSketch(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    // counts are exact (the rescore pass), not estimates
    rows.foreach(r => assert(r.getLong(2) == exact(r.getString(1))))
    // the MG coverage precondition holds on this corpus (freq of the
    // 20th term > n/(k+1)), so the face must equal the true top-20
    // under the same (count desc, term asc) tie-break
    val trueTop = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(rows.length)
    val n = exact.values.sum
    assert(trueTop.last._2 > n / (K + 1),
      "test corpus no longer satisfies the coverage precondition")
    assert(rows.map(r => (r.getString(1), r.getLong(2))).toSeq == trueTop)
  }

  test("frequent_items is callable from plain SQL and honors the same bounds") {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    graft.sources.Tables.registerAll(spark, sfDir)
    val sk = spark.sql(
      """SELECT e.term, e.est FROM (
        |  SELECT explode(frequent_items(t, 64)) AS e FROM (
        |    SELECT explode(split(trim(regexp_replace(lower(text),'\\s+',' ')),' ')) AS t
        |    FROM documents))""".stripMargin)
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    assert(sk.nonEmpty && sk.size <= K)
    sk.foreach { case (t, est) =>
      val truth = exact.getOrElse(t, 0L)
      assert(est <= truth && truth - est <= n / (K + 1))
    }
  }
}
