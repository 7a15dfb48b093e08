package graft.analytics

import graft.SparkSpec

class LakeQueriesSpec extends SparkSpec {

  test("q32 value-share: selected parts are exactly those above 1.3x the mean share") {
    import org.apache.spark.sql.functions._
    val value = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("c"))
      .groupBy("l_partkey").agg(sum(col("c")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = value.values.sum
    val np = value.size.toLong
    val want = value.filter { case (_, v) => v * np * 10 > total * 13 }.keySet
    val got = LakeQueries.q32ValueShare(spark, sfDir).collect()
    assert(got.nonEmpty && got.map(_.getLong(0)).toSet == want)
    // reported share_bp is the integer-bp share of the recounted total
    got.foreach { r =>
      assert(r.getLong(1) * 10000 / total == r.getLong(3),
        s"share_bp mismatch for part ${r.getLong(0)}")
    }
  }

  test("q33 min-cost supplier: window face equals a groupBy+join recount") {
    import org.apache.spark.sql.functions._
    val offers = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") / col("l_quantity") * 100 + 0.5)
          .cast("long").as("u"))
      .groupBy("l_partkey", "l_suppkey").agg(min(col("u")).as("cost"))
    val best = offers.groupBy("l_partkey").agg(min(col("cost")).as("b"))
    val joined = offers.join(best, "l_partkey")
      .where(col("cost") === col("b"))
      .join(graft.sources.Tables(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("s_name"), col("cost"))
      .orderBy(col("cost").desc, col("l_partkey"), col("s_name"))
      .limit(100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val got = LakeQueries.q33MinCostSupplier(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(4))).toSeq
    assert(got.nonEmpty && got == joined)
  }

  test("q34 new users: curve accounts for every user exactly once") {
    import org.apache.spark.sql.functions._
    val rows = LakeQueries.q34NewUsers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // cumulative is the running sum and ends at the distinct user count
    val running = rows.scanLeft(0L)(_ + _._2).drop(1)
    assert(rows.map(_._3).toSeq == running.toSeq)
    val users = graft.sources.Tables(spark, sfDir, "events")
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(rows.last._3 == users, "curve must end at the distinct user count")
    // each user's first day recounted independently
    val firstDays = graft.sources.Tables(spark, sfDir, "events")
      .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("d"))
      .groupBy("user_id").agg(min(col("d")).as("d"))
      .groupBy("d").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (d, n, _) => assert(firstDays(d) == n) }
  }

  test("q35 sessions: day card equals an independent driver sessionizer") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver reference: per user, sort by (sec, event_id), split at gaps > 1800
    val sessions = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(_._3).toVector
      sorted.tail.foldLeft(Vector(Vector(sorted.head))) { (acc, sec) =>
        if (sec - acc.last.last <= 1800) acc.init :+ (acc.last :+ sec)
        else acc :+ Vector(sec)
      }
    }
    val want = sessions.groupBy(_.head / 86400).map { case (d, ss) =>
      d -> ((ss.size.toLong, ss.map(_.size.toLong).sum,
        ss.map(v => v.last - v.head).sum, ss.map(_.size.toLong).max))
    }
    val got = LakeQueries.q35Sessions(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.nonEmpty && got == want)
    assert(got.values.map(_._2).sum == events.length.toLong,
      "every event must land in exactly one session")
  }

  test("q37 grouping sets: equals the union of the two one-level aggregates") {
    import org.apache.spark.sql.functions._
    val joined = graft.sources.Tables(spark, sfDir, "orders")
      .join(graft.sources.Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.sources.Tables(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(graft.sources.Tables(spark, sfDir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name"), year(col("o_orderdate")).as("yr"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    def level(tag: String, key: String) = joined
      .groupBy(col(key), col("yr"))
      .agg(count(lit(1)).as("orders"), sum(col("cents")).as("rev"))
      .collect().map(r => (tag, r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val want = (level("nation", "n_name") ++ level("region", "r_name")).toSet
    val got = LakeQueries.q37GroupingSets(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty && got.toSet == want)
    assert(got.exists(_._1 == "nation") && got.exists(_._1 == "region"))
  }

  test("q36 late shipments: CASE split recounts and partitions the late lines") {
    import org.apache.spark.sql.functions._
    val urgent = Set("1-URGENT", "2-HIGH")
    val prio = graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_timestamp(col("o_orderdate")).as("os"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val want = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), year(col("l_shipdate")).as("y"),
        unix_timestamp(col("l_shipdate")).as("ss"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .flatMap { case (ok, y, ss) =>
        val (p, os) = prio(ok)
        if (ss - os > 365L * 86400L) Some((y, urgent(p))) else None
      }
      .groupBy(_._1).map { case (y, g) =>
        y -> ((g.count(_._2).toLong, g.count(!_._2).toLong))
      }
    val got = LakeQueries.q36LateShipments(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty && got == want)
    assert(got.values.exists(v => v._1 > 0) && got.values.exists(v => v._2 > 0),
      "both priority classes must appear — otherwise the split is vacuous")
  }

  test("q11 from_json native face equals the regexp oracle face row-by-row") {
    val re = LakeQueries.q11JsonProps(spark, sfDir).collect().map(_.toSeq).toSeq
    val native = LakeQueries.q11JsonPropsNative(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(re.nonEmpty)
    assert(native == re, s"faces diverge:\n native=$native\n regexp=$re")
  }

  test("q39 volume card: ratio arithmetic recounts; a planted 5x spike fires") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val card = LakeQueries.q39VolumeSpike(spark, sfDir).collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      assert(r.getAs[Long]("trail_days") >= 4)
      // exact arithmetic: ratio_bp recomputes from the row's own fields
      assert(r.getAs[Long]("ratio_bp") ==
        r.getAs[Long]("events") * 20000 / r.getAs[Long]("trail_med_x2"))
    }
    // the flag is purely derived (small-count days at tiny SFs can
    // legitimately cross 2x on Poisson noise, so never pin "no spikes")
    card.foreach { r =>
      assert((r.getAs[Int]("is_spike") == 1) == (r.getAs[Long]("ratio_bp") >= 20000))
    }
    // planted case: 10 flat days then a 5x day — the spike day (and only
    // it) must flag, against a trailing median that ignores the spike
    val daily = ((1 to 10).map(i => ("t", s"2024-02-${"%02d".format(i)}", 100L))
      .toSeq :+ (("t", "2024-02-11", 500L)))
      .toDF("event_type", "day0", "n")
      .select(col("event_type"), to_date(col("day0")).as("day"), col("n"))
    val planted = LakeQueries.volumeSpikeCard(daily).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("ratio_bp"), r.getAs[Int]("is_spike")))).toMap
    assert(planted("2024-02-11") == ((50000L, 1)), s"5x day must flag: $planted")
    assert(planted.filter(_._1 != "2024-02-11").values.forall(_._2 == 0))
  }
}
