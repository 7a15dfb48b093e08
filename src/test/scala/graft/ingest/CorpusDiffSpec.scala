package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff over real snapshot versions reports exactly the planted changes") {
    val root = tmpDir("cdiff-snap")
    val v1 = Seq(
      (1L, "s1", "alpha beta"), (2L, "s1", "gamma delta"),
      (3L, "s2", "epsilon zeta"), (4L, "s2", "eta theta")).toDF("id", "src", "text")
    Snapshots.write(v1, root, append = false)
    // v2: id=2 edited, id=3 removed, id=5 added
    val v2 = Seq(
      (1L, "s1", "alpha beta"), (2L, "s1", "gamma delta EDIT"),
      (4L, "s2", "eta theta"), (5L, "s2", "iota kappa")).toDF("id", "src", "text")
    Snapshots.write(v2, root, append = false)
    val keyed = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("h", graft.ops.Text.contentHash(col("text")))
    val got = CorpusDiff.diff(
        keyed(Snapshots.read(spark, root, version = Some(1L))),
        keyed(Snapshots.read(spark, root, version = Some(2L))),
        "id", "src", "h")
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "modified",
      3L -> "removed", 4L -> "unchanged", 5L -> "added"))
  }

  test("corpus_diff card: statuses recount from the split rules, shares reconcile") {
    val rows = CorpusDiff.corpusDiffQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver recount from the same deterministic rules
    val ids = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source")).as[(Long, String)].collect()
    val want = ids.flatMap { case (id, src) =>
      val inOld = id % 11 != 5
      val inNew = id % 9 != 4
      val edited = id % 13 == 2
      if (inOld && inNew) Some(src -> (if (edited) "modified" else "unchanged"))
      else if (inNew) Some(src -> "added")
      else if (inOld) Some(src -> "removed")
      else None
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = rows.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("docs")).toMap
    assert(got == want, s"card diverged from the rule recount")
    // all four statuses occur somewhere at this SF; shares reconcile per source
    assert(Set("added", "removed", "modified", "unchanged")
      .subsetOf(rows.map(_.getString(1)).toSet))
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val tot = rs.map(_.getAs[Long]("docs")).sum
      rs.foreach { r =>
        assert(r.getAs[Long]("share_bp") == r.getAs[Long]("docs") * 10000 / tot,
          s"$src share arithmetic")
      }
    }
  }
}
