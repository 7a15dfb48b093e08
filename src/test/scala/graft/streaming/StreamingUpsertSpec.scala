package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ingest.Snapshots

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def state(table: String) =
    Snapshots.read(spark, table).as[(Long, String, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("a change stream maintains latest state across micro-batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_supsert").toString
    val table = s"$dir/state"
    val stream = MemoryStream[(Long, String, Double, String, Long)]
    val q = StreamingUpsert.start(
      stream.toDF().toDF("k", "name", "v", "op", "seq"),
      table, "k", s"$dir/ckpt")
    try {
      stream.addData((1L, "a", 10.0, "U", 1L), (2L, "b", 20.0, "U", 1L),
        (3L, "c", 30.0, "U", 1L))
      q.processAllAvailable()
      assert(state(table) == Map(1L -> ("a", 10.0), 2L -> ("b", 20.0), 3L -> ("c", 30.0)))

      // batch 2: update 2, delete 3, insert 4; key 2 twice (seq wins)
      stream.addData((2L, "b1", 21.0, "U", 2L), (2L, "b2", 22.0, "U", 3L),
        (3L, "c", 0.0, "D", 2L), (4L, "d", 40.0, "U", 1L))
      q.processAllAvailable()
      assert(state(table) == Map(1L -> ("a", 10.0), 2L -> ("b2", 22.0), 4L -> ("d", 40.0)))

      // every batch left a time-travelable snapshot
      val vs = Snapshots.versions(table)
      assert(vs.size == 2, s"one snapshot per batch: $vs")
      val v1 = Snapshots.read(spark, table, Some(vs.head))
        .as[(Long, String, Double)].collect().map(_._1).toSet
      assert(v1 == Set(1L, 2L, 3L), "v1 must still show the pre-batch-2 state")
    } finally q.stop()
  }

  test("re-applying a batch is a fixpoint (at-least-once delivery is safe)") {
    val dir = Files.createTempDirectory("graft_supsert2").toString
    val table = s"$dir/state"
    val sink = StreamingUpsert.upsertSink(table, "k")
    val batch = Seq((1L, "a", 10.0, "U", 1L), (2L, "gone", 0.0, "D", 1L))
      .toDF("k", "name", "v", "op", "seq")
    sink(batch, 0L)
    val after1 = state(table)
    sink(batch, 0L)   // redelivery
    assert(state(table) == after1, "replay must not change the state")
    assert(after1 == Map(1L -> ("a", 10.0)))
  }
}
