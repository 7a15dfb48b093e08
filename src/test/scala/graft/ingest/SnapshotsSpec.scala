package graft.ingest

import graft.SparkSpec

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("append commits stack; overwrite replaces; history time-travels") {
    val table = tmpDir("snap") + "/orders"
    val v1 = Snapshots.write(Seq(1L, 2L).toDF("id"), table)
    val v2 = Snapshots.write(Seq(3L).toDF("id"), table)
    assert(Seq(v1, v2) == Seq(1L, 2L))
    assert(Snapshots.read(spark, table).as[Long].collect().toSet == Set(1L, 2L, 3L))
    // logical overwrite: v3 sees only the new data...
    val v3 = Snapshots.write(Seq(9L).toDF("id"), table, append = false)
    assert(Snapshots.read(spark, table).as[Long].collect().toSet == Set(9L))
    // ...but every historical snapshot still reads exactly as committed
    assert(Snapshots.read(spark, table, Some(v1)).as[Long].collect().toSet == Set(1L, 2L))
    assert(Snapshots.read(spark, table, Some(v2)).as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(Snapshots.versions(table) == Seq(1L, 2L, 3L))
    assert(v3 == 3L)
  }

  test("a reader's resolved snapshot is immune to later commits") {
    val table = tmpDir("snap-iso") + "/t"
    Snapshots.write(Seq(1L).toDF("id"), table)
    val pinned = Snapshots.read(spark, table) // resolves v1's file list NOW
    Snapshots.write(Seq(2L).toDF("id"), table, append = false)
    // the pinned frame still reads v1's files — overwrite touched nothing it lists
    assert(pinned.as[Long].collect().toSeq == Seq(1L))
    assert(Snapshots.read(spark, table).as[Long].collect().toSeq == Seq(2L))
  }

  test("expireBefore refuses to destroy the current snapshot") {
    val table = tmpDir("snap-guard") + "/t"
    Snapshots.write(Seq(1L).toDF("id"), table)
    intercept[IllegalArgumentException](Snapshots.expireBefore(table, keepFrom = 2L))
    assert(Snapshots.read(spark, table).count() == 1)
  }

  test("vacuum removes only never-published data dirs") {
    val table = tmpDir("snap-vac") + "/t"
    Snapshots.write(Seq(1L).toDF("id"), table)
    // simulate a commit that died between data write and publication
    Seq(7L).toDF("id").write.parquet(s"$table/data/dead-commit")
    val removed = Snapshots.vacuum(table)
    assert(removed == Seq(s"$table/data/dead-commit"))
    assert(Snapshots.read(spark, table).as[Long].collect().toSeq == Seq(1L),
      "published data must survive vacuum")
  }

  test("expireBefore drops old versions but never files still referenced") {
    val table = tmpDir("snap-exp") + "/t"
    Snapshots.write(Seq(1L).toDF("id"), table)            // v1
    Snapshots.write(Seq(2L).toDF("id"), table)            // v2 = {v1 files, new}
    Snapshots.write(Seq(3L).toDF("id"), table)            // v3 = {v1, v2, new}
    val dropped = Snapshots.expireBefore(table, keepFrom = 3L)
    assert(dropped == Seq(1L, 2L))
    assert(Snapshots.versions(table) == Seq(3L))
    // v3 references v1/v2's data dirs, so they must have survived expiry
    assert(Snapshots.read(spark, table).as[Long].collect().toSet == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException](Snapshots.read(spark, table, Some(1L)))
  }
}
