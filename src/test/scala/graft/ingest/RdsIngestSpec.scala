package graft.ingest

import java.sql.DriverManager

import graft.SparkSpec

/** JDBC ingest against an in-JVM Derby database (the embedded DB Spark
  * already ships for its metastore) — a real remote-source read path,
  * no network required. */
class RdsIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = {
    val u = s"jdbc:derby:memory:rdsspec;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE ORDERS (ID BIGINT PRIMARY KEY, AMOUNT DOUBLE)")
    (1 to 100).foreach(i => st.execute(s"INSERT INTO ORDERS VALUES ($i, ${i * 1.5})"))
    st.close(); conn.close()
    u
  }

  test("full read round-trips the remote table") {
    val df = RdsIngest.read(spark, url, "ORDERS")
    assert(df.count() == 100)
    assert(df.agg(org.apache.spark.sql.functions.sum("AMOUNT")).head().getDouble(0)
      == (1 to 100).map(_ * 1.5).sum)
  }

  test("range-partitioned read fans out over parallel cursors") {
    val df = RdsIngest.read(spark, url, "ORDERS",
      bounds = Some(("ID", 1L, 100L, 4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
  }

  test("incremental read pushes the watermark to the remote scan, fans out") {
    val ingested = (1L to 90L).toDF("ID")
    val fresh = RdsIngest.readIncremental(spark, url, "ORDERS", "ID", ingested,
      numPartitions = 2)
    val ids = fresh.select("ID").as[Long].collect().sorted
    assert(ids.toSeq == (91L to 100L))
    assert(fresh.rdd.getNumPartitions == 2,
      "fresh span must fan out over the requested cursors")
    val plan = fresh.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(ID,90)"),
      s"watermark must appear as a pushed JDBC filter:\n$plan")
    // empty increment: nothing newer than the max key
    val upToDate = (1L to 100L).toDF("ID")
    assert(RdsIngest.readIncremental(spark, url, "ORDERS", "ID", upToDate).count() == 0)
  }

  test("cold start (empty ledger) still fans out over parallel cursors") {
    val nothing = Seq.empty[Long].toDF("ID")
    val full = RdsIngest.readIncremental(spark, url, "ORDERS", "ID", nothing,
      numPartitions = 4)
    assert(full.count() == 100)
    assert(full.rdd.getNumPartitions == 4,
      "the largest read the function does must not serialize on one cursor")
  }

  test("integer (non-long) key columns do not crash the watermark read") {
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE EVENTS_I (IK INT PRIMARY KEY)")
    (1 to 20).foreach(i => st.execute(s"INSERT INTO EVENTS_I VALUES ($i)"))
    st.close(); conn.close()
    val ingested = (1 to 15).toDF("IK")
    val fresh = RdsIngest.readIncremental(spark, url, "EVENTS_I", "IK", ingested)
    assert(fresh.select("IK").as[Int].collect().sorted.toSeq == (16 to 20))
  }
}
