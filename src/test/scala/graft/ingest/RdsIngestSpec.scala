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
}
