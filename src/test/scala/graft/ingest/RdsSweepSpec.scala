package graft.ingest

import java.sql.DriverManager

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Multi-table sweep against in-JVM Derby: full + partitioned-incremental
  * branches in one config, with an induced mid-sweep failure that must not
  * abort the remaining legs. */
class RdsSweepSpec extends SparkSpec {

  private lazy val url = {
    val u = "jdbc:derby:memory:sweepspec;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE CUSTOMERS (ID BIGINT PRIMARY KEY, NAME VARCHAR(20))")
    (1 to 10).foreach(i => st.execute(s"INSERT INTO CUSTOMERS VALUES ($i, 'c$i')"))
    st.execute("CREATE TABLE EVENTS2 (ID BIGINT PRIMARY KEY, KIND VARCHAR(10))")
    (1 to 7).foreach(i => st.execute(s"INSERT INTO EVENTS2 VALUES ($i, 'k')"))
    st.execute("CREATE TABLE SALES (SID BIGINT PRIMARY KEY, TS TIMESTAMP, AMT DOUBLE)")
    (1 to 6).foreach(i => st.execute(
      s"INSERT INTO SALES VALUES ($i, TIMESTAMP('2024-01-0${(i % 3) + 1} 10:00:0$i'), ${i * 2.5})"))
    st.close(); conn.close()
    u
  }

  // MISSING sorts mid-sweep (CUSTOMERS < EVENTS2 < MISSING < SALES): its
  // failure must leave legs on BOTH sides green
  private def config = {
    import spark.implicits._
    Seq(
      ("CUSTOMERS", "N", null: String, null: java.lang.Long),
      ("EVENTS2", "N", null: String, null: java.lang.Long),
      ("MISSING", "N", null: String, null: java.lang.Long),
      ("SALES", "Y", "TS", 2L: java.lang.Long))
      .toDF("TABLE", "PARTITIONED", "PARTITIONKEY", "NUM_PARTITIONS")
  }

  private def byTable(report: org.apache.spark.sql.DataFrame): Map[String, Row] =
    report.collect().map(r => r.getAs[String]("table_name") -> r).toMap

  test("one call sweeps N tables; an induced failure isolates to its leg") {
    val dest = tmpDir("rds_sweep")
    val r1 = byTable(RdsSweep.run(spark, url, config, dest))
    assert(r1.size == 4)
    assert(r1("CUSTOMERS").getAs[Any]("mode") == "full" && r1("CUSTOMERS").getAs[Any]("status") == "ok"
      && r1("CUSTOMERS").getAs[Any]("rows_written") == 10L)
    assert(r1("EVENTS2").getAs[Any]("status") == "ok" && r1("EVENTS2").getAs[Any]("rows_written") == 7L)
    assert(r1("MISSING").getAs[Any]("status") == "failed"
      && r1("MISSING").getAs[String]("error") != null)
    assert(r1("SALES").getAs[Any]("mode") == "init" && r1("SALES").getAs[Any]("status") == "ok"
      && r1("SALES").getAs[Any]("rows_written") == 6L)

    // the partitioned leg derived the reference's yyyy-MM-dd layout
    val days = new java.io.File(s"$dest/SALES").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("parkey=")).sorted
    assert(days.toSeq == Seq("parkey=2024-01-01", "parkey=2024-01-02", "parkey=2024-01-03"))

    // day 2: three new SALES rows; CUSTOMERS re-overwrites; EVENTS2 unchanged
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    (7 to 9).foreach(i => st.execute(
      s"INSERT INTO SALES VALUES ($i, TIMESTAMP('2024-01-04 09:00:0$i'), ${i * 2.5})"))
    st.close(); conn.close()

    val r2 = byTable(RdsSweep.run(spark, url, config, dest))
    assert(r2("SALES").getAs[Any]("mode") == "append" && r2("SALES").getAs[Any]("status") == "ok"
      && r2("SALES").getAs[Any]("rows_written") == 3L,
      s"incremental leg must append only the fresh rows: ${r2("SALES")}")
    assert(r2("CUSTOMERS").getAs[Any]("mode") == "full" && r2("CUSTOMERS").getAs[Any]("rows_written") == 10L)
    assert(r2("MISSING").getAs[Any]("status") == "failed")
    val sales = spark.read.parquet(s"$dest/SALES")
    assert(sales.count() == 9)
    assert(sales.where(col(RdsSweep.PartitionCol) === "2024-01-04").count() == 3)

    // day 3: nothing new upstream — the incremental leg reports empty
    val r3 = byTable(RdsSweep.run(spark, url, config, dest))
    assert(r3("SALES").getAs[Any]("mode") == "append" && r3("SALES").getAs[Any]("status") == "empty"
      && r3("SALES").getAs[Any]("rows_written") == 0L)
    assert(spark.read.parquet(s"$dest/SALES").count() == 9, "empty append must not duplicate")
  }
}
