package graft.ingest

import org.apache.spark.sql.types._

import graft.SparkSpec

class SchemaDiscoverySpec extends SparkSpec {

  test("discover emits one row per column with inferred types") {
    val d = SchemaDiscovery.discover(spark, sfDir, Seq("region", "nation"))
    val rows = d.collect().map(r => (r.getString(0), r.getString(1), r.getString(3)))
    assert(rows.contains(("region", "r_regionkey", "int")))
    assert(rows.contains(("region", "r_name", "string")))
    assert(rows.count(_._1 == "nation") ==
      spark.read.parquet(s"$sfDir/nation.parquet").schema.length)
  }

  test("ddlFor renders types, nullability and partitioning") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("day", StringType)))
    val ddl = SchemaDiscovery.ddlFor("t1", schema, Seq("day"))
    assert(ddl.contains("CREATE TABLE t1"))
    assert(ddl.contains("id bigint NOT NULL"))
    assert(ddl.contains("day string"))
    assert(ddl.contains("USING parquet"))
    assert(ddl.contains("PARTITIONED BY (day)"))
  }
}
