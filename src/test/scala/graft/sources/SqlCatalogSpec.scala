package graft.sources

import graft.{SparkEntry, SparkSpec}

/** The reference-user migration path: its query surface is SQL
  * (Athena/Presto), so the ANSI-dialect oracle queries must run on
  * `spark.sql` verbatim once the zone is registered, and must produce
  * exactly what the DataFrame faces produce. (Oracle strings that lean
  * on DuckDB-only syntax — `//`, string_split, list_* — are excluded;
  * they exist for the DuckDB comparator, not the user surface.) */
class SqlCatalogSpec extends SparkSpec {

  private val ansiQueries =
    Seq("q1_pricing_summary", "q2_revenue_filter", "q20_prospects",
      "q21_waiting_supplier", "q22_dominant_supplier", "q25_cube_revenue")

  test("ANSI oracle SQL runs verbatim on spark.sql and matches the DataFrame face") {
    Tables.registerAll(spark, sfDir)
    var totalRows = 0
    for (q <- ansiQueries) {
      val viaSql = spark.sql(SparkEntry.oracleSql(q)).collect().map(_.toSeq).toSeq
      val viaDf = SparkEntry.queries(q)(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(viaSql == viaDf, s"$q: SQL face diverges from the DataFrame face")
      totalRows += viaSql.size
    }
    // some queries are legitimately empty at sf0.001 (q20's prospects);
    // the suite as a whole must exercise real rows
    assert(totalRows > 50, s"only $totalRows rows across the SQL surface")
  }
}
