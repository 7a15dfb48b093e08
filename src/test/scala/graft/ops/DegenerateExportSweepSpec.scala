package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Round-12 degenerate-corpus sweep over the WHOLE query registry — with
  * special interest in the 26 round-11 oracle-promoted faces, whose
  * export→replay machinery had no empty-corpus / single-row evidence
  * (round-11 verdict, task 3).
  *
  * Contract: on an all-tables-EMPTY zone and an all-tables-ONE-ROW zone
  * (schemas identical to the driver testdata; the one-row zone has no
  * referential integrity — a lineitem row whose order does not exist —
  * exactly what a heavily-filtered 100 TB partition can look like),
  * every face must PLAN and EXECUTE without throwing. Empty in, empty
  * (or empty-aggregate) out — never an NPE off a `.head` on a collected
  * empty frame, a divide-by-zero off an empty denominator, or a kmeans
  * seed selection off zero vectors. */
class DegenerateExportSweepSpec extends SparkSpec {

  /** A zone with every sf0.001 table truncated to `n` rows (schema kept). */
  private def truncatedZone(n: Int): String = {
    val dir = tmpDir(s"degsweep$n")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(n)
        .write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val emptyZone = truncatedZone(0)
  private lazy val oneRowZone = truncatedZone(1)

  /** Every registered face; failures collected so ONE assert reports the
    * full list instead of dying on the first. */
  private def sweep(dir: String, label: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, dir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(160)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} faces fail on the $label corpus:\n  ${failures.mkString("\n  ")}")
  }

  test("every query face survives an EMPTY corpus (all tables zero rows)") {
    sweep(emptyZone, "empty")
  }

  test("every query face survives a ONE-ROW corpus (all tables one row, no referential integrity)") {
    sweep(oneRowZone, "one-row")
  }

  test("exporting faces write a readable (possibly empty) side table on an empty corpus") {
    // the export→replay contract half the gate can't see: after a face
    // runs on a degenerate corpus, its exported learned-state parquet
    // must still be a READABLE table (an oracle replay reads it as data;
    // an unreadable/missing export would fail the NEXT gate run)
    VectorQueries.simSearchIvf(spark, emptyZone)
      .write.format("noop").mode("overwrite").save()
    val cents = spark.read.parquet(VectorQueries.IvfCentsPath)
    assert(cents.columns.toSeq == Seq("cluster", "ce", "cn"),
      s"empty-corpus export must keep the schema: ${cents.columns.toSeq}")
    assert(cents.count() == 0L, "no vectors -> no centroids, not a crash")
  }
}
