package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic training-data mixture sampling.
  *
  * Composing a training corpus means re-weighting sources: down-sample
  * the over-represented ones, repeat ("epoch") the scarce high-quality
  * ones. Doing that with `rand()` makes every rerun a different corpus
  * and every task retry a correctness bug; the pipeline answer is a
  * CONTENT-KEYED coin — a document is kept (and how many times) as a
  * pure function of its id, so the sample is reproducible row-by-row
  * across reruns, engines, and partitionings.
  *
  * A weight w yields floor(w) guaranteed copies plus one more with
  * probability frac(w), decided by comparing a 24-bit md5 bucket of the
  * id against a precomputed hex threshold — pure string/integer ops that
  * evaluate bit-identically in Spark and DuckDB (SURVEY §4). The whole
  * operator is a narrow projection + generator: no shuffle, no state —
  * it scales embarrassingly.
  */
object Sample {

  /** Zero-padded lowercase 6-hex uniform bucket of `id` in [0, 16^6). */
  def bucketHex(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt + "|"), id.cast("string"))), 1, 6)

  /** Threshold hex for keep-probability `frac` — bucketHex < this keeps. */
  def hexThreshold(frac: Double): String =
    f"${math.floor(frac * (1 << 24)).toLong}%06x"

  /** One output row per sampled COPY: input columns + `copies` (total for
    * the row) + `copy_idx` (1..copies). Rows whose group is absent from
    * `weights` use `defaultWeight`; weight 0 drops the group. */
  def sampleMixture(df: DataFrame, idCol: String, groupCol: String,
                    weights: Map[String, Double], defaultWeight: Double = 1.0,
                    salt: String = "mix"): DataFrame = {
    def copiesFor(w: Double): Column = {
      val base = math.floor(w).toInt
      val frac = w - math.floor(w)
      lit(base) + when(bucketHex(col(idCol), salt) < lit(hexThreshold(frac)), 1)
        .otherwise(0)
    }
    val cascade = weights.toSeq.sortBy(_._1).foldLeft(copiesFor(defaultWeight)) {
      case (acc, (g, w)) => when(col(groupCol) === g, copiesFor(w)).otherwise(acc)
    }
    df.withColumn("copies", cascade)
      .where(col("copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1), col("copies"))))
  }

  /** The demo mixture: source srcN gets weight 0.3 / 0.9 / 1.5 / 2.1 by
    * N % 4 — two down-sampled tiers, two epoch-repeated tiers. */
  val DemoWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> Seq(0.3, 0.9, 1.5, 2.1)(i % 4)).toMap

  /** Query face (`sample_mixture`): the demo mixture over documents. */
  def sampleMixtureQuery(s: SparkSession, dir: String): DataFrame =
    sampleMixture(Tables(s, dir, "documents"), "doc_id", "source", DemoWeights)
      .select(col("doc_id"), col("source"), col("copies").cast("int"),
        col("copy_idx").cast("int"))
      .orderBy(col("doc_id"), col("copy_idx"))

  /** Oracle generated from [[DemoWeights]] — same thresholds, same md5
    * bucket, so the engines can only agree or fail loudly. */
  val mixtureOracle: String = {
    val cases = DemoWeights.toSeq.sortBy(_._1).map { case (g, w) =>
      val base = math.floor(w).toInt
      val thr = hexThreshold(w - math.floor(w))
      s"""    WHEN source = '$g' THEN $base +
         |      CASE WHEN substr(md5('mix|'||CAST(doc_id AS VARCHAR)),1,6) < '$thr'
         |           THEN 1 ELSE 0 END""".stripMargin
    }.mkString("\n")
    s"""WITH c AS (
       |  SELECT doc_id, source,
       |    CASE
       |$cases
       |    ELSE 1 END AS copies
       |  FROM documents)
       |SELECT doc_id, source, CAST(copies AS INTEGER) AS copies,
       |       CAST(i AS INTEGER) AS copy_idx
       |FROM c, unnest(generate_series(1, copies)) AS t(i)
       |WHERE copies > 0
       |ORDER BY doc_id, copy_idx""".stripMargin
  }
}
