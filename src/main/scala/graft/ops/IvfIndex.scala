package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized IVF ANN index with streaming maintenance — D12, the
  * vector-side twin of [[IncrementalIndex]] (which maintains the dedup
  * keys the same way). The C16a query derives centroids + posting lists
  * inline per run; a production corpus that arrives as a FEED maintains
  * them as lake tables and runs the cycle:
  *
  *   build (offline k-means) → admit micro-batches stream-side against
  *   the FROZEN centroids → probe any time → retrain offline when drift
  *   warrants, reassigning the posting lists.
  *
  * Two parquet tables under one root:
  *   - `centroids`: (cluster, ce, cn)           — the [[KMeans]] fit
  *   - `postings`:  (cluster, vec_id, e, nrm)   — the inverted file
  *
  * The streaming admit is the honest scale design: assignment to the
  * nearest EXISTING centroid is the same narrow broadcast argmax the
  * batch build uses (one [[graft.functions.NearestCentroids]] projection
  * — no shuffle of the stream), run per micro-batch via foreachBatch so
  * the centroid table is RE-READ each batch — an offline retrain lands
  * without restarting the stream (the D11 re-planning property). New
  * vectors are immediately searchable in their posting list; only the
  * PARTITION QUALITY decays as the corpus drifts from the frozen
  * centroids, which is exactly what [[retrain]] repairs — the
  * IVF-index maintenance split every production ANN service runs
  * (continuous cheap admits, periodic expensive re-partitions).
  * IvfIndexSpec proves the replay: stream-admitted postings equal the
  * batch assignment, and after retrain the index's probe results equal
  * the C16a inline build on the same corpus.
  */
object IvfIndex {

  /** Assign each vector of `v` (vec_id, e, nrm) to its nearest centroid
    * — the shared narrow projection: centroids fold into ONE broadcast
    * row, assignment is a per-row argmax, ties break to the lowest
    * cluster id (array_sort + NearestCentroids, the C16 rule). */
  def assign(v: DataFrame, centroids: DataFrame): DataFrame = {
    val centsArr = centroids.agg(array_sort(collect_list(
      struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    v.crossJoin(broadcast(centsArr))
      .select(
        graft.functions.NearestCentroids(col("e"), col("cents"), 1)
          .getItem(0).as("cluster"),
        col("vec_id"), col("e"), col("nrm"))
  }

  /** Create (overwrite) the index: offline k-means on the standing
    * corpus, then one assignment pass builds the inverted file. */
  def build(root: String, v: DataFrame, k: Int, iters: Int): Unit = {
    val fit = KMeans.fit(v, k, iters, rows = v.count())
    fit.centroids.write.mode("overwrite").parquet(s"$root/centroids")
    assign(v, fit.centroids).write.mode("overwrite").parquet(s"$root/postings")
  }

  /** Admit a streaming feed of vectors into the posting lists. `stream`
    * is a streaming frame with (vec_id, embedding); each micro-batch is
    * assigned against the centroid table AS STORED AT THAT BATCH (the
    * read sits inside foreachBatch, so a retrain is picked up on the
    * next batch without a restart) and appended — the index grows by
    * exactly the admitted rows, no rewrite. Returns the started query;
    * the caller owns its lifecycle. */
  def admitStream(s: SparkSession, root: String, stream: DataFrame,
                  checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val v = Vectors.withNorm(batch, "embedding")
          .select(col("vec_id"), col("e"), col("nrm"))
        assign(v, s.read.parquet(s"$root/centroids"))
          .write.mode("append").parquet(s"$root/postings")
      }
      .start()

  /** IVF search against the STORED index: each query probes its
    * `nprobe` closest centroids' posting lists (equi-join on cluster —
    * bucket-bounded), exact cosine rescores, top-`topK` ranks. The
    * C16 search shape over tables instead of an inline build. */
  def probe(s: SparkSession, root: String, queries: DataFrame,
            nprobe: Int = 2, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = s.read.parquet(s"$root/centroids")
    val postings = s.read.parquet(s"$root/postings")
    val centsArr = centroids.agg(array_sort(collect_list(
      struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    val probes = queries.crossJoin(broadcast(centsArr))
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("nrm").as("qn"),
        explode(graft.functions.NearestCentroids(col("e"), col("cents"), nprobe))
          .as("cluster"))
    val cos = Vectors.cosine(col("qe"), col("e"), col("qn"), col("nrm"))
    val scored = postings.join(probes, Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), round(cos, 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", rank().over(w))
      .where(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"), col("vec_id"))
  }

  /** Offline re-partition: re-run k-means over everything admitted so
    * far and rebuild BOTH tables (the periodic repair of partition
    * quality; the posting rows themselves never change identity, only
    * their cluster keys). The postings read is localCheckpoint'ed
    * first so the overwrite never races its own scan. */
  def retrain(s: SparkSession, root: String, k: Int, iters: Int): Unit = {
    val v = s.read.parquet(s"$root/postings")
      .select(col("vec_id"), col("e"), col("nrm"))
      .localCheckpoint(true)
    val fit = KMeans.fit(v, k, iters, rows = v.count())
    fit.centroids.write.mode("overwrite").parquet(s"$root/centroids")
    assign(v, fit.centroids).write.mode("overwrite").parquet(s"$root/postings")
  }
}
