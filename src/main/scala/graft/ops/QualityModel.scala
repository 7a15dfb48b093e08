package graft.ops

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** C60: MODEL-BASED quality filtering — the learned face of the C9/C46
  * heuristic rules. Every frontier-scale pipeline pairs its rule
  * battery with a trained discriminator ("quality classifier": GPT-3
  * appendix A; CCNet; LLaMA) that scores how much a document resembles
  * a curated reference corpus versus junk, because rules catch the
  * failure modes someone thought of and a classifier catches the rest.
  *
  * Labels are built deterministically, with no external model: the
  * positive class is the natural corpus text; the negative class is a
  * CORRUPTED variant of a disjoint document set (stopwords and short
  * tokens stripped, the rest uppercased and fused without spaces —
  * the boilerplate/machine-mangled shape real crawls are full of).
  * Train/held-out split is a content-keyed md5 coin like every §2
  * sampling face, so membership is stable under repartitioning and
  * rerun — QualityModelSpec proves held-out AUC, class separation,
  * split disjointness, and determinism.
  *
  * Spark-first shape: features are ONE narrow pass — a 256-bucket
  * HashingTF over whitespace tokens plus the native TokenMarkerStats
  * scalars, assembled with VectorAssembler; training is spark.ml
  * LogisticRegression (distributed L-BFGS over treeAggregate'd
  * gradients — mllib's own 100 TB design); scoring broadcasts a
  * coefficient vector measured in KB. At full scale the standard
  * posture applies: FIT on a sample (the train split here), TRANSFORM
  * everywhere.
  *
  * Reference tie-in: the reference pipeline routes rows by config
  * validity (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:117–150,
  * UNMATCH/OUTOFCONFIG classes); this is the same admit/reject gate
  * generalized to learned content quality.
  */
object QualityModel {

  private val NumFeatures = 256

  /** Deterministic "junk" rendering of a text column: drop stopword-ish
    * short tokens, uppercase and fuse the rest — kills exactly the
    * signals (stopword ratio, token length, casing, whitespace) that
    * separate natural prose from mangled boilerplate. */
  private[ops] def corrupt(text: org.apache.spark.sql.Column) =
    array_join(transform(
      filter(split(text, "\\s+"), t => length(t) > lit(3)),
      t => upper(t)), "")

  /** Labeled corpus: even doc_ids stay natural (label 1), odd doc_ids
    * are replaced by their corrupted rendering (label 0) — disjoint
    * halves, so the classifier never sees the same content on both
    * sides. `split` tags each row train/test by a content-keyed coin
    * (~80/20). */
  private[ops] def labeled(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
    val tagged = d.select(col("doc_id"), col("source"),
      when(col("doc_id") % 2 === 0, col("text")).otherwise(corrupt(col("text"))).as("text"),
      when(col("doc_id") % 2 === 0, 1.0).otherwise(0.0).as("label"))
    tagged.withColumn("split",
      when(conv(substring(md5(concat(lit("qm|"), col("doc_id").cast("string"))), 1, 6),
        16, 10).cast("long") % 5 < 4, "train").otherwise("test"))
  }

  /** One-pass feature frame: HashingTF(256) over whitespace tokens +
    * the TokenMarkerStats scalars (token count, stopword ratio, mean
    * alpha token length, regex-token ratio), assembled into `feat`.
    * Narrow/stateless by construction, so it runs unchanged on a
    * STREAMING frame — the D15 face scores intake with it.
    * NULL text coalesces to "" BEFORE featurization: spark.ml's
    * HashingTF UDF throws an NPE on a null token array, which on the
    * streaming face would kill the whole intake query the moment one
    * null document arrives (probed; StreamingQualitySpec pins the
    * guard) — a null doc now featurizes as empty content and scores
    * like the junk it is. */
  private[graft] def featurize(df: DataFrame): DataFrame = {
    val txt = coalesce(col("text"), lit(""))
    val st = graft.functions.TokenMarkerStats(txt)
    val nTok = greatest(col("st.ws_tokens").cast("double"), lit(1.0))
    val base = df
      .withColumn("st", st)
      .withColumn("tokens", split(txt, "\\s+"))
      .withColumn("f_ntok", least(col("st.ws_tokens").cast("double") / 100.0, lit(3.0)))
      .withColumn("f_stop", col("st.stop").cast("double") / nTok)
      .withColumn("f_alen", least(col("st.alpha_len").cast("double") / nTok, lit(30.0)))
      .withColumn("f_re", col("st.re_tokens").cast("double") / nTok)
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("tf")
      .setNumFeatures(NumFeatures).setBinary(true)
    new VectorAssembler()
      .setInputCols(Array("tf", "f_ntok", "f_stop", "f_alen", "f_re"))
      .setOutputCol("feat")
      .transform(tf.transform(base))
  }

  private def lr = new LogisticRegression()
    .setFeaturesCol("feat").setLabelCol("label")
    .setMaxIter(30).setRegParam(0.01).setElasticNetParam(0.0)

  /** Fit the gate model on the train split — the artifact every scoring
    * face (batch card, D15 stream) broadcasts; KBs of coefficients. */
  def fitGate(s: SparkSession, dir: String): org.apache.spark.ml.classification.LogisticRegressionModel =
    lr.fit(featurize(labeled(s, dir)).where(col("split") === "train"))

  /** Fit on the train split, return every row scored with
    * P(natural | features). Deterministic: LR from a zero start under
    * L-BFGS has no random state; the only float jitter is aggregation
    * order, spec-bounded. */
  private[ops] def scored(s: SparkSession, dir: String): DataFrame = {
    val all = featurize(labeled(s, dir)).localCheckpoint(true)
    val train = all.where(col("split") === "train")
    if (train.isEmpty) // no trainable rows (empty/near-empty corpus):
      return all.where(lit(false)) // no model — the documented empty card
        .select(col("doc_id"), col("source"), col("label"), col("split"),
          lit(0.5).as("score"))
    val model = lr.fit(train)
    model.transform(all)
      .select(col("doc_id"), col("source"), col("label"), col("split"),
        element_at(vector_to_array(col("probability")), 2).as("score"))
  }

  /** C60 query face: the corpus quality-gate card — per source, docs
    * scored, mean classifier score of the NATURAL half (the corrupted
    * half is synthetic training material, not corpus), and the share
    * (integer basis points) that clears the 0.5 keep gate. */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    scored(s, dir)
      .where(col("label") === 1.0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        round(avg(col("score")), 3).as("avg_score"),
        sum(when(col("score") >= 0.5, 1L).otherwise(0L)).as("kept"))
      .select(col("source"), col("docs"), col("avg_score"),
        expr("kept * 10000 div docs").as("keep_bp"))
      .orderBy(col("source"))
}
