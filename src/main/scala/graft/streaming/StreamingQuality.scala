package graft.streaming

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.QualityModel

/** D15: the C60 LEARNED quality gate run inline on the intake feed —
  * the D10 pipeline's heuristic gate upgraded to the trained
  * discriminator, so junk is scored out the moment it arrives instead
  * of at the nightly sweep.
  *
  * STATELESS by construction: featurization is the same narrow
  * one-pass projection as the batch face (native TokenMarkerStats +
  * binary HashingTF + VectorAssembler — QualityModel.featurize runs
  * unchanged on a streaming frame), and the model is a KB-sized
  * coefficient vector applied per row by spark.ml transform. No
  * aggregation, no watermark, no state store — StreamingQualitySpec
  * pins `stateOperators` empty. Fit batch-side
  * ([[QualityModel.fitGate]] — fit-on-sample, transform-everywhere).
  *
  * One honest operational note: the coefficients are baked into the
  * plan, so a nightly refit lands by restarting the query with the new
  * model — unlike the D11/D14 static JOIN sides, which re-plan per
  * micro-batch. That is the right trade: a model is versioned-artifact
  * shaped (you want an explicit cutover), an index is
  * current-table shaped (you want it picked up silently).
  */
object StreamingQuality {

  /** Score an arriving documents frame (needs `text`): original
    * columns + `q_score` = P(natural | features). */
  def scoreStream(docs: DataFrame, model: LogisticRegressionModel): DataFrame =
    model.transform(QualityModel.featurize(docs))
      .withColumn("q_score", element_at(vector_to_array(col("probability")), 2))
      .drop("st", "tokens", "f_ntok", "f_stop", "f_alen", "f_re", "tf", "feat",
        "rawPrediction", "probability", "prediction")

  /** The admit gate: arrivals scoring below `threshold` drop. */
  def gateStream(docs: DataFrame, model: LogisticRegressionModel,
      threshold: Double = 0.5): DataFrame =
    scoreStream(docs, model).where(col("q_score") >= threshold)
}
