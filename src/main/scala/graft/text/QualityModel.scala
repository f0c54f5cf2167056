package graft.text

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Model-based quality filtering — the classifier stage of modern curation
  * pipelines (FineWeb-Edu / DCLM train a quality classifier on a labeled
  * seed set and filter the crawl by predicted probability; public method).
  *
  * The operator here is the PLUMBING at scale: cheap per-row feature
  * assembly fused into the scan, one MLlib logistic-regression fit over the
  * (small) labeled seed, then distributed scoring of the full corpus with
  * the broadcast model. Label provenance is the caller's choice — the spec
  * trains on the engine's own rule labels ([[TextAnalysis.qualityScore]]
  * thresholded) purely as a deterministic stand-in for an LLM/human-labeled
  * seed set.
  *
  * Like the MLlib index builds ([[graft.ann.IndexBuild]]), the fit is not
  * SQL-oracle-able; its gate is an invariant spec (agreement with the rule
  * labels on held-out rows), not a hash compare.
  */
object QualityModel {

  /** Feature columns (all cheap codegen column math over the text) — the
    * four rule-quality components from [[TextAnalysis.qualityComponents]]
    * (single source of truth with the rule score) plus a length signal. */
  def featureColumns(text: Column): Seq[(String, Column)] = {
    val n = size(TextFunctions.tokens(text)).cast("double")
    val nz = greatest(n, lit(1.0))
    val (lenSat, stopRatio, uniqueRatio, digitRatio) =
      TextAnalysis.qualityComponents(text, nz)
    Seq(
      "f_len_sat" -> lenSat,
      "f_stop_ratio" -> stopRatio,
      "f_unique_ratio" -> uniqueRatio,
      "f_digit_ratio" -> digitRatio,
      // chars per token INCLUDING separators/punctuation — a coarse
      // verbosity signal, deliberately not "mean token length"
      "f_chars_per_token" -> (length(text).cast("double") / nz))
  }

  /** (id, features vector, original columns) — assembly stage. */
  def withFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val withCols = featureColumns(col(textCol)).foldLeft(docs) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    new VectorAssembler()
      .setInputCols(featureColumns(col(textCol)).map(_._1).toArray)
      .setOutputCol("features")
      .transform(withCols)
  }

  /** Fit on a labeled seed frame (id, text, label∈{0,1}). Deterministic
    * given fixed data (L-BFGS from zero init; fixed iteration budget). */
  def train(seed: DataFrame, labelCol: String = "label",
            textCol: String = "text", maxIter: Int = 50): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(1e-4)
      .setFeaturesCol("features").setLabelCol(labelCol)
      .fit(withFeatures(seed, textCol))

  /** Score a corpus: (…docs columns…, p_keep). The model rides to the
    * executors as a broadcast; scoring is a map-only stage. */
  def score(model: LogisticRegressionModel, docs: DataFrame,
            textCol: String = "text"): DataFrame =
    model.transform(withFeatures(docs, textCol))
      .withColumn("p_keep", round(
        org.apache.spark.ml.functions.vector_to_array(col("probability"))
          .getItem(1), 6))
      .drop("features", "rawPrediction", "probability", "prediction")
      .drop(featureColumns(col(textCol)).map(_._1): _*)
}
