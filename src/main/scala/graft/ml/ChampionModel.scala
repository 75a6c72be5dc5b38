package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Championship-probability model — the reference's sklearn pipeline
  * (scripts/05_ml_model.py:131-247) re-expressed as a distributed MLlib
  * Pipeline: imputers → VectorAssembler (sklearn needs none) →
  * RandomForestClassifier.
  *
  * Config mapping (SURVEY.md M3): sklearn RandomForestClassifier
  * defaults = 100 trees, gini, unlimited depth, min_samples_leaf=20,
  * seed 42 → MLlib setNumTrees(100), setMinInstancesPerNode(20),
  * setSeed(42); MLlib's default maxDepth=5 is raised explicitly (MLlib
  * caps depth (30) where sklearn doesn't — metric-level parity only,
  * exact tree parity is not achievable across learners).
  *
  * Everything stays in DataFrames end-to-end — no driver-side matrix
  * (the reference's toPandas handoff is the anti-pattern at 100 TB).
  */
object ChampionModel {

  case class Metrics(accuracy: Double, auc: Double)

  val labelCol = "fl_champ"

  def pipeline(featureCols: Seq[String],
               impute99: Seq[String] = Nil,
               impute0: Seq[String] = Nil): Pipeline = {
    val imp99 = new ArbitraryNumberImputer().setFillValue(99.0)
      .setInputCols(impute99.toArray)
    val imp0 = new ArbitraryNumberImputer().setFillValue(0.0)
      .setInputCols(impute0.toArray)
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .setHandleInvalid("keep")
    val rf = new RandomForestClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setNumTrees(100).setMinInstancesPerNode(20).setSeed(42)
      .setMaxDepth(20)
      // pinned explicitly (MLlib's "auto" resolves to sqrt for multi-tree
      // classification today — a default change must not silently change
      // the fitted forest the golden-hash spec records)
      .setFeatureSubsetStrategy("sqrt")
    val stages = Seq(
      Option.when(impute99.nonEmpty)(imp99),
      Option.when(impute0.nonEmpty)(imp0),
      Some(assembler), Some(rf)).flatten
    new Pipeline().setStages(stages.toArray)
  }

  def fit(train: DataFrame, featureCols: Seq[String],
          impute99: Seq[String] = Nil, impute0: Seq[String] = Nil): PipelineModel =
    pipeline(featureCols, impute99, impute0).fit(train)

  /** Score: adds `prediction` and `p_champ` = P(label=1). */
  def score(model: PipelineModel, df: DataFrame): DataFrame =
    model.transform(df)
      .withColumn("p_champ", vector_to_array(col("probability")).getItem(1))

  /** M6+M7: accuracy + ROC AUC on a scored frame. */
  def evaluate(scored: DataFrame): Metrics = {
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
      .setMetricName("accuracy").evaluate(scored)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol(labelCol).setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(scored)
    Metrics(acc, auc)
  }

  /** M8: feature importances > 0, descending, top-k (reference
    * scripts/05_ml_model.py:238-245). */
  def featureImportances(model: PipelineModel, featureCols: Seq[String],
                         topK: Int = 20): Seq[(String, Double)] = {
    val rf = model.stages.last.asInstanceOf[RandomForestClassificationModel]
    featureCols.zip(rf.featureImportances.toArray)
      .filter(_._2 > 0).sortBy(-_._2).take(topK)
  }
}
