package graft.hockey

import org.apache.spark.ml.{Pipeline => MlPipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, MultilayerPerceptronClassifier, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler

/** The four model pipelines (M1-M6, ref code/experiment.py:617-619,697-781).
  * Same JVM MLlib classes the reference drives through py4j, same
  * hyperparameters and seeds — so on identical input the fits match.
  *
  * `ModelConfig` scales the expensive knobs down for tests (the reference's
  * exact settings are the defaults).
  */
object Models {

  case class ModelConfig(
      rfNumTrees: Int = 200, rfMaxDepth: Int = 10,
      lrMaxIter: Int = 100, lrRegParam: Double = 0.01, lrElasticNet: Double = 0.8,
      gbtMaxIter: Int = 100, gbtMaxDepth: Int = 8,
      mlpMaxIter: Int = 100, mlpBlockSize: Int = 128,
      seed: Long = 42L)

  /** M1 (ref code/experiment.py:617-619): 25 doubles → features vector. */
  def assembler: VectorAssembler = new VectorAssembler()
    .setInputCols(Schemas.featureCols.toArray)
    .setOutputCol("features")
    .setHandleInvalid("skip")

  /** M2 (ref code/experiment.py:697-703). */
  def randomForest(cfg: ModelConfig = ModelConfig()): MlPipeline =
    new MlPipeline().setStages(Array(assembler,
      new RandomForestClassifier()
        .setLabelCol("label_binary").setFeaturesCol("features")
        .setNumTrees(cfg.rfNumTrees).setMaxDepth(cfg.rfMaxDepth)
        .setSeed(cfg.seed)))

  /** M3 (ref code/experiment.py:719-726). */
  def logisticRegression(cfg: ModelConfig = ModelConfig()): MlPipeline =
    new MlPipeline().setStages(Array(assembler,
      new LogisticRegression()
        .setLabelCol("label_binary").setFeaturesCol("features")
        .setMaxIter(cfg.lrMaxIter).setRegParam(cfg.lrRegParam)
        .setElasticNetParam(cfg.lrElasticNet).setFamily("binomial")))

  /** M4 (ref code/experiment.py:743-749). */
  def gbt(cfg: ModelConfig = ModelConfig()): MlPipeline =
    new MlPipeline().setStages(Array(assembler,
      new GBTClassifier()
        .setLabelCol("label_binary").setFeaturesCol("features")
        .setMaxIter(cfg.gbtMaxIter).setMaxDepth(cfg.gbtMaxDepth)
        .setSeed(cfg.seed)))

  /** M5 (ref code/experiment.py:767-777): layers fixed to
    * [|features|, 64, 32, 2]. */
  def mlp(cfg: ModelConfig = ModelConfig()): MlPipeline =
    new MlPipeline().setStages(Array(assembler,
      new MultilayerPerceptronClassifier()
        .setLabelCol("label_binary").setFeaturesCol("features")
        .setLayers(Array(Schemas.featureCols.size, 64, 32, 2))
        .setMaxIter(cfg.mlpMaxIter).setBlockSize(cfg.mlpBlockSize)
        .setSeed(cfg.seed)))

  def all(cfg: ModelConfig = ModelConfig()): Seq[(String, MlPipeline)] = Seq(
    "Random Forest" -> randomForest(cfg),
    "Logistic Regression" -> logisticRegression(cfg),
    "Gradient Boosted Trees" -> gbt(cfg),
    "Multilayer Perceptron" -> mlp(cfg))

  /** M9 (ref code/experiment.py:39-54): top-k feature importances from any
    * tree-ensemble final stage. */
  def topFeatureImportances(model: PipelineModel, k: Int = 10): Seq[(String, Double)] = {
    val importances = model.stages.last match {
      case m: org.apache.spark.ml.classification.RandomForestClassificationModel =>
        m.featureImportances.toArray
      case m: org.apache.spark.ml.classification.GBTClassificationModel =>
        m.featureImportances.toArray
      case _ => Array.empty[Double]
    }
    Schemas.featureCols.zip(importances).sortBy(-_._2).take(k)
  }
}
