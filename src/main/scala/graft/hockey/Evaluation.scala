package graft.hockey

import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model evaluation (M7-M10, ref code/experiment.py:636-688,789-823).
  *
  * The reference computes the four confusion cells as four separate
  * filter+count jobs plus a fifth job for the displayed matrix (SURVEY
  * §4.2); here one groupBy(label, prediction).count() pass feeds both the
  * matrix and every derived metric — same numbers, 5× fewer jobs.
  */
object Evaluation {

  case class Metrics(accuracy: Double, auc: Double, precision: Double,
      recall: Double, f1: Double, confusion: Map[(Double, Double), Long])

  /** M7+M8: AUC via MLlib evaluator + confusion-derived metrics from a
    * single grouped count. */
  def evaluate(predictions: DataFrame): Metrics = {
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label_binary").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC")
      .evaluate(predictions)
    val cells = predictions
      .groupBy(col("label_binary"), col("prediction"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    def cell(label: Double, pred: Double): Long = cells.getOrElse((label, pred), 0L)
    val (tp, tn, fp, fn) = (cell(1, 1), cell(0, 0), cell(0, 1), cell(1, 0))
    val total = tp + tn + fp + fn
    val accuracy = if (total > 0) (tp + tn).toDouble / total else 0.0
    val precision = if (tp + fp > 0) tp.toDouble / (tp + fp) else 0.0
    val recall = if (tp + fn > 0) tp.toDouble / (tp + fn) else 0.0
    val f1 = if (precision + recall > 0) 2 * precision * recall / (precision + recall) else 0.0
    Metrics(accuracy, auc, precision, recall, f1, cells)
  }

  case class Baselines(majorityClass: Double, weightedRandom: Double,
      coinFlip: Double = 0.5)

  /** M10 (ref code/experiment.py:789-823): sanity baselines from the test
    * label distribution — majority-class rate, p²+(1−p)², coin flip. One
    * grouped count instead of two filtered counts. */
  def baselines(test: DataFrame): Baselines = {
    val counts = test.groupBy(col("label_binary")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val wins = counts.getOrElse(1.0, 0L)
    val notWins = counts.getOrElse(0.0, 0L)
    val total = math.max(wins + notWins, 1L)
    val p = wins.toDouble / total
    Baselines(
      majorityClass = math.max(p, 1 - p),
      weightedRandom = p * p + (1 - p) * (1 - p))
  }

  def format(name: String, m: Metrics): String = {
    f"""|=== $name (Binary: Win vs Not Win) ===
        |Accuracy:  ${m.accuracy}%.4f
        |AUC-ROC:   ${m.auc}%.4f
        |Precision: ${m.precision}%.4f
        |Recall:    ${m.recall}%.4f
        |F1 Score:  ${m.f1}%.4f""".stripMargin
  }
}
