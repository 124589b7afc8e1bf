package graft.hockey

import graft.SparkSpec

/** Re-derives the committed end-to-end run artifact `hockey_run.json`
  * (VERDICT r11 #6 — the §2 port was unit/e2e tested, but no committed
  * artifact pinned the full Experiment CLI run the way bench.json pins the
  * gates; this closes the loop on the reference's golden-log practice,
  * ref README.md:153-253 / output.txt).
  *
  * The artifact is produced by the CLI itself:
  *   SPARK_GRAFT_CPUS=4 sbt "runMain graft.hockey.Experiment
  *     --events /root/reference/data/Sample_NHL_EventData.csv
  *     --results /root/reference/data/Sample_results.csv
  *     --fast --json hockey_run.json"
  * (cpus pinned to 4 = this suite's session, so the seeded fits see the
  * same partitioning and the whole report — counts AND metrics — is
  * bit-reproducible, not range-checked).
  */
class HockeyRunArtifactSpec extends SparkSpec {

  private val eventsCsv = "/root/reference/data/Sample_NHL_EventData.csv"
  private val resultsCsv = "/root/reference/data/Sample_results.csv"

  private def field(json: String, key: String): String = {
    val m = ("\"" + key + "\":([0-9.eE+-]+)").r.findFirstMatchIn(json)
    assert(m.nonEmpty, s"hockey_run.json missing field $key")
    m.get.group(1)
  }

  test("the committed hockey_run.json is re-derived by a fresh Experiment.run") {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("hockey_run.json")), "UTF-8")

    val report = Experiment.run(spark,
      Experiment.Opts(eventsCsv, resultsCsv, fast = true))

    // golden counts, exact: one row per (game, team), two per game
    assert(field(json, "game_team_rows").toLong == report.gameTeamRows)
    assert(field(json, "rows_per_game").toInt == 2)
    assert(report.gameTeamRows == 2 * report.matchups)
    assert(field(json, "matchups").toLong == report.matchups)
    assert(field(json, "train_rows").toLong == report.trainRows)
    assert(field(json, "test_rows").toLong == report.testRows)
    assert(field(json, "test_season").toInt == report.testSeason)
    assert(report.trainRows + report.testRows == report.matchups)

    // the artifact covers all four model pipelines
    for (name <- Seq("Random Forest", "Logistic Regression",
        "Gradient Boosted Trees", "Multilayer Perceptron"))
      assert(report.metrics.contains(name), s"run lost model $name")

    // metrics, reproduced to artifact precision (6 dp): same data, same
    // seeds, same partitioning => same fits
    val metricsBlock = json.substring(json.indexOf("\"models\""))
    def recorded(model: String, metric: String): Double = {
      val seg = metricsBlock.substring(metricsBlock.indexOf("\"" + model + "\""))
      field(seg, metric).toDouble
    }
    for ((name, m) <- report.metrics; (metric, v) <- Seq(
        "accuracy" -> m.accuracy, "auc" -> m.auc, "precision" -> m.precision,
        "recall" -> m.recall, "f1" -> m.f1)) {
      assert(v >= 0.0 && v <= 1.0, s"$name $metric out of range: $v")
      assert(math.abs(recorded(name, metric) - v) <= 5e-7 + 1e-9,
        s"$name $metric drifted: artifact ${recorded(name, metric)}, run $v")
    }
    for ((name, m) <- report.metrics)
      assert(m.confusion.values.sum == report.testRows,
        s"$name confusion matrix does not cover the test set")

    assert(math.abs(field(json, "majority_class").toDouble -
      report.baselines.majorityClass) <= 5e-7 + 1e-9)
    assert(math.abs(field(json, "weighted_random").toDouble -
      report.baselines.weightedRandom) <= 5e-7 + 1e-9)
    assert(field(json, "coin_flip").toDouble == 0.5)
  }
}
