package graft.hockey

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference-parity checks: team normalization (X1-X3), window semantics
  * (W1-W4 — SURVEY §7.4 ranks frame fidelity the #1 risk), and the full
  * ETL on the reference's committed sample CSVs (SURVEY §5 port strategy).
  */
class HockeySpec extends SparkSpec {
  import spark.implicits._

  private val eventsCsv = "/root/reference/data/Sample_NHL_EventData.csv"
  private val resultsCsv = "/root/reference/data/Sample_results.csv"

  // ---- TeamNames ----

  test("team normalization: map hits, whitespace collapse, fallback, relocation") {
    val df = Seq("Los Angeles Kings", "  L.A   ", "BOS", "ATL", "Some  Unknown Team", "N.Y. I")
      .toDF("raw").select(TeamNames.teamCode($"raw").as("code"))
    assert(df.as[String].collect().toSeq ==
      Seq("LAK", "LAK", "BOS", "WPG", "SUT", "NYI"))
  }

  // ---- Window semantics on a hand-computed fixture ----

  private def gameRow(game: Long, date: String, win: Int, goals: Int, season: Int = 20072008) =
    (game, season, Date.valueOf(date), "AAA", 1, goals, win, if (win == 1) 2 else 0,
      1.0, 10.0, 8.0, 5.0, 30.0, 10.0, 1.5)

  private lazy val toyGameData = Seq(
    gameRow(1, "2007-10-01", 1, 3),
    gameRow(2, "2007-10-03", 0, 1),
    gameRow(3, "2007-10-05", 1, 4),
    gameRow(4, "2007-10-07", 0, 2),
    gameRow(5, "2007-10-09", 1, 5),
    gameRow(6, "2007-10-11", 0, 0),
    gameRow(7, "2007-10-13", 1, 2),
    // second season: history must reset (no cross-season leakage)
    gameRow(8, "2008-10-01", 1, 6, season = 20082009)
  ).toDF("GameID", "Season", "Date", "TeamCode", "Is_Home", "Goals", "Win",
    "Points", "xG_result", "game_corsi", "game_fenwick", "game_shots",
    "game_avg_shot_dist", "game_avg_shot_angle", "game_xg")

  test("expanding history excludes the current row; first game gets the league default") {
    val out = Pipeline.withRollingFeatures(toyGameData)
      .orderBy("GameID")
      .select("GameID", "hist_goals_avg", "team_game_num")
      .as[(Long, Double, Int)].collect()
    // first game of the season: no history → default 2.8
    assert(out(0) == ((1L, Schemas.Defaults.GoalsAvg, 1)))
    // game 2 sees only game 1
    assert(out(1) == ((2L, 3.0, 2)))
    // game 4 sees games 1..3: (3+1+4)/3
    assert(out(3)._2 === (3.0 + 1 + 4) / 3)
    // new season resets both history and game numbering
    assert(out(7) == ((8L, Schemas.Defaults.GoalsAvg, 1)))
  }

  test("recent frame is literally rows -5..-1 (verbatim, not last-5-fixed)") {
    val out = Pipeline.withRollingFeatures(toyGameData)
      .orderBy("GameID")
      .select("GameID", "recent_goals_avg")
      .as[(Long, Double)].collect().toMap
    // game 7's frame = games 2..6 → (1+4+2+5+0)/5
    assert(out(7L) === (1 + 4 + 2 + 5 + 0) / 5.0)
    // game 3's frame = games 1..2 (frame shorter than 5 near the start)
    assert(out(3L) === (3 + 1) / 2.0)
    // first game: empty frame → recent default
    assert(out(1L) === Schemas.Defaults.RecentGoalsAvg)
  }

  test("hist_win_pct stays in [0,1] and all eleven defaults kick in on game 1") {
    val firstGame = Pipeline.withRollingFeatures(toyGameData)
      .filter($"GameID" === 1).head()
    assert(firstGame.getAs[Double]("hist_win_pct") == Schemas.Defaults.WinPct)
    assert(firstGame.getAs[Double]("hist_corsi_avg") == Schemas.Defaults.CorsiAvg)
    assert(firstGame.getAs[Double]("hist_shot_angle_avg") == Schemas.Defaults.ShotAngleAvg)
    val all = Pipeline.withRollingFeatures(toyGameData)
      .agg(min("hist_win_pct"), max("hist_win_pct")).head()
    assert(all.getDouble(0) >= 0.0 && all.getDouble(1) <= 1.0)
  }

  // ---- End-to-end on the reference sample CSVs ----

  test("sample CSVs: 10 game-team rows, 5 matchups, one home+away per game") {
    val results = Pipeline.loadResults(spark, resultsCsv)
    assert(results.count() == 10)
    val gd = Pipeline.gameData(results,
      Pipeline.aggregateEvents(Pipeline.loadEvents(spark, eventsCsv)))
    assert(gd.count() == 10)
    // referential integrity: each game has exactly one home and one away row
    val perGame = gd.groupBy("GameID")
      .agg(sum("Is_Home").as("homes"), count(lit(1)).as("n"))
    assert(perGame.filter($"homes" =!= 1 || $"n" =!= 2).isEmpty)

    val feats = Pipeline.withRollingFeatures(gd)
    val matchups = Pipeline.matchups(feats)
    assert(matchups.count() == 5)
    assert(matchups.columns.length == 31)
    assert(matchups.select("label").as[Int].collect().forall(Set(0, 1, 2)))

    // golden run invariants (SURVEY §5 / VERDICT r2 #5): the matchup count
    // IS the number of games with exactly one home+one away row (the
    // subsampler preserves referential integrity for exactly this), and
    // every team's first game of a season carries the X4 league defaults.
    val wellFormed = gd.groupBy("GameID")
      .agg(sum("Is_Home").as("homes"), count(lit(1)).as("n"))
      .filter($"homes" === 1 && $"n" === 2).count()
    assert(matchups.count() == wellFormed)
    val firstGames = feats.filter($"team_game_num" === 1)
    assert(firstGames.count() > 0)
    assert(firstGames.filter(
      $"hist_goals_avg" =!= Schemas.Defaults.GoalsAvg ||
        $"hist_win_pct" =!= Schemas.Defaults.WinPct ||
        $"recent_goals_avg" =!= Schemas.Defaults.RecentGoalsAvg ||
        $"hist_corsi_avg" =!= Schemas.Defaults.CorsiAvg).isEmpty)
  }

  test("temporal split holds out the max season; binary label is (Points == 2)") {
    val matchups = Pipeline.buildMatchups(spark, eventsCsv, resultsCsv)
    val (train, test, season) = Pipeline.temporalSplit(matchups)
    assert(season == 20132014)
    assert(test.select("Season").distinct().as[Int].collect().toSeq == Seq(20132014))
    assert(train.filter($"Season" === season).isEmpty)
    val lab = Pipeline.withBinaryLabel(matchups)
      .select("label", "label_binary").as[(Int, Double)].collect()
    assert(lab.forall { case (l, b) => b == (if (l == 2) 1.0 else 0.0) })
  }

  test("fast models fit and produce sane evaluation shapes") {
    val matchups = Pipeline.buildMatchups(spark, eventsCsv, resultsCsv)
    val labeled = Pipeline.withBinaryLabel(matchups)
    val cfg = Models.ModelConfig(rfNumTrees = 5, rfMaxDepth = 3, lrMaxIter = 5,
      gbtMaxIter = 2, gbtMaxDepth = 2, mlpMaxIter = 5)
    val model = Models.randomForest(cfg).fit(labeled)
    val metrics = Evaluation.evaluate(model.transform(labeled))
    assert(metrics.accuracy >= 0.0 && metrics.accuracy <= 1.0)
    assert(metrics.confusion.values.sum == 5)
    val importances = Models.topFeatureImportances(model)
    assert(importances.size == 10 && importances.forall(_._2 >= 0.0))
    val base = Evaluation.baselines(Pipeline.withBinaryLabel(matchups))
    assert(base.majorityClass >= 0.5 && base.weightedRandom >= 0.5 && base.coinFlip == 0.5)
  }

  test("all four pipelines save/load and predict identically (persistence round-trip)") {
    // An engine serving models must persist them (VERDICT r2 missing #3):
    // each fitted PipelineModel round-trips through save/load with
    // bit-identical predictions on the sample matchups.
    val labeled = Pipeline.withBinaryLabel(
      Pipeline.buildMatchups(spark, eventsCsv, resultsCsv)).cache()
    val cfg = Models.ModelConfig(rfNumTrees = 3, rfMaxDepth = 3, lrMaxIter = 5,
      gbtMaxIter = 2, gbtMaxDepth = 2, mlpMaxIter = 3)
    val dir = graft.Scratch.fresh("models").toString
    for ((name, pipe) <- Models.all(cfg)) {
      val slug = name.toLowerCase.replace(' ', '_')
      val model = pipe.fit(labeled)
      model.write.overwrite().save(s"$dir/$slug")
      val reloaded = org.apache.spark.ml.PipelineModel.load(s"$dir/$slug")
      val orig = model.transform(labeled)
        .select("GameID", "prediction").as[(Long, Double)].collect().sortBy(_._1)
      val rt = reloaded.transform(labeled)
        .select("GameID", "prediction").as[(Long, Double)].collect().sortBy(_._1)
      assert(orig.sameElements(rt), s"$name predictions changed after reload")
      assert(orig.nonEmpty)
    }
    labeled.unpersist()
  }

  test("subsampler keeps events and results referentially intact") {
    val out = graft.Scratch.fresh("subsample").toString
    Subsample.run(spark, eventsCsv, resultsCsv, out, fraction = 0.6, seed = 7)
    val res = spark.read.option("header", "true").csv(s"$out/results_subset")
    val ev = spark.read.option("header", "true").csv(s"$out/events_subset")
    val resGames = res.select(col("Game Id")).distinct().as[String].collect().toSet
    val evGames = ev.select("GameID").distinct().as[String].collect().toSet
    assert(evGames.subsetOf(resGames))
    // game-level sampling: both rows of every sampled game survive
    assert(res.groupBy(col("Game Id")).count().filter($"count" =!= 2).isEmpty)
    // verbatim pass-through: dates keep their source M/d/yyyy formatting
    val dates = res.select("Date").as[String].collect()
    assert(dates.forall(_.matches("""\d{1,2}/\d{1,2}/\d{4}""")), dates.mkString(","))
  }
}
