package graft.hockey

import org.apache.spark.sql.types._

/** Explicit input schemas (ref infers them at double scan cost —
  * code/experiment.py:283,325 — then casts; we pin them so the CSV is read
  * once with the right types and malformed cells become nulls in PERMISSIVE
  * mode, reproducing the reference's failed-cast→null semantics).
  *
  * Column order matches the physical files (FIXTURES.md §A1/§A2); with an
  * explicit schema Spark binds CSV columns by position, and the CSV parser's
  * column pruning means only referenced columns are ever parsed.
  */
object Schemas {

  /** events CSV: 54 physical columns (header at
    * reference data/Sample_NHL_EventData.csv:1); the 11 the pipeline uses are
    * typed, the rest load as strings and are pruned at parse time. Null
    * sentinel: literal `\N` (plus empty string). */
  val events: StructType = {
    val names = Seq(
      "GameID", "Season", "SeasonState", "Venue", "Period", "GameTime",
      "StrengthState", "TypeCode", "Event", "x", "y", "Zone", "Reason",
      "ShotType", "SecondaryReason", "TypeCode2", "PEN_Duration", "EventTeam",
      "Goalie_ID", "Goalie", "Player1_ID", "Player1", "Player2_ID", "Player2",
      "Player3_ID", "Player3", "Corsi", "Fenwick", "Shot", "Goal",
      "EventIndex", "ShiftIndex", "ScoreState", "Home_Forwards_ID",
      "Home_Forwards", "Home_Defenders_ID", "Home_Defenders", "Home_Goalie_ID",
      "Home_Goalie", "Away_Forwards_ID", "Away_Forwards", "Away_Defenders_ID",
      "Away_Defenders", "Away_Goalie_ID", "Away_Goalie", "BoxID", "BoxID_rev",
      "BoxSize", "ShotDistance", "ShotAngle", "Position", "Shoots", "xG_F", "xG_S")
    val typed: Map[String, DataType] = Map(
      "GameID" -> LongType, "Season" -> IntegerType, "GameTime" -> IntegerType,
      "Corsi" -> DoubleType, "Fenwick" -> DoubleType, "Shot" -> DoubleType,
      "Goal" -> DoubleType, "ShotDistance" -> DoubleType,
      "ShotAngle" -> DoubleType, "xG_F" -> DoubleType, "xG_S" -> DoubleType)
    StructType(names.map(n => StructField(n, typed.getOrElse(n, StringType))))
  }

  /** results CSV: 25 physical columns (header at
    * reference data/Sample_results.csv:1), named as in the file (`Game Id`,
    * `Ev_Team` — renamed in loadResults, ref code/experiment.py:286-288).
    * `Date` parses as DateType with the reader's dateFormat=M/d/yyyy.
    * Betting-odds tail columns are unused. */
  val results: StructType = {
    val names = Seq(
      "Game Id", "Type", "Season", "Date", "Ev_Team", "Is_Home", "Goal",
      "xG", "G+/-", "RW", "OTW", "SOW", "SOL", "OTL", "RL", "Win",
      "Points", "Favorite", "American Odds", "Decimal Odds", "Market_Prob.",
      "Log loss", "OU", "OU_American Odds", "OU_Decimal Odds")
    // Is_Home/Goal/Win/Points are int-valued but float-FORMATTED in the CSV
    // ("0.0"): parse as double (an IntegerType field would null them out),
    // then loadResults casts to int — reproducing the reference's
    // inferSchema→cast path (code/experiment.py:291-296) in one scan.
    val typed: Map[String, DataType] = Map(
      "Game Id" -> LongType, "Season" -> IntegerType, "Date" -> DateType,
      "Is_Home" -> DoubleType, "Goal" -> DoubleType, "xG" -> DoubleType,
      "Win" -> DoubleType, "Points" -> DoubleType)
    StructType(names.map(n => StructField(n, typed.getOrElse(n, StringType))))
  }

  /** League-average defaults for teams with no history yet (first games of a
    * season). These eleven constants are part of the reference contract
    * (ref code/experiment.py:476-494; README.md:120). */
  object Defaults {
    val GoalsAvg = 2.8
    val WinPct = 0.5
    val PointsAvg = 1.0
    val CorsiAvg = 30.0
    val FenwickAvg = 25.0
    val ShotsAvg = 30.0
    val XgAvg = 2.5
    val ShotDistAvg = 35.0
    val ShotAngleAvg = 20.0
    val RecentWinPct = 0.5
    val RecentGoalsAvg = 2.8
  }

  /** Season/GameID floor filters (ref code/experiment.py:301-302,341-342). */
  val MinSeason = 20072008
  val MinGameId = 2007020001L

  /** The 25 model features (ref code/experiment.py:581-610; README.md:124-142). */
  val featureCols: Seq[String] = Seq(
    "home_goals_avg", "home_win_pct", "home_points_avg", "home_corsi_avg",
    "home_fenwick_avg", "home_shots_avg", "home_xg_avg", "home_recent_form",
    "home_recent_goals", "home_games_played",
    "away_goals_avg", "away_win_pct", "away_points_avg", "away_corsi_avg",
    "away_fenwick_avg", "away_shots_avg", "away_xg_avg", "away_recent_form",
    "away_recent_goals", "away_games_played",
    "win_pct_diff", "goals_avg_diff", "xg_diff", "corsi_diff", "recent_form_diff")
}
