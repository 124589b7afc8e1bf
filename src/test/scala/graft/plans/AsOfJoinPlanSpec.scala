package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.AsOf

/** The custom merge exec must agree row-for-row with the composed
  * union+window as-of join — on fixtures covering the edge cases and on
  * seeded random data — and must actually plan through AsOfJoinExec. */
class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 101L, 10.0),
    (1L, ts("2024-01-01 10:05:00"), 102L, 11.0),
    (1L, ts("2024-01-01 10:05:00"), 103L, 12.5), // tie on ts → max tie wins
    (2L, ts("2024-01-01 10:02:00"), 104L, 99.0)
  ).toDF("user_id", "ts", "event_id", "px")

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 09:59:00"), 201L), // before any quote → null
    (1L, ts("2024-01-01 10:05:00"), 202L), // equal ts → inclusive, tie 103 (12.5)
    (1L, ts("2024-01-01 10:30:00"), 203L),
    (2L, ts("2024-01-01 10:03:00"), 204L),
    (3L, ts("2024-01-01 10:03:00"), 205L) // key with no quotes → null
  ).toDF("user_id", "ts", "event_id")

  private def collectAsOf(df: DataFrame): Seq[(Long, Long, Option[Double])] =
    df.select("user_id", "event_id", "asof_px")
      .as[(Long, Long, Option[Double])].collect().sortBy(r => (r._1, r._2)).toSeq

  test("merge exec matches the composed as-of join on the edge-case fixture") {
    val merged = AsOf.asofJoinMerged(trades, quotes, Seq("user_id"), "ts",
      Seq("px"), "event_id")
    val composed = AsOf.asofJoin(trades, quotes, Seq("user_id"), "ts",
      Seq("px"), "event_id")
    assert(collectAsOf(merged) == collectAsOf(composed))
    // spot-check the tie-break semantics directly
    assert(collectAsOf(merged).collect { case (1L, 202L, v) => v } ==
      Seq(Some(12.5)))
  }

  test("plan goes through AsOfJoinExec (one merge operator, no window)") {
    val merged = AsOf.asofJoinMerged(trades, quotes, Seq("user_id"), "ts",
      Seq("px"), "event_id")
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"no AsOfJoinExec in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected WindowExec in:\n$plan")
  }

  test("merge exec matches the composed join on seeded random data") {
    val rnd = new scala.util.Random(7)
    val right = Seq.fill(400)((rnd.nextInt(6).toLong,
      new Timestamp(1700000000000L + rnd.nextInt(50000) * 1000L),
      rnd.nextLong().abs, rnd.nextDouble())).toDF("k", "ts", "rid", "v")
    val left = Seq.fill(250)((rnd.nextInt(8).toLong,
      new Timestamp(1700000000000L + rnd.nextInt(50000) * 1000L),
      rnd.nextLong().abs)).toDF("k", "ts", "lid")
    val merged = AsOf.asofJoinMerged(left, right, Seq("k"), "ts", Seq("v"), "rid")
      .select("k", "lid", "asof_v").as[(Long, Long, Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val composed = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("v"), "rid")
      .select("k", "lid", "asof_v").as[(Long, Long, Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(merged == composed)
    assert(merged.exists(_._3.isDefined) && merged.exists(_._3.isEmpty))
  }
}
