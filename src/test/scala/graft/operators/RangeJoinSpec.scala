package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val starts = Seq(
    (1L, ts("2024-01-01 10:00:00"), 11L),
    (2L, ts("2024-01-01 10:00:00"), 12L)
  ).toDF("user_id", "ts", "event_id")

  private lazy val follows = Seq(
    (1L, ts("2024-01-01 09:59:59"), 21L), // before start → excluded
    (1L, ts("2024-01-01 10:00:00"), 22L), // equal ts → included (gap 0)
    (1L, ts("2024-01-01 10:04:00"), 23L), // same bucket → included
    (1L, ts("2024-01-01 10:05:00"), 24L), // exactly maxGap → included
    (1L, ts("2024-01-01 10:05:01"), 25L), // just past → excluded
    (2L, ts("2024-01-01 10:03:00"), 26L) // other key
  ).toDF("user_id", "ts", "event_id")

  test("range join: inclusive [ts, ts+gap] window per key, bucket edges exact") {
    val out = RangeJoin.rangeJoin(starts, follows,
      keys = Seq("user_id"), tsCol = "ts", maxGapUs = 5L * 60 * 1000000)
      .select($"event_id", $"r_event_id").as[(Long, Long)].collect().toSet
    assert(out == Set((11L, 22L), (11L, 23L), (11L, 24L), (12L, 26L)))
  }

  test("range join equals the naive theta join on random data") {
    val rnd = new scala.util.Random(11)
    val l = Seq.fill(60)((rnd.nextInt(5).toLong,
      new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), rnd.nextLong()))
      .toDF("user_id", "ts", "event_id")
    val r = Seq.fill(60)((rnd.nextInt(5).toLong,
      new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), rnd.nextLong()))
      .toDF("user_id", "ts", "event_id")
    val gap = 17L * 1000000
    val bucketed = RangeJoin.rangeJoin(l, r, Seq("user_id"), "ts", gap)
      .select($"event_id", $"r_event_id").as[(Long, Long)].collect().toSet
    val naive = l.as("a").join(r.as("b"),
      $"a.user_id" === $"b.user_id" && $"b.ts" >= $"a.ts" &&
        org.apache.spark.sql.functions.unix_micros($"b.ts") -
          org.apache.spark.sql.functions.unix_micros($"a.ts") <= gap)
      .select($"a.event_id", $"b.event_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
  }
}
