package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SweepSpec extends SparkSpec {
  import spark.implicits._

  private val pointVals: Seq[Long] = Seq(5L, 5L, 5L, 10L, 20L, 20L, 30L)

  private def counts(strict: Boolean): Map[Long, Long] = {
    val pts = pointVals.toDF("v")
    val qs = Seq((1L, 4L), (2L, 5L), (3L, 6L), (4L, 20L), (5L, 35L))
      .toDF("id", "v")
    Sweep.countUpTo(pts, qs, "v", "cnt", strict = strict, partitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("non-strict counts include equal-valued points (ties exact)") {
    assert(counts(strict = false) ===
      Map(1L -> 0L, 2L -> 3L, 3L -> 3L, 4L -> 6L, 5L -> 7L))
  }

  test("strict counts exclude equal-valued points") {
    assert(counts(strict = true) ===
      Map(1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L, 5L -> 7L))
  }

  test("counts are exact across many range partitions (prefix offsets)") {
    val n = 5000
    val pts = (1 to n).map(i => ((i * 37) % 500).toLong).toDF("v")
    val ptsL = (1 to n).map(i => ((i * 37) % 500).toLong)
    val qs = (1 to 200).map(i => (i.toLong, ((i * 91) % 500).toLong))
      .toDF("id", "v")
    val got = Sweep.countUpTo(pts, qs, "v", "cnt", strict = false,
      partitions = 16).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1 to 200).foreach { i =>
      val v = (i * 91) % 500
      assert(got(i.toLong) === ptsL.count(_ <= v).toLong, s"query id=$i v=$v")
    }
  }

  test("payload columns pass through unchanged") {
    val pts = Seq(1L, 2L, 3L).toDF("v")
    val out = Sweep.countUpTo(pts,
      Seq((7L, "x", 2L)).toDF("id", "tag", "v"), "v", "cnt", strict = false)
    assert(out.columns.toSeq === Seq("id", "tag", "v", "cnt"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      .toSeq === Seq((7L, "x", 2L)))
  }

  test("q132 session overlap matches brute force and plans with no self-join") {
    val df = graft.ops.EventQueries.sessionOverlap(spark, sf0001)
    // brute-force reference over the same sessionize output
    val s = graft.ops.EventQueries.sessionize(spark, sf0001)
      .select($"user_id", $"session_id",
        unix_micros($"session_start").as("st"), unix_micros($"session_end").as("en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = s.map { case (u, sid, st, en) =>
      (u, sid) -> s.count { case (u2, _, st2, en2) =>
        u2 != u && st2 <= en && st <= en2 }.toLong
    }.toMap
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    // the scale property: no interval×interval pair join anywhere. The only
    // joins are the tiny pid-offsets broadcast and the per-session key joins.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.toLowerCase.contains("sortmergejoin") ||
      !plan.contains("hb"), "hour-bucket pair join must be gone")
  }
}
