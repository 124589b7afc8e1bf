package graft.ops

import graft.SparkSpec

/** Brute-force cross-checks for the round-10 robust-statistics and
  * resampling gates (q195/q197/q198): the oracle proves Spark ≡ DuckDB on
  * the same op tree; these prove the op tree itself computes the TEXTBOOK
  * definition, via a from-scratch Scala computation on the collected
  * sf0.001 corpus (small enough to sort in memory).
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  /** quantile_cont over a sorted sequence — the interpolation rule both
    * Stats.groupedPercentile and DuckDB implement. */
  private def quantileCont(sorted: IndexedSeq[Long], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val frac = pos - lo
    if (lo + 1 >= sorted.length) sorted(lo).toDouble
    else sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
  }

  private lazy val centsByFlag: Map[String, IndexedSeq[Long]] =
    graft.Tables.lineitem(spark, sf0001)
      .select($"l_returnflag",
        ($"l_extendedprice".cast("decimal(14,2)") * 100).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(_._2).sorted.toIndexedSeq }

  test("q195 MAD census matches the textbook definition computed from scratch") {
    val got = ExtendedQueries.madOutliers(spark, sf0001)
      .select("l_returnflag", "n_rows", "med_cents", "mad_cents", "n_outliers")
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == centsByFlag.keySet)
    centsByFlag.foreach { case (g, vals) =>
      val med = quantileCont(vals, 0.5)
      // the engine's doubled-integer ladder: dev2 = |2x − 2m| exact longs
      val dev2 = vals.map(v => math.abs(2 * v - (med * 2).toLong)).sorted
      val mad2x2 = (quantileCont(dev2, 0.5) * 2).toLong
      val outliers = dev2.count(d => 2 * d > 3 * mad2x2)
      val r = got(g)
      assert(r._2 == vals.length, s"$g n_rows")
      assert(r._3 == med, s"$g median: ${r._3} vs $med")
      assert(r._4 == mad2x2 / 4.0, s"$g MAD")
      assert(r._5 == outliers, s"$g outliers: ${r._5} vs $outliers")
    }
  }

  test("q197 winsorized mean matches the from-scratch clip") {
    val got = ExtendedQueries.winsorizedMean(spark, sf0001)
      .select("l_returnflag", "n_clipped_lo", "n_clipped_hi", "win_mean_cents")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    centsByFlag.foreach { case (g, vals) =>
      val lo2 = math.floor(quantileCont(vals, 0.05) * 2).toLong
      val hi2 = math.floor(quantileCont(vals, 0.95) * 2).toLong
      val c2 = vals.map(_ * 2)
      val clipped = c2.map(v => math.max(lo2, math.min(hi2, v)))
      val r = got(g)
      assert(r._2 == c2.count(_ < lo2), s"$g n_clipped_lo")
      assert(r._3 == c2.count(_ > hi2), s"$g n_clipped_hi")
      assert(r._4 == clipped.sum.toDouble / (2.0 * vals.length), s"$g mean")
    }
  }

  test("q198 gap-fill census matches a from-scratch per-user resample") {
    graft.Tables.enableNanosRead(spark)
    val events = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"event_id",
        org.apache.spark.sql.functions.coalesce(
          ($"value".cast("decimal(14,2)") * 100).cast("long"),
          org.apache.spark.sql.functions.lit(0L)).as("cents"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    val hourMs = 3600L * 1000
    val byUser = events.groupBy(_._1)
    val expected = byUser.map { case (u, rows) =>
      val byHour = rows.groupBy(r => math.floorDiv(r._2.getTime, hourMs))
      val closing = byHour.map { case (h, rs) =>
        h -> rs.maxBy(r => (r._2.getTime, r._3))._4
      }
      val (mn, mx) = (byHour.keys.min, byHour.keys.max)
      val grid = mn to mx
      var lastSeen = 0L
      var gapSum = 0L; var gaps = 0L
      grid.foreach { h =>
        closing.get(h) match {
          case Some(c) => lastSeen = c
          case None => gaps += 1; gapSum += lastSeen
        }
      }
      u -> (grid.length.toLong, byHour.size.toLong, gaps, gapSum)
    }
    val got = EventQueries.gapFillForwardFill(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, e) =>
      assert(got(u) == e, s"user $u: got ${got(u)} expected $e")
    }
  }
}
