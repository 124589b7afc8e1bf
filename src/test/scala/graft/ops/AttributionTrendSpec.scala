package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures + invariants for the round-11 analytics gates:
  * q233's U-shaped attribution (exact bp splits incl. the remainder
  * rule), q235's Allen ladder (one crafted user per relation), q232's
  * constraint verdicts, q234's recall bounds, q236's OLS normal-equation
  * identity. The DuckDB gates prove corpus-scale equality; these pin the
  * semantics on inputs small enough to check by eye. */
class AttributionTrendSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, ts NANOS, user_id, event_type) → a dir Tables.events
    * reads (ts stored as long nanos, as the corpus ships it). */
  private def eventsDir(rows: (Long, Long, Long, String)*): String = {
    val dir = graft.Scratch.fresh("attr").toString
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0))
      .withColumn("props", lit(null).cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def mins(m: Long): Long = m * 60L * 1000000000L

  test("q233: U-shape splits 10000 bp exactly, remainder to earliest middles") {
    val dir = eventsDir(
      // u1: single touch → all 10000
      (0L, mins(1), 1L, "ad"), (1L, mins(2), 1L, "purchase"),
      // u2: two touches → 5000 each
      (2L, mins(1), 2L, "ad"), (3L, mins(2), 2L, "email"),
      // u3: five touches → 4000 | 667 | 667 | 666 | 4000
      (4L, mins(1), 3L, "ad"), (5L, mins(2), 3L, "email"),
      (6L, mins(3), 3L, "social"), (7L, mins(4), 3L, "email"),
      (8L, mins(5), 3L, "ad"))
    val got = EventQueries.multiTouchAttribution(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      ("ad", 4L, 10000L + 5000L + 4000L + 4000L),
      ("email", 3L, 5000L + 667L + 666L),
      ("social", 1L, 667L)))
  }

  test("q235: one crafted user per Allen relation classifies correctly") {
    def span(u: Long, base: Long, typ: String, fromMin: Long, toMin: Long) =
      Seq((base, mins(fromMin), u, typ), (base + 1, mins(toMin), u, typ))
    val dir = eventsDir((
      span(1, 10, "a", 0, 100) ++ span(1, 20, "b", 200, 300) ++ // precedes
        span(2, 30, "a", 0, 300) ++ span(2, 40, "b", 100, 200) ++ // contains
        span(3, 50, "a", 0, 200) ++ span(3, 60, "b", 100, 300) ++ // overlaps
        span(4, 70, "a", 0, 100) ++ span(4, 80, "b", 100, 200) ++ // meets
        span(5, 90, "a", 0, 100) ++ span(5, 100, "b", 0, 100) ++ // equals
        span(6, 110, "a", 100, 200) ++ span(6, 120, "b", 0, 300) ++ // during
        span(7, 130, "a", 0, 100) ++ span(7, 140, "b", 0, 200) ++ // starts
        span(8, 150, "a", 100, 300) ++ span(8, 160, "b", 0, 300) // finishes
      ): _*)
    val got = EventQueries.allenCensus(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("precedes" -> 1L, "contains" -> 1L, "overlaps" -> 1L,
      "meets" -> 1L, "equals" -> 1L, "during" -> 1L, "starts" -> 1L,
      "finishes" -> 1L))
  }

  test("q232: both verdicts exercised; n_checked constant") {
    val rows = PipelineQueries.constraintSuite(spark, sf0001).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getAs[Long]("n_checked")).distinct.length == 1)
    val failed = rows.filter(_.getAs[String]("status") == "fail")
      .map(_.getAs[String]("check_name")).toSet
    // the tight bound fails by design; key uniqueness fails because the
    // synthetic corpus REALLY carries duplicate (orderkey, linenumber)
    // pairs (~23% at every sf) — the suite surfacing that is the point
    assert(failed == Set("bound(l_quantity<=30)",
      "uniqueness(l_orderkey,l_linenumber)"),
      s"unexpected verdict set: $failed")
    assert(rows.filter(_.getAs[String]("status") == "pass")
      .forall(_.getAs[Long]("n_violations") == 0L))
  }

  test("q234: PQ recall is bounded and exact top-10 is full-depth") {
    val rows = AnnQueries.pqAnn(spark, sf0001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (ne, nh, bp) = (r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_bp"))
      assert(ne == 10L, "500-vector corpus must yield a full exact top-10")
      assert(nh >= 0L && nh <= ne)
      assert(bp == 10000L * nh / ne)
    }
  }

  test("q236: coefficients satisfy the OLS normal equation Σy = n·b + a·Σx") {
    val out = ExtendedQueries.groupedTrend(spark, sf0001).collect()
    assert(out.nonEmpty)
    val m = graft.Tables.lineitem(spark, sf0001)
      .select($"l_returnflag",
        (year($"l_shipdate") * 12 + month($"l_shipdate")).cast("long").as("mi"),
        ($"l_extendedprice".cast("decimal(14,2)") * 100).cast("long").as("cents"))
      .groupBy($"l_returnflag", $"mi").agg(sum($"cents").as("mcents"))
    val mn0 = m.agg(min($"mi")).collect().head.getLong(0)
    val sums = m.select($"l_returnflag", ($"mi" - mn0).as("x"),
        expr("mcents div 100").as("y"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out.foreach { r =>
      val (n, sx, sy) = sums(r.getString(0))
      val lhs = sy.toDouble
      val rhs = n * r.getAs[Double]("intercept") +
        r.getAs[Double]("slope") * sx
      assert(math.abs(lhs - rhs) <= 1e-6 * math.max(1.0, math.abs(lhs)),
        s"normal equation violated for ${r.getString(0)}: $lhs vs $rhs")
    }
  }
}
