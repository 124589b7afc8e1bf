package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the q251-q255 batch: conservation identities the DuckDB
  * hash gate implies but does not state (erasure census arithmetic, arm
  * partition completeness, budget-verdict consistency), plus in-engine
  * twins where a naive recomputation is cheap at sf0.001. */
class Round11cSpec extends SparkSpec {
  import spark.implicits._

  test("q251: erasure census conserves rows and proves zero residuals") {
    val rows = PipelineQueries.cascadingErasure(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("customer", "lineitem", "orders"))
    rows.foreach { r =>
      val (nb, rm, na, res) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(nb == rm + na, s"${r.getString(0)}: before != removed + after")
      assert(res == 0L, s"${r.getString(0)}: $res surviving references")
      assert(rm > 0L, s"${r.getString(0)}: the subject rule removed nothing")
    }
    // independent subject count: the modulus rule applied directly
    val subj = graft.Tables.customer(spark, sf0001)
      .filter(pmod($"c_custkey", lit(97)) === 3).count()
    val custRm = rows.find(_.getString(0) == "customer").get.getLong(2)
    assert(custRm == subj, s"customer removals $custRm != subjects $subj")
  }

  test("q252: merge-sink snapshot equals the batch aggregate, in-engine") {
    val snap = EventQueries.streamingMergeSink(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(($"value".cast("decimal(14,2)") * 100).cast("long"),
          lit(0L))).as("cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(snap == batch, "incremental merge diverged from the batch twin")
  }

  test("q253: streaks bounded by active days; census totals match corpus") {
    val rows = EventQueries.longestStreak(spark, sf0001).collect()
    rows.foreach { r =>
      val (days, islands, longest) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(longest >= 1L && longest <= days)
      assert(islands >= 1L && islands <= days)
      // islands partition the active days: a one-day-per-island lower bound
      assert(days - longest >= islands - 1,
        s"${r.getLong(0)}: islands cannot cover the remaining days")
    }
    val totalDays = graft.Tables.events(spark, sf0001)
      .select($"user_id", to_date($"ts").as("d")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == totalDays,
      "per-user active days must sum to the distinct (user, day) count")
  }

  test("q254: arms partition the users and the decision follows the rule") {
    val r = EventQueries.abReadout(spark, sf0001).collect().head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val users = graft.Tables.events(spark, sf0001)
      .select($"user_id").distinct().count()
    assert(na + nb == users, "arm sizes must partition the user set")
    assert(r.getAs[Long]("conv_a") <= na && r.getAs[Long]("conv_b") <= nb)
    val lift = r.getAs[Long]("lift_bp")
    assert(lift == r.getAs[Long]("rate_b_bp") - r.getAs[Long]("rate_a_bp"))
    val expected =
      if (math.abs(lift) < 200) "inconclusive"
      else if (lift >= 200) "ship_b" else "keep_a"
    assert(r.getAs[String]("decision") == expected)
  }

  test("q255: percentiles ordered, burn in bounds, verdict consistent") {
    val rows = EventQueries.sloReport(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50_cents") <= r.getAs[Double]("p75_cents"))
      val (n, breaches, burn) = (r.getAs[Long]("n_requests"),
        r.getAs[Long]("n_breaches"), r.getAs[Long]("burn_bp"))
      assert(breaches <= n)
      assert(burn >= 0L && burn <= 10000L)
      assert(burn == (10000L * breaches) / n, "burn must be the floor ratio")
      val expected = if (burn <= 500L) "within_budget" else "exhausted"
      assert(r.getAs[String]("budget_status") == expected)
    }
  }
}
