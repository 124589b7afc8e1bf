package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the q256-q287 batches: conservation identities and
  * structural bounds the DuckDB hash gates imply but do not state —
  * transition-row totals, partition completeness, exact-sum apportionment,
  * estimator inequalities (Cauchy-Schwarz), growth-accounting flow
  * balance, and the backfill-resolves-everything contract. */
class Round11dSpec extends SparkSpec {
  import spark.implicits._

  test("q256: transitions conserve rows — Σ per-source = events − users") {
    val rows = EventQueries.markovTransitions(spark, sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val nFrom = rs.map(_.getAs[Long]("n_from")).distinct
      assert(nFrom.size == 1, s"$src: inconsistent n_from")
      assert(rs.map(_.getAs[Long]("n_transitions")).sum == nFrom.head)
    }
    val ev = graft.Tables.events(spark, sf0001)
    val total = ev.count()
    val users = ev.select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_transitions")).sum == total - users,
      "each user contributes exactly (n_u - 1) transitions")
  }

  test("q257: ABC classes partition customers and conserve cents") {
    val rows = ExtendedQueries.abcClassification(spark, sf0001).collect()
    val nCust = graft.Tables.orders(spark, sf0001)
      .select($"o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    val shares = rows.map(r => r.getString(0) -> r.getAs[Long]("share_bp"))
      .toMap
    // floor-bp shares sum to ≤ 10000 and within 3 bp of it (3 floors)
    val s = shares.values.sum
    assert(s <= 10000 && s >= 9997, s"class shares sum drifted: $s")
  }

  test("q262: the chosen split is a real split and scores are non-negative") {
    EventQueries.levelShift(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("days_before") >= 1)
      assert(r.getAs[Long]("days_after") >= 1)
      assert(r.getAs[Long]("gap_score") >= 0)
    }
  }

  test("q264: the weighted median is the true cumulative-weight crossing") {
    val med = ExtendedQueries.weightedMedian(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("total_weight"), r.getAs[Long]("weighted_median_cents")))
      .toMap
    val vals = graft.Tables.lineitem(spark, sf0001)
      .select($"l_returnflag",
        ($"l_extendedprice".cast("decimal(14,2)") * 100).cast("long")
          .as("cents"),
        $"l_quantity".cast("long").as("wt"))
    med.foreach { case (g, (totw, m)) =>
      val below = vals.filter($"l_returnflag" === g && $"cents" < m)
        .agg(sum($"wt")).collect().head.getLong(0)
      val upto = vals.filter($"l_returnflag" === g && $"cents" <= m)
        .agg(sum($"wt")).collect().head.getLong(0)
      assert(below * 2 < totw, s"$g: too much weight strictly below")
      assert(upto * 2 >= totw, s"$g: crossing not reached at the median")
    }
  }

  test("q270: final quotas sum EXACTLY to the declared budget") {
    val rows = PipelineQueries.quotaApportionment(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("final_quota")).sum == 1000000L)
    assert(rows.forall(r => r.getAs[Long]("extra") <= 1L))
  }

  test("q271: slices partition the keys with near-perfect balance") {
    val rows = SourceQueries.rangePartitionPlanner(spark, sf0001).collect()
    val n = graft.Tables.orders(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n_keys")).sum == n)
    val sizes = rows.map(_.getAs[Long]("n_keys"))
    assert(sizes.max - sizes.min <= 1, "even-slices rule allows skew ≤ 1")
    // ranges are disjoint and ordered
    val sorted = rows.sortBy(_.getAs[Long]("pid"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_key") < b.getAs[Long]("lo_key"))
      case _ =>
    }
  }

  test("q275: the uniform-bucket estimate never exceeds Σc² (Cauchy-Schwarz)") {
    val r = ExtendedQueries.joinSizeEstimator(spark, sf0001).collect().head
    assert(r.getAs[Long]("est_pairs") <= r.getAs[Long]("actual_pairs"))
    assert(r.getAs[Long]("err_bp") <= 0)
  }

  test("q276: growth accounting balances week over week") {
    val rows = EventQueries.growthAccounting(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("n_new") +
        r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
    }
    // retained(w) = active(w-7) − churned(w) for consecutive weeks
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    rows.foreach { case (wk, r) =>
      val prev = java.time.LocalDate.parse(wk, fmt).minusDays(7).toString
      rows.get(prev).foreach { p =>
        assert(p.getAs[Long]("n_active") - r.getAs[Long]("n_churned") ==
          r.getAs[Long]("n_retained"),
          s"week $wk: retained != prev active − churned")
      }
    }
  }

  test("q281: Luhn census is complete and the valid share is plausible") {
    val r = ExtendedQueries.luhnAudit(spark, sf0001).collect().head
    assert(r.getAs[Long]("n_valid") + r.getAs[Long]("n_invalid") ==
      r.getAs[Long]("n_orders"))
    val bp = r.getAs[Long]("valid_bp")
    assert(bp >= 300 && bp <= 2500,
      s"mod-10 over synthetic keys should validate ~10%, got $bp bp")
  }

  test("q282: vocabulary growth is monotone and bounded by tokens") {
    val rows = TextQueries.vocabGrowth(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("n_docs"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("vocab") <= b.getAs[Long]("vocab"))
        assert(a.getAs[Long]("n_tokens") <= b.getAs[Long]("n_tokens"))
      case _ =>
    }
    rows.foreach(r =>
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tokens")))
  }

  test("q284: residuals live in [0, 999] by construction") {
    AnnQueries.quantResidualAudit(spark, sf0001).collect().foreach { r =>
      val (n, se, me) = (r.getAs[Long]("n_elems"), r.getAs[Long]("sum_e"),
        r.getAs[Long]("max_e"))
      assert(me >= 0 && me <= 999)
      assert(se >= 0 && se <= 999L * n)
      assert(r.getAs[Long]("sum_e2") <= 999L * 999L * n)
    }
  }

  test("q286: the backfill resolves every quarantined orphan") {
    val rows = SourceQueries.lateArrivingDim(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_matched"), r.getAs[Long]("n_orphan"))).toMap
    val (m1, o1) = rows("initial")
    val (m2, o2) = rows("backfill")
    assert(o2 == 0L, "full dimension must resolve all orphans")
    assert(m2 == o1, "backfill joins exactly the quarantine")
    assert(m1 + o1 == graft.Tables.lineitem(spark, sf0001).count())
  }

  test("q287: nation cents roll up to regions, regions to the total") {
    val rows = ExtendedQueries.hierarchyShares(spark, sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (region, rs) =>
      val rc = rs.map(_.getAs[Long]("region_cents")).distinct
      assert(rc.size == 1, s"$region: inconsistent region_cents")
      assert(rs.map(_.getAs[Long]("nation_cents")).sum == rc.head)
    }
  }
}
