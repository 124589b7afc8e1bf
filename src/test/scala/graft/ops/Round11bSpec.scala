package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the q241-q250 batch: engine-internal equivalences
  * (bucketed index vs naive join computed BOTH in Spark — independent of
  * the DuckDB gate), structural identities (rollup conservation,
  * survival monotonicity, quantile ordering), and the WAP quarantine
  * contract. */
class Round11bSpec extends SparkSpec {
  import spark.implicits._

  test("q243: day-bucketed stabbing equals the naive range join, in-engine") {
    val out = EventQueries.intervalStabbing(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 5)
    // naive twin: full interval × probe range join over the same frames
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"event_type", unix_micros($"ts").as("tu"))
    val bounds = ev.agg(min($"tu").as("mn"), max($"tu").as("mx"))
      .collect().head
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val probes = (1L to 5L).map(k => k -> (mn + ((mx - mn) / 6) * k)).toMap
    probes.foreach { case (pid, t) =>
      val (tOut, n) = out(pid)
      assert(tOut == t, s"probe $pid timestamp drifted")
      // count sessions covering t by re-deriving intervals the long way
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id", $"event_type").orderBy($"tu")
      val naive = ev
        .withColumn("gap", $"tu" - lag($"tu", 1).over(w))
        .withColumn("is_new",
          when($"gap".isNull || $"gap" > 86400000000L, 1L).otherwise(0L))
        .withColumn("sid", sum($"is_new").over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"event_type", $"sid")
        .agg(min($"tu").as("st"), max($"tu").as("en"))
        .filter($"st" <= t && $"en" >= t).count()
      assert(n == naive, s"probe $pid: bucketed=$n naive=$naive")
    }
  }

  test("q248: cell-neighborhood search equals brute force, in-engine") {
    val out = ExtendedQueries.gridSpatialJoin(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 5)
    def h(prefix: String, key: Long, m: Int, shift: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$prefix$key".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % m - shift
    }
    val pts = graft.Tables.customer(spark, sf0001)
      .select($"c_custkey").collect().map(_.getLong(0))
      .map(k => (h("lat:", k, 180001, 90000), h("lon:", k, 360001, 180000)))
    (1L to 5L).foreach { pid =>
      val (plat, plon, n, md2) = out(pid)
      assert(plat == h("plat:", pid, 180001, 90000))
      assert(plon == h("plon:", pid, 360001, 180000))
      val d2s = pts.map { case (la, lo) =>
        (la - plat) * (la - plat) + (lo - plon) * (lo - plon) }
        .filter(_ <= 5000L * 5000L)
      assert(n == d2s.length, s"probe $pid: cells=$n brute=${d2s.length}")
      assert(md2 == (if (d2s.isEmpty) -1L else d2s.min))
    }
  }

  test("q247: survival is monotone, bounded, and risk sets shrink") {
    val rows = EventQueries.kaplanMeier(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byT = rows.sortBy(_.getInt(0))
    byT.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("survival_bp") >= b.getAs[Long]("survival_bp"),
          "survival must never increase")
        assert(a.getAs[Long]("n_risk") >= b.getAs[Long]("n_risk"),
          "risk sets must never grow")
      case _ =>
    }
    assert(byT.head.getAs[Long]("survival_bp") <= 10000L)
    assert(byT.forall(r => r.getAs[Long]("n_events") >= 1L))
  }

  test("q249: depth-1 rollup conserves the global totals") {
    val rows = ExtendedQueries.hierarchyRollup(spark, sf0001).collect()
    val d1 = rows.filter(_.getAs[Int]("depth") == 1)
    // key 0 sits outside the digit tree by construction (no 1..9
    // ancestor) — both the gate and the oracle exclude it identically
    val p = graft.Tables.part(spark, sf0001)
      .filter($"p_partkey" >= 1)
      .agg(count(lit(1)),
        sum(($"p_retailprice".cast("decimal(14,2)") * 100).cast("long")))
      .collect().head
    assert(d1.map(_.getAs[Long]("n_parts")).sum == p.getLong(0),
      "every part must land under exactly one root")
    assert(d1.map(_.getAs[Long]("total_cents")).sum == p.getLong(1),
      "cents must be conserved up the tree")
  }

  test("q250: quantiles ordered, replicas complete") {
    val rows = ExtendedQueries.bootstrapCi(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_replicas") == 32L)
      val (lo, mid, hi) = (r.getAs[Double]("mean_cents_p25"),
        r.getAs[Double]("mean_cents_p50"), r.getAs[Double]("mean_cents_p75"))
      assert(lo <= mid && mid <= hi)
    }
  }

  test("q242: the failed candidate is quarantined on disk, never served") {
    val rows = SourceQueries.writeAuditPublish(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getAs[String]("audit_status"), r.getAs[Boolean]("published"))).toMap
    assert(rows("bad") == ("fail", false))
    assert(rows("good") == ("pass", true))
    val root = graft.Scratch.named(
      s"q242_${graft.Scratch.dirKey(sf0001)}").toString
    val current = graft.operators.Ann.currentGenerationPath(spark, root)
    val gens = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("gen-")).map(_.getName).sorted
    // at least one staged-but-unpublished generation (the quarantined bad
    // write) sits on disk besides the base and the published good one
    assert(gens.length >= 3)
    assert(!current.endsWith(gens.head), "pointer must have moved off base")
  }
}
