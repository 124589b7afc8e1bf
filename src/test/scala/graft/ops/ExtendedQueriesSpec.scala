package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Semantic checks for the round-2 surface (q53+) that the hash oracle
  * can't express directly: physical-rewrite invariance (salting), grouping
  * algebra, and bounded-metric invariants. */
class ExtendedQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join (salting is physical, not semantic)") {
    val salted = ExtendedQueries.saltedJoinAgg(spark, sf0001)
      .orderBy("c_nationkey").as[(Int, Long, Double)].collect().toSeq
    val plain = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(14,2)")).cast("double").as("total_price"))
      .orderBy("c_nationkey").as[(Int, Long, Double)].collect().toSeq
    assert(salted == plain)
  }

  test("cube emits all four grouping levels with consistent totals") {
    val rows = ExtendedQueries.cubeSummary(spark, sf0001)
      .select($"gid", $"n").as[(Long, Long)].collect()
    assert(rows.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
    val grand = rows.filter(_._1 == 3L).map(_._2).sum
    val detail = rows.filter(_._1 == 0L).map(_._2).sum
    assert(grand == detail, s"grand total $grand != sum of detail cells $detail")
  }

  test("percent_rank and cume_dist stay in [0,1]; cume_dist >= percent_rank") {
    val bad = ExtendedQueries.windowFamily2(spark, sf0001)
      .filter($"pct_rank" < 0 || $"pct_rank" > 1 ||
        $"cum_dist" <= 0 || $"cum_dist" > 1 || $"cum_dist" < $"pct_rank")
      .count()
    assert(bad == 0)
  }

  test("ngram jaccard pairs are ordered, scored in (0,1], above threshold") {
    val bad = ExtendedQueries.ngramJaccard(spark, sf0001)
      .filter($"doc_a" >= $"doc_b" || $"jaccard" <= 0 || $"jaccard" > 1 ||
        $"jaccard" < 0.1)
      .count()
    assert(bad == 0)
  }

  test("set ops partition: both ∪ cust_only = distinct VIP customer nations") {
    val tagged = ExtendedQueries.setOps(spark, sf0001)
    val total = tagged.count()
    assert(tagged.select("n_name").distinct().count() == total,
      "tags must partition (no nation in both branches)")
    val vipCustNations = Tables.customer(spark, sf0001)
      .filter($"c_acctbal" > 9000.0)
      .join(Tables.nation(spark, sf0001), $"c_nationkey" === $"n_nationkey")
      .select("n_name").distinct().count()
    assert(total == vipCustNations)
  }

  test("percentiles are ordered p25 <= median <= p75 within every group") {
    val bad = ExtendedQueries.percentiles(spark, sf0001)
      .filter($"p25_qty" > $"median_qty" || $"median_qty" > $"p75_qty")
      .count()
    assert(bad == 0)
  }
}
