package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operator inventory (SURVEY.md §2) re-expressed over the
  * test corpus. Each query exists in two forms: the Spark builder here and an
  * ANSI-SQL oracle (DuckDB) in [[oracle]], with identical column aliases so
  * the driver's sorted-column hash compare lines up.
  *
  * Floating-point policy: per-row arithmetic is left exact (same IEEE
  * expression tree on both engines ⇒ bit-identical); aggregated doubles
  * (sum/avg) are order-dependent across engines, so they are rounded to 4
  * decimals on BOTH sides. min/max/count are exact and left unrounded.
  *
  * Scale posture: dimension tables (region/nation/customer/supplier/part) are
  * explicitly `broadcast()` in joins — at 100 TB the fact tables shuffle but
  * dims never do. Aggregations are plain groupBy ⇒ Catalyst plans
  * partial+final HashAggregate (map-side combine). Window queries share one
  * partitioning per spec so a single exchange serves all frames, mirroring
  * the reference's single WindowExec pass (ref code/experiment.py:416-472).
  */
object CoreQueries {

  import org.apache.spark.sql.Column

  /** Exact-decimal bridge for cross-engine float determinism: summing doubles
    * is associativity-order-dependent (Spark's partial aggregates vs DuckDB's
    * tree sums differ in the last ulp, which flips `round()` on boundary
    * values). Monetary columns here carry 2 decimals, so we aggregate them as
    * DECIMAL (exact, overflow-safe to 1e9+ rows at decimal(38)) and cast the
    * exact result to double — bit-identical on every engine, no rounding. */
  private def dec2(c: Column): Column = c.cast("decimal(14,2)")

  /** Exact mean: exact decimal sum / exact count, divided in double — both
    * operands bit-identical across engines ⇒ the quotient is too. */
  private def exactAvg(sumDec: Column, n: Column): Column =
    sumDec.cast("double") / n.cast("double")

  /** A1 (ref code/experiment.py:359-366): grouped hash-aggregate, multiple
    * aggregates per group — TPC-H Q1 shape: filter + 2-key groupBy + 8 aggs. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val discFactor = (lit(1.0) - $"l_discount").cast("decimal(4,2)")
    val taxFactor = (lit(1.0) + $"l_tax").cast("decimal(4,2)")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("2000-12-31 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec2($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec2($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec2($"l_extendedprice") * discFactor).cast("double").as("sum_disc_price"),
        sum(dec2($"l_extendedprice") * discFactor * taxFactor).cast("double").as("sum_charge"),
        exactAvg(sum(dec2($"l_quantity")), count(lit(1))).as("avg_qty"),
        exactAvg(sum(dec2($"l_extendedprice")), count(lit(1))).as("avg_price"),
        exactAvg(sum(dec2($"l_discount")), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** F1/P2/P5 (ref code/experiment.py:301-302,381-397): literal-threshold
    * filters + projection with per-row arithmetic (exact, no rounding). */
  def filterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1999-01-01 00:00:00").cast("timestamp") &&
        $"l_discount" > lit(0.02))
      .select(
        $"l_orderkey", $"l_linenumber", $"l_quantity",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"),
        $"l_returnflag")
  }

  /** J1 (ref code/experiment.py:372-398): multi-table equi-join with
    * broadcast dims + grouped rollup. Fact-to-fact join shuffles on the key;
    * nation/region are broadcast so they never shuffle at any scale. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        sum(dec2($"l_extendedprice") * (lit(1.0) - $"l_discount").cast("decimal(4,2)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** W1/W2 (ref code/experiment.py:416-458): expanding leakage-safe history
    * frame — all previous rows per key, current row excluded
    * (rowsBetween(unboundedPreceding, -1)), two-key deterministic ordering. */
  def expandingHistory(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.orders(spark, dir).select(
      $"o_orderkey", $"o_custkey",
      exactAvg(sum(dec2($"o_totalprice")).over(w), count(lit(1)).over(w)).as("hist_avg_price"),
      count(lit(1)).over(w).as("hist_n_orders"))
  }

  /** W4 + X4 (ref code/experiment.py:461-494): sliding rows(-5,-1) recent
    * frame with coalesce-to-league-default null fill (frame kept verbatim —
    * 5 preceding rows, current excluded; SURVEY §2.6 note). */
  def recentForm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(-5, -1)
    Tables.orders(spark, dir).select(
      $"o_orderkey", $"o_custkey",
      coalesce(
        exactAvg(sum(dec2($"o_totalprice")).over(w), count(lit(1)).over(w)),
        lit(100.0)).as("recent_avg_price"))
  }

  /** W3 (ref code/experiment.py:423-429): row_number ordinal per
    * (key, two-key order) — `team_game_num` analog. */
  def sequenceNumber(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir).select(
      $"o_orderkey", $"o_custkey",
      row_number().over(w).as("order_seq"))
  }

  /** J2/X7 (ref code/experiment.py:502-552): self-join of two filtered views
    * of one table on a shared key + differential features (exact doubles). */
  def selfJoinDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, dir)
    val first = l.filter($"l_linenumber" === 1).as("a")
    val second = l.filter($"l_linenumber" === 2).as("b")
    first.join(second, $"a.l_orderkey" === $"b.l_orderkey")
      .select(
        $"a.l_orderkey".as("orderkey"),
        $"a.l_quantity".as("qty_1"),
        $"b.l_quantity".as("qty_2"),
        ($"a.l_extendedprice" - $"b.l_extendedprice").as("price_diff"))
  }

  /** J3/F8 (ref create_subsample.py:72,85): semi-join — keep orders having at
    * least one high-quantity line (EXISTS). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val big = Tables.lineitem(spark, dir).filter($"l_quantity" > lit(45.0))
    o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus")
  }

  /** Anti-join (NOT EXISTS) — customers with no order in 2001+. Completes the
    * join-type surface beyond the reference's inner/semi set. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val recent = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("2001-01-01 00:00:00").cast("timestamp"))
    c.join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_nationkey")
  }

  /** X1-X3 (ref code/experiment.py:272-316): whitespace collapse + literal
    * map lookup + regex-uppercase fallback — the TEAM_MAP normalization
    * pattern. The map is a folded literal expression (constant-folded once by
    * Catalyst), not a join. */
  def mapNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val codeMap = Map("AFRICA" -> "AFR", "AMERICA" -> "AMER", "ASIA" -> "AS")
    val clean = trim(regexp_replace($"r_name", "\\s+", " "))
    val mapped = try_element_at(typedlit(codeMap), clean)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    n.join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .select(
        $"n_nationkey", $"n_name",
        coalesce(mapped, upper(regexp_replace(clean, "[^A-Z]", ""))).as("region_code"))
  }

  /** X6 (ref code/experiment.py:628-633): when/otherwise binarization. */
  def binarize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir).select(
      $"o_orderkey",
      when($"o_orderstatus" === "F", 1.0).otherwise(0.0).as("label_binary"),
      when($"o_totalprice" > lit(100000.0), 1).otherwise(0).as("high_value"))
  }

  /** A3/F5 (ref code/experiment.py:678-680): grouped count — the
    * confusion-matrix-in-one-pass pattern (vs the reference's 4 filter+count
    * jobs, SURVEY §4.2). */
  def groupedCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  /** A2 (ref code/experiment.py:564): global aggregate (exact: max/count). */
  def globalMax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir).agg(
      max($"o_orderdate").as("max_date"),
      max($"o_totalprice").as("max_price"),
      count(lit(1)).as("n_orders"))
  }

  /** O2/O3 (ref code/experiment.py:678-680, 46-51): deterministic top-k —
    * total order via unique tiebreak key. */
  def topK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  /** Distinct projection (dedup building block; SURVEY §2.8 engine surface). */
  def distinctSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir).select($"c_mktsegment").distinct()
  }

  /** Set op: UNION DISTINCT of two keyed projections (engine surface beyond
    * the reference, SURVEY §2.8 "no union anywhere" — we expose it). */
  def unionNations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cn = Tables.customer(spark, dir).select($"c_nationkey".cast("int").as("nationkey"))
    val sn = Tables.supplier(spark, dir).select($"s_nationkey".cast("int").as("nationkey"))
    cn.union(sn).distinct()
  }

  /** F2/F6 (ref code/experiment.py:401-402,555): not-null filter + na.drop. */
  def dropNulls(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_totalprice".isNotNull && $"o_orderdate".isNotNull)
      .na.drop()
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
  }

  /** Hierarchical aggregation: ROLLUP over (returnflag, linestatus) with
    * grouping_id — subtotal and grand-total rows in one pass (engine surface
    * beyond the reference's plain groupBy; SURVEY §2.4 note). */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        sum(dec2($"l_quantity")).cast("double").as("sum_qty"))
  }

  /** Pivot: order counts by priority × status — Catalyst rewrites this to a
    * single aggregate with conditional counts (mirrored literally in the
    * oracle). Absent combinations are NULL. */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
  }

  /** X5 (ref code/experiment.py:298): US-style date formatting/parsing
    * roundtrip (`M/d/yyyy` — the reference's results-CSV date contract) +
    * calendar part extraction. */
  def dateFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val us = date_format($"o_orderdate", "M/d/yyyy")
    Tables.orders(spark, dir).select(
      $"o_orderkey",
      us.as("us_date"),
      to_date(us, "M/d/yyyy").as("roundtrip"),
      year($"o_orderdate").as("yr"),
      month($"o_orderdate").as("mo"),
      dayofweek($"o_orderdate").as("dow"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_rollup" -> (rollupSummary _),
    "q35_pivot" -> (pivotStatus _),
    "q36_date_features" -> (dateFeatures _),
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_filter_project" -> (filterProject _),
    "q03_revenue_by_nation" -> (revenueByNation _),
    "q04_expanding_history" -> (expandingHistory _),
    "q05_recent_form" -> (recentForm _),
    "q06_sequence_number" -> (sequenceNumber _),
    "q07_selfjoin_diff" -> (selfJoinDiff _),
    "q08_semi_join" -> (semiJoin _),
    "q09_anti_join" -> (antiJoin _),
    "q10_map_normalize" -> (mapNormalize _),
    "q11_binarize" -> (binarize _),
    "q12_grouped_count" -> (groupedCount _),
    "q13_global_max" -> (globalMax _),
    "q14_topk" -> (topK _),
    "q15_distinct" -> (distinctSegments _),
    "q16_union_nations" -> (unionNations _),
    "q17_drop_nulls" -> (dropNulls _))

  val oracle: Map[String, String] = Map(
    "q34_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
        | count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q35_pivot" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
        | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q36_date_features" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%-m/%-d/%Y') AS us_date,
        | CAST(strptime(strftime(o_orderdate, '%-m/%-d/%Y'), '%-m/%-d/%Y') AS DATE) AS roundtrip,
        | CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(month(o_orderdate) AS INTEGER) AS mo,
        | CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
        |FROM orders""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | l_extendedprice * (1.0 - l_discount) AS net_price, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00' AND l_discount > 0.02""".stripMargin,
    "q03_revenue_by_nation" ->
      """SELECT r_name, n_name,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q04_expanding_history" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE)
        |   / CAST(count(*) OVER w AS DOUBLE) AS hist_avg_price,
        | count(*) OVER w AS hist_n_orders
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin,
    "q05_recent_form" ->
      """SELECT o_orderkey, o_custkey,
        | coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE)
        |            / CAST(count(*) OVER w AS DOUBLE),
        |          CAST(100.0 AS DOUBLE)) AS recent_avg_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)""".stripMargin,
    "q06_sequence_number" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
        |FROM orders""".stripMargin,
    "q07_selfjoin_diff" ->
      """SELECT a.l_orderkey AS orderkey, a.l_quantity AS qty_1, b.l_quantity AS qty_2,
        | a.l_extendedprice - b.l_extendedprice AS price_diff
        |FROM (SELECT * FROM lineitem WHERE l_linenumber = 1) a
        |JOIN (SELECT * FROM lineitem WHERE l_linenumber = 2) b
        |  ON a.l_orderkey = b.l_orderkey""".stripMargin,
    "q08_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin,
    "q10_map_normalize" ->
      """SELECT n_nationkey, n_name,
        | CASE trim(regexp_replace(r_name, '\s+', ' ', 'g'))
        |   WHEN 'AFRICA' THEN 'AFR' WHEN 'AMERICA' THEN 'AMER' WHEN 'ASIA' THEN 'AS'
        |   ELSE upper(regexp_replace(trim(regexp_replace(r_name, '\s+', ' ', 'g')), '[^A-Z]', '', 'g'))
        | END AS region_code
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "q11_binarize" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderstatus = 'F' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS label_binary,
        | CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END AS high_value
        |FROM orders""".stripMargin,
    "q12_grouped_count" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q13_global_max" ->
      """SELECT max(o_orderdate) AS max_date, max(o_totalprice) AS max_price,
        | count(*) AS n_orders
        |FROM orders""".stripMargin,
    "q14_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q15_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer",
    "q16_union_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q17_drop_nulls" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
        |  AND o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
        |  AND o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL""".stripMargin)
}
