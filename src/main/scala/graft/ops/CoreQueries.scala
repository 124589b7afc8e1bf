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

  /** Window ranking family: rank/dense_rank (tie-aware), lag/lead, ntile —
    * completing the window surface beyond the reference's avg/row_number. */
  def rankFamily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byPrice = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc)
    val byTime = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir).select(
      $"o_orderkey", $"o_custkey",
      rank().over(byPrice).as("price_rank"),
      dense_rank().over(byPrice).as("price_dense_rank"),
      lag($"o_orderkey", 1).over(byTime).as("prev_order"),
      lead($"o_orderkey", 1).over(byTime).as("next_order"),
      ntile(4).over(byTime).as("quartile"))
  }

  /** Exact distinct counts per group (the dedup-cardinality primitive;
    * approx_count_distinct is the scale path but HLL sketches are
    * engine-specific, so the gate pins the exact form). */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
  }

  /** SQL entry point: the same engine surface through `spark.sql` over temp
    * views — one dialect-shared query text runs on both engines. */
  def sqlInterface(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(SqlInterfaceQuery)
  }

  /** String function battery (cleaning/splitting/padding/edit distance). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir).select(
      $"p_partkey",
      upper($"p_name").as("name_upper"),
      // pin DuckDB split_part semantics: out-of-bounds index → '' (getItem
      // would yield null / an ANSI index error on a single-token name)
      coalesce(try_element_at(split(col("p_name"), " "), lit(2)), lit(""))
        .as("noun"),
      lpad($"p_size".cast("string"), 3, "0").as("size_padded"),
      translate($"p_brand", "#", "-").as("brand_dashed"),
      instr($"p_name", "e").cast("int").as("first_e"),
      levenshtein($"p_name", $"p_type").as("name_type_dist"),
      reverse($"p_name").as("name_rev"))
  }

  /** Null semantics: nullif / null-safe equality (<=>) / coalesce / nvl2 —
    * the null-default machinery (X4) generalized. */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flagOrNull = nullif($"l_returnflag", lit("N"))
    Tables.lineitem(spark, dir).select(
      $"l_orderkey", $"l_linenumber",
      flagOrNull.as("flag_or_null"),
      (flagOrNull <=> lit(null)).as("is_suppressed"),
      coalesce(flagOrNull, lit("none")).as("flag_filled"))
  }

  /** Conditional aggregation: count_if / every / any / conditional sums —
    * the confusion-matrix pattern (F5/M8) as first-class aggregates. */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_linestatus")
      .agg(
        count_if($"l_quantity" > 25.0).as("n_bulk"),
        every($"l_quantity" > 0.0).as("all_positive"),
        some($"l_quantity" > 49.0).as("has_max_qty"),
        sum(when($"l_discount" > 0.05, 1).otherwise(0)).as("n_discounted"))
  }

  /** min_by/max_by with a composite deterministic ordering key, plus exact
    * median (interpolated midpoint — identical arithmetic on both engines). */
  def argExtremes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // unique composite: epoch-seconds dominates, orderkey breaks date ties
    val ordKey = unix_timestamp($"l_shipdate") * 1000000L + $"l_orderkey"
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        min_by($"l_orderkey", ordKey).as("earliest_order"),
        max_by($"l_orderkey", ordKey).as("latest_order"),
        median($"l_quantity").as("median_qty"))
  }

  /** Fixed-width histogram of order totals: explicit floor-bucket arithmetic
    * (identical double ops on both engines), overflow clamped to the last
    * bucket. The group-by-bucket shape is the distributed histogram. */
  def priceHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = least(floor($"o_totalprice" / lit(25000.0)), lit(9.0)).cast("int")
    Tables.orders(spark, dir)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(dec2($"o_totalprice")).cast("double").as("bucket_total"))
  }

  /** Statistical moments from EXACT decimal power sums: stddev and Pearson
    * correlation derived as identical double arithmetic over exact Σx, Σx²,
    * Σxy — engine-deterministic where built-in `corr`/`stddev` (Welford
    * vs textbook accumulation) would drift in the last ulp. This is also
    * the numerically-robust distributed formulation: partial power sums
    * combine exactly across partitions. */
  def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = dec2($"l_quantity")
    val y = dec2($"l_extendedprice")
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
      // round(…, 6): the decimal sums are exact, but once a scaled
      // significand exceeds 2^53 (syy at larger groups) the decimal→double
      // CONVERSION itself can differ by an ulp between engines (Java
      // rounds the full rational once; DuckDB converts the int128 then
      // divides) — so the derived moments get the same 6-decimal pin the
      // ranking rule uses. Caught at sf0.001, where the drift surfaced.
      .select($"l_returnflag", $"n",
        round(sqrt(($"sxx" - $"sx" * $"sx" / $"n".cast("double")) /
          ($"n".cast("double") - lit(1.0))), 6).as("stddev_qty"),
        round(($"n".cast("double") * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n".cast("double") * $"sxx" - $"sx" * $"sx") *
            sqrt($"n".cast("double") * $"syy" - $"sy" * $"sy")), 6).as("corr_qty_price"))
  }

  /** Unpivot (melt): wide per-row metrics → long (row, metric, value) form —
    * the reshape between feature-matrix and metric-log layouts. Catalyst
    * plans Expand (one pass, no shuffle); oracle mirrors via UNION ALL. */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir).unpivot(
      ids = Array($"l_orderkey", $"l_linenumber"),
      values = Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
      variableColumnName = "metric",
      valueColumnName = "value")
  }

  /** Grouped string aggregation with deterministic ordering (sort before
    * join — collect_list order is partition-dependent, array_sort pins it). */
  def stringAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .filter($"c_acctbal" > lit(9000.0))
      .groupBy($"c_mktsegment")
      .agg(
        array_join(array_sort(collect_list($"c_name")), "|").as("vip_names"),
        count(lit(1)).as("n_vips"))
  }

  /** Nested types exercised internally (array collect + struct-max argmax),
    * flattened to scalar output columns — the gate harness canonicalizes via
    * a pandas sort, which cannot hash dict/list cells, so the nested values
    * are projected out as a joined string and two scalars. */
  def nestedTypes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        array_join(slice(array_sort(collect_list($"o_orderkey")), 1, 5), ",")
          .as("first_orders"),
        max(struct($"o_totalprice".as("price"), $"o_orderkey".as("okey")))
          .as("best"))
      .select($"o_custkey", $"first_orders",
        $"best.price".as("best_price"), $"best.okey".as("best_okey"))
  }

  /** CONFUSION-MATRIX / METRIC ARITHMETIC under the oracle (q185, VERDICT
    * r9 #5): the reference's M7/M8 evaluation stage
    * ([[graft.hockey.Evaluation.evaluate]] — one grouped count feeding the
    * matrix and every derived metric) was ScalaTest-only because a model
    * fit has no SQL twin. A DETERMINISTIC classifier fixes that: label =
    * high-priority order, prediction = integer total-price cents ≥ the
    * 250k$ cut — both integer predicates — so tp/tn/fp/fn are exact
    * counts and accuracy/precision/recall/F1 are fixed IEEE op sequences
    * over <2^53 integers (one division each; F1 = ((2·p)·r)/(p+r),
    * replayed with identical association in the oracle). The gate routes
    * through the SHIPPING `evaluate` — the same grouped-count collect and
    * the same ratio code every model run uses (AUC rides along on the
    * double rawPrediction column, exercised but not emitted: MLlib's
    * curve integration has no cross-engine twin). Driver state is the
    * 4-cell confusion map — O(1). */
  def evaluationMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val preds = Tables.orders(spark, dir).select(
      when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1.0).otherwise(0.0)
        .as("label_binary"),
      when(($"o_totalprice".cast("decimal(14,2)") * 100).cast("long") >= 25000000L,
        1.0).otherwise(0.0).as("prediction"))
      .withColumn("rawPrediction", $"prediction")
    val m = graft.hockey.Evaluation.evaluate(preds)
    def cell(l: Double, p: Double): Long = m.confusion.getOrElse((l, p), 0L)
    Seq((cell(1, 1), cell(0, 0), cell(0, 1), cell(1, 0),
      m.accuracy, m.precision, m.recall, m.f1))
      .toDF("n_tp", "n_tn", "n_fp", "n_fn", "accuracy", "prec", "rec", "f1")
  }

  /** CALIBRATION CURVE (q237) — the reliability table behind every "is
    * the model's score meaningful" review, extending q185's confusion
    * metrics from one global cut to the whole score range: rank orders by
    * the classifier score (total-price cents, q185's raw score) into
    * score deciles PER CUSTOMER SEGMENT — the window partitions by
    * segment so the sorts run group-parallel (a global ntile serializes
    * onto one task, the q94/q139 lesson) and each segment gets its own
    * curve, which is also the fairness-audit framing (is the score
    * calibrated for every cohort, not just on average). Ordering is
    * total (score, orderkey), so both engines assign identical bins; per
    * (segment, decile) the gate emits exact counts, the positive rate in
    * floor basis points (zero-guarded div), and the bin's score bounds —
    * a monotone-increasing rate column is what a calibrated score looks
    * like; the oracle recomputes every cell. */
  def calibrationCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey",
      when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)
        .as("pos"),
      ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long").as("score"))
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment")
    val w = Window.partitionBy($"c_mktsegment").orderBy($"score", $"o_orderkey")
    o.join(cust, $"o_custkey" === $"c_custkey")
      .withColumn("decile", ntile(10).over(w))
      .groupBy($"c_mktsegment", $"decile")
      .agg(count(lit(1)).as("n_orders"), sum($"pos").as("n_pos"),
        min($"score").as("min_score_cents"), max($"score").as("max_score_cents"))
      .withColumn("pos_rate_bp",
        when($"n_orders" > 0, expr("(10000 * n_pos) div n_orders"))
          .otherwise(0L))
  }

  /** Order-stats buffer for [[q199 typed aggregation]]: integer cents only,
    * so merges are exact in any combine order. */
  case class CentsStats(n: Long, min: Long, max: Long, sum: Long)

  /** The typed `Aggregator[IN, BUF, OUT]` — Spark's USER-facing custom
    * aggregation API (vs the Catalyst `TypedImperativeAggregate` the TopK
    * operator uses internally): reduce/merge over a case-class buffer with
    * product encoders, planned as a regular partial/final hash aggregate. */
  object CentsStatsAgg extends org.apache.spark.sql.expressions.Aggregator[
      Long, CentsStats, CentsStats] {
    override def zero: CentsStats = CentsStats(0L, Long.MaxValue, Long.MinValue, 0L)
    override def reduce(b: CentsStats, cents: Long): CentsStats =
      CentsStats(b.n + 1, math.min(b.min, cents), math.max(b.max, cents),
        b.sum + cents)
    override def merge(a: CentsStats, b: CentsStats): CentsStats =
      CentsStats(a.n + b.n, math.min(a.min, b.min), math.max(a.max, b.max),
        a.sum + b.sum)
    override def finish(r: CentsStats): CentsStats = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[CentsStats] =
      org.apache.spark.sql.Encoders.product[CentsStats]
    override def outputEncoder: org.apache.spark.sql.Encoder[CentsStats] =
      org.apache.spark.sql.Encoders.product[CentsStats]
  }

  /** TYPED-AGGREGATOR gate (q199): the `Dataset`/`KeyValueGroupedDataset`
    * aggregation surface — `groupByKey(...).agg(aggregator.toColumn)` with
    * a case-class buffer — executed against the oracle. The aggregator's
    * reduce/merge are exact integer ops (count/min/max/sum over cents), so
    * partial aggregation order cannot perturb the result, and the plan is
    * the same partial/final hash-agg shape as a builtin (ObjectHashAggregate
    * over the product encoder) — typed ergonomics, not a semantic fork.
    * A user porting a `case class`-centric codebase hits this API first;
    * the gate proves it feeds the same engine. */
  def typedAggregator(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderpriority",
        ($"o_totalprice".cast("decimal(14,2)") * 100).cast("long").as("cents"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(CentsStatsAgg.toColumn.name("s"))
      .toDF("o_orderpriority", "s")
      .select($"o_orderpriority", $"s.n".as("n_orders"),
        $"s.min".as("min_cents"), $"s.max".as("max_cents"),
        $"s.sum".as("sum_cents"))
  }

  /** BENFORD FIRST-DIGIT AUDIT (q325) — the forensic data-quality check
    * for any money/measurement column: the census of first significant
    * digits of o_totalprice against Benford's law, with the per-digit
    * deviation in basis points. Fabricated, truncated, or unit-mixed
    * data shows up as a digit histogram far from the Benford curve.
    * (TPC-H's synthetic prices are NOT Benford-distributed — the gate's
    * value is the exact census + deviation machinery, and a large dev_bp
    * here is the correct report.)
    *
    * Exactness: prices ride the decimal(14,2)→cents BIGINT bridge; the
    * first digit is the first character of the integer's decimal string
    * (string rendering of a BIGINT is engine-stable, unlike float
    * formatting); Benford's log₁₀(1+1/d) reference masses are baked as
    * integer-bp LITERALS (constants — no runtime transcendentals, per
    * the CLAUDE.md rule). One grouped count over ≤ 9 keys; the total
    * rides a broadcast 1-row cross join. */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = Tables.orders(spark, dir)
      .select(($"o_totalprice".cast("decimal(14,2)") * 100)
        .cast("long").as("cents"))
      .filter($"cents" > 0)
      .select(substring($"cents".cast("string"), 1, 1).cast("int").as("digit"))
    val tot = digits.agg(count(lit(1)).as("n_total"))
    val benford = Seq(1 -> 3010L, 2 -> 1760L, 3 -> 1249L, 4 -> 969L,
      5 -> 791L, 6 -> 669L, 7 -> 579L, 8 -> 511L, 9 -> 457L)
      .toDF("digit", "benford_bp")
    digits.groupBy($"digit").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .withColumn("obs_bp", expr("(10000 * n) div n_total"))
      .join(broadcast(benford), Seq("digit"))
      .select($"digit", $"n", $"obs_bp", $"benford_bp",
        abs($"obs_bp" - $"benford_bp").as("dev_bp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q325_benford_digits" -> (benfordDigits _),
    "q199_typed_aggregator" -> (typedAggregator _),
    "q185_evaluation_metrics" -> (evaluationMetrics _),
    "q237_calibration_curve" -> (calibrationCurve _),
    "q51_string_agg" -> (stringAgg _),
    "q52_nested_types" -> (nestedTypes _),
    "q50_unpivot" -> (unpivotMetrics _),
    "q48_histogram" -> (priceHistogram _),
    "q49_stats_moments" -> (statsMoments _),
    "q34_rollup" -> (rollupSummary _),
    "q35_pivot" -> (pivotStatus _),
    "q36_date_features" -> (dateFeatures _),
    "q38_rank_family" -> (rankFamily _),
    "q39_distinct_counts" -> (distinctCounts _),
    "q40_sql_interface" -> (sqlInterface _),
    "q41_string_funcs" -> (stringFuncs _),
    "q42_null_semantics" -> (nullSemantics _),
    "q43_conditional_agg" -> (conditionalAgg _),
    "q44_arg_extremes" -> (argExtremes _),
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

  /** One dialect-shared SQL text for q40 — runs verbatim on Spark SQL and
    * DuckDB (decimal-exact revenue, deterministic ORDER BY + LIMIT). */
  val SqlInterfaceQuery: String =
    """SELECT o_orderkey, o_orderpriority,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      | count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  val oracle: Map[String, String] = Map(
    // q325: same cents bridge, same first-character-of-BIGINT-string
    // digit, same literal Benford bp table, same guarded positive floor
    // division (n_total ≥ 1 whenever a digit row exists).
    "q325_benford_digits" ->
      """WITH c AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |    AS cents
        |  FROM orders
        |), d AS (
        |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
        |    AS digit
        |  FROM c WHERE cents > 0
        |), g AS (
        |  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d),
        |b(digit, benford_bp) AS (VALUES
        |  (1, CAST(3010 AS BIGINT)), (2, CAST(1760 AS BIGINT)),
        |  (3, CAST(1249 AS BIGINT)), (4, CAST(969 AS BIGINT)),
        |  (5, CAST(791 AS BIGINT)), (6, CAST(669 AS BIGINT)),
        |  (7, CAST(579 AS BIGINT)), (8, CAST(511 AS BIGINT)),
        |  (9, CAST(457 AS BIGINT)))
        |SELECT g.digit, g.n,
        |  CAST((10000 * g.n) // t.n_total AS BIGINT) AS obs_bp,
        |  b.benford_bp,
        |  abs(CAST((10000 * g.n) // t.n_total AS BIGINT) - b.benford_bp)
        |    AS dev_bp
        |FROM g CROSS JOIN t JOIN b ON b.digit = g.digit""".stripMargin,
    // q199: plain grouped integer stats — the typed Aggregator must feed
    // the same engine as a builtin aggregate.
    "q199_typed_aggregator" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(min(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS min_cents,
        |  CAST(max(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS max_cents,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    // q237: ntile is deterministic given the total (score, orderkey)
    // order; every cell an exact count, the rate a guarded integer DIV.
    "q237_calibration_curve" ->
      """WITH j AS (
        |  SELECT c_mktsegment, o_orderkey,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS pos,
        |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS score
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), d AS (
        |  SELECT c_mktsegment, pos, score,
        |    ntile(10) OVER (PARTITION BY c_mktsegment
        |      ORDER BY score, o_orderkey) AS decile
        |  FROM j
        |), a AS (
        |  SELECT c_mktsegment, decile, count(*) AS n_orders,
        |    CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(min(score) AS BIGINT) AS min_score_cents,
        |    CAST(max(score) AS BIGINT) AS max_score_cents
        |  FROM d GROUP BY 1, 2
        |)
        |SELECT c_mktsegment, decile, n_orders, n_pos,
        |  min_score_cents, max_score_cents,
        |  CAST(CASE WHEN n_orders > 0 THEN (10000 * n_pos) // n_orders
        |       ELSE 0 END AS BIGINT) AS pos_rate_bp
        |FROM a""".stripMargin,
    // q185: identical integer predicates, then the metric ratios with the
    // engine's exact association order — each a fixed IEEE op sequence
    // over exact integer counts, so DuckDB reproduces every double
    // bit-for-bit.
    "q185_evaluation_metrics" ->
      """WITH p AS (
        |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END AS lab,
        |         CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |                >= 25000000 THEN 1 ELSE 0 END AS pred
        |  FROM orders
        |), c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN lab = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
        |    CAST(sum(CASE WHEN lab = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tn,
        |    CAST(sum(CASE WHEN lab = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
        |    CAST(sum(CASE WHEN lab = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_fn
        |  FROM p
        |), m AS (
        |  SELECT n_tp, n_tn, n_fp, n_fn,
        |    CASE WHEN n_tp + n_tn + n_fp + n_fn > 0
        |      THEN CAST(n_tp + n_tn AS DOUBLE) / CAST(n_tp + n_tn + n_fp + n_fn AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END AS accuracy,
        |    CASE WHEN n_tp + n_fp > 0
        |      THEN CAST(n_tp AS DOUBLE) / CAST(n_tp + n_fp AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END AS prec,
        |    CASE WHEN n_tp + n_fn > 0
        |      THEN CAST(n_tp AS DOUBLE) / CAST(n_tp + n_fn AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END AS rec
        |  FROM c
        |)
        |SELECT n_tp, n_tn, n_fp, n_fn, accuracy, prec, rec,
        |  CASE WHEN prec + rec > 0
        |    THEN CAST(2.0 AS DOUBLE) * prec * rec / (prec + rec)
        |    ELSE CAST(0.0 AS DOUBLE) END AS f1
        |FROM m""".stripMargin,
    "q51_string_agg" ->
      """SELECT c_mktsegment,
        | string_agg(c_name, '|' ORDER BY c_name) AS vip_names,
        | count(*) AS n_vips
        |FROM customer WHERE c_acctbal > 9000.0
        |GROUP BY c_mktsegment""".stripMargin,
    "q52_nested_types" ->
      """WITH s AS (
        |  SELECT o_custkey,
        |    array_to_string((list_sort(list(o_orderkey)))[1:5], ',') AS first_orders,
        |    max(struct_pack(price := o_totalprice, okey := o_orderkey)) AS best
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT o_custkey, first_orders,
        |  best.price AS best_price, best.okey AS best_okey
        |FROM s""".stripMargin,
    "q50_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin,
    "q48_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 25000.0), 9.0) AS INTEGER) AS bucket,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS bucket_total
        |FROM orders GROUP BY 1""".stripMargin,
    "q49_stats_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, n,
        |  round(sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)), 6) AS stddev_qty,
        |  round((CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_qty_price
        |FROM s""".stripMargin,
    "q38_rank_family" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(rank() OVER p AS INTEGER) AS price_rank,
        | CAST(dense_rank() OVER p AS INTEGER) AS price_dense_rank,
        | lag(o_orderkey, 1) OVER t AS prev_order,
        | lead(o_orderkey, 1) OVER t AS next_order,
        | CAST(ntile(4) OVER t AS INTEGER) AS quartile
        |FROM orders
        |WINDOW p AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
        |       t AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q39_distinct_counts" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q40_sql_interface" -> SqlInterfaceQuery,
    "q41_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_name) AS name_upper,
        | split_part(p_name, ' ', 2) AS noun,
        | lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
        | translate(p_brand, '#', '-') AS brand_dashed,
        | CAST(instr(p_name, 'e') AS INTEGER) AS first_e,
        | CAST(levenshtein(p_name, p_type) AS INTEGER) AS name_type_dist,
        | reverse(p_name) AS name_rev
        |FROM part""".stripMargin,
    "q42_null_semantics" ->
      """SELECT l_orderkey, l_linenumber,
        | nullif(l_returnflag, 'N') AS flag_or_null,
        | nullif(l_returnflag, 'N') IS NOT DISTINCT FROM NULL AS is_suppressed,
        | coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_filled
        |FROM lineitem""".stripMargin,
    "q43_conditional_agg" ->
      """SELECT l_linestatus,
        | count(*) FILTER (WHERE l_quantity > 25.0) AS n_bulk,
        | bool_and(l_quantity > 0.0) AS all_positive,
        | bool_or(l_quantity > 49.0) AS has_max_qty,
        | CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q44_arg_extremes" ->
      """SELECT l_returnflag,
        | arg_min(l_orderkey, epoch(l_shipdate) * 1000000 + l_orderkey) AS earliest_order,
        | arg_max(l_orderkey, epoch(l_shipdate) * 1000000 + l_orderkey) AS latest_order,
        | median(l_quantity) AS median_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
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
