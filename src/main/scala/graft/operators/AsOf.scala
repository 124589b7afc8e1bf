package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the most recent
  * right row with `rightTs <= leftTs` within the same key — the standard
  * market-data/feature-store lookup that Spark has no built-in operator for.
  *
  * Implementation choice (SURVEY §7 preference order (a): compose built-in
  * operators): tag both inputs, UNION them, and run one `last(value,
  * ignoreNulls)` window per key ordered by (ts, side) — right rows sort
  * before left rows at equal timestamps so the match is inclusive. This is
  * a single exchange on the key + one sort: exactly the shuffle profile of
  * a sort-merge join, with no custom SparkPlan, no codegen loss, and no
  * per-key driver logic. A range/broadcast variant only wins when the right
  * side is tiny; at 100 TB both sides shuffle once regardless.
  *
  * Left rows with no preceding right row keep NULLs (left-asof semantics,
  * mirroring DuckDB's `ASOF LEFT JOIN`).
  */
object AsOf {

  /** @param left       probe side (each row gets matched)
    * @param right      reference side (source of carried values)
    * @param keys       equi-join key columns (both sides)
    * @param tsCol      event-time column name (both sides)
    * @param valueCols  right-side columns to carry (emitted as `asof_<name>`)
    * @param tieBreak   right-side-ONLY column ordering right rows that tie at
    *                   equal ts (latest wins); the left input need not have it
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String], tieBreak: String): DataFrame = {
    val keyCols = keys.map(col)
    // side 0 = right (sorts first at equal ts ⇒ inclusive match), 1 = left.
    // Carried values ride in ONE struct per right row: the struct itself is
    // null only for left rows, so last(ignoreNulls) distinguishes "no right
    // row yet" (null struct → null outputs) from "matched a right row whose
    // value happens to be NULL" (non-null struct, null field) — carrying
    // bare value columns would skip the latter and resurrect stale values.
    val payload = struct(valueCols.map(col): _*)
    val taggedRight = right.select(
      keyCols ++ Seq(col(tsCol), lit(0).as("__side"), col(tieBreak).as("__tie"),
        payload.as("__payload")): _*)
    val payloadType = taggedRight.schema("__payload").dataType
    val tieType = taggedRight.schema("__tie").dataType
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    // left rows carry a typed-null __tie: tieBreak orders RIGHT rows only
    // (left rows already sort after all equal-ts right rows via __side), so
    // requiring the column on the left input would be a spurious analysis
    // failure for probe tables that don't have it
    val taggedLeft = left.select(
      keyCols ++ Seq(col(tsCol), lit(1).as("__side"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(payloadType).as("__payload")) ++
        leftCols.map(col): _*)

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keyCols ++ Seq(col(tsCol)) ++ leftCols.map(col) ++
        valueCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Whole-operator variant through the custom plan stack
    * ([[graft.plans.AsOfJoinPlan]] → strategy → single-pass merge exec):
    * same semantics and shuffle profile as [[asofJoin]], but the physical
    * operator keeps O(1) state per partition instead of running the union
    * through a window buffer. The right side is re-aliased so self-joins
    * (both inputs derived from one scan) keep distinct attribute ids. */
  def asofJoinMerged(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String], tieBreak: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graftbridge.bridge
    val spark = left.sparkSession
    bridge.registerStrategy(spark, graft.plans.AsOfJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    val rBase = right.queryExecution.analyzed
    val rPlan = Project(rBase.output.map(a => Alias(a, a.name)()), rBase)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not found"))
    bridge.ofRows(spark, graft.plans.AsOfJoinPlan.create(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, tsCol), attr(rPlan, tsCol),
      valueCols.map(c => c -> (attr(rPlan, c): org.apache.spark.sql.catalyst.expressions.Expression)),
      attr(rPlan, tieBreak)))
  }

  /** Tolerance variant: matches older than `toleranceUs` microseconds are
    * nulled out (feature-freshness guard). `tsCol` must be a timestamp. */
  def asofJoinWithTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String], tieBreak: String,
      toleranceUs: Long): DataFrame = {
    val withTs = asofJoin(left, right.withColumn("__rts", col(tsCol)),
      keys, tsCol, valueCols :+ "__rts", tieBreak)
    val fresh: Column =
      unix_micros(col(tsCol)) - unix_micros(col("asof___rts")) <= toleranceUs
    valueCols.foldLeft(withTs) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
    }.drop("asof___rts")
  }
}
