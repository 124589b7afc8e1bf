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
  *      partitions. The offsets frame is O(#partitions) rows — its own
  *      single-partition window is 32 rows, not data — and joins back
  *      broadcast. The range exchange feeding both branches is reused
  *      (ReusedExchange), so the union is shuffled once.
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

    // Partition offsets: #points in all strictly-earlier ranges. O(partitions)
    // rows, so the unpartitioned window here is driver-scale, not data-scale.
    val offsets = u.groupBy(col("_sweep_pid"))
      .agg(sum(col("_sweep_d")).as("_sweep_tot"))
      .withColumn("_sweep_off",
        coalesce(sum(col("_sweep_tot")).over(
          Window.orderBy(col("_sweep_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_sweep_pid"), col("_sweep_off"))

    local.join(broadcast(offsets), "_sweep_pid")
      .filter(col("_sweep_d") === 0L)
      .select((payload.map(col) :+ col("_sweep_v").as(valueCol) :+
        (col("_sweep_run") + col("_sweep_off")).as(outCol)): _*)
  }
}
