package graft.plans

import graft.SparkSpec
import graft.tools.PlanChecks

/** MECHANICAL registry sweep of the single-partition-window anti-pattern
  * (VERDICT r14 #3): WindowGroupLimitSpec's gate inventory ("q280 is the
  * ONLY registered gate with an unpartitioned data-scale rank filter") was
  * a hand-maintained claim — correct when written, but nothing re-swept it
  * when a new gate registered. This spec walks EVERY `SparkEntry.queries`
  * entry at sf0.001, executes the full plan, and asserts that no
  * single-partition window exchange carried more than [[MaxSpwRows]] rows
  * — so a new gate that funnels a data-scale frame through one task's
  * window sort fails `sbt test` instead of relying on review.
  *
  * Threshold rationale. Legitimate single-partition window exchanges are
  * (a) bounded CONTROL frames — Sweep.prefixSum's per-partition offset
  * frame (O(shuffle partitions) = 4 rows under the test session), hop
  * censuses, apportionment remainders — and (b) rank-limit-bounded
  * funnels, where the pushdown mechanisms WindowGroupLimitSpec pins bound
  * the exchange to ≤ limit × upstream-partitions rows. Both are O(100) at
  * any scale. A DATA-scale funnel at sf0.001 shows up as thousands of
  * rows (lineitem ~6,000, events ~2,000), and grows 10× per scale step —
  * the r12 q271/q278/q282/q294 anti-pattern. 1,000 splits the two regimes
  * with an order of magnitude of slack on each side; the detector's
  * discrimination is itself proven by WindowGroupLimitSpec's non-vacuity
  * test (both pushdown mechanisms disabled → the detector reads the full
  * 10,000-row funnel).
  *
  * Cost: one full-suite pass at sf0.001 (the same corpus every other spec
  * uses, so the memoized fixtures are shared across the test JVM).
  */
class RegistrySpwSweepSpec extends SparkSpec {

  private val MaxSpwRows = 1000L

  test("no registered gate funnels a data-scale frame through a " +
    "single-partition window exchange (full registry, sf0.001)") {
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    var worst = List.empty[(String, String, Long)]
    val violations = names.flatMap { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf0001)
      df.collect() // executes df's own queryExecution → metrics populated
      val spw = PlanChecks.singlePartitionWindowRows(
        df.queryExecution.executedPlan)
      spark.catalog.clearCache() // no cross-query cache accumulation
      spw.foreach { case (node, rows) =>
        worst = ((name, node, rows) :: worst).sortBy(-_._3).take(10)
      }
      spw.filter(_._2 > MaxSpwRows).map { case (node, rows) =>
        s"$name: $node carried $rows rows through a single-partition " +
          "window exchange"
      }
    }
    info(s"swept ${names.size} gates; largest single-partition window " +
      "exchanges: " + (if (worst.isEmpty) "none"
      else worst.map { case (n, _, r) => s"$n=$r" }.mkString(", ")))
    assert(violations.isEmpty,
      "data-scale single-partition window funnel(s) detected — the r12 " +
        "anti-pattern. Partition the window, rewrite via Sweep, or bound " +
        s"it with a rank-limit pushdown:\n  ${violations.mkString("\n  ")}")
  }
}
