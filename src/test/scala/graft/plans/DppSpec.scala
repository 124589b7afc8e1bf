package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.SparkSpec

/** Executed-plan proof for DYNAMIC PARTITION PRUNING (VERDICT r9 #3) —
  * the single most valuable scan-killer of the star join at 100× scale,
  * pinned the way SkewSpec pins AQE skew splitting: q183's fact scan must
  * carry a `dynamicpruningexpression` partition filter (the runtime
  * subquery that reuses the dim broadcast to enumerate surviving months),
  * and the executed scan must have READ only the surviving partition
  * directories, not just filtered their rows.
  */
class DppSpec extends SparkSpec {

  test("q183: fact scan carries dynamicpruningexpression and reads only the surviving partitions") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.SourceQueries.dppJoin(spark, dir)
    val rows = out.collect()
    // the corpus ships 12 months of 1996 at every sf
    assert(rows.length == 12, s"expected 12 month rows, got ${rows.length}")

    val executed = out.queryExecution.executedPlan
    val planStr = executed.toString
    assert(planStr.contains("dynamicpruningexpression"),
      s"fact scan lost its DPP filter — a static plan reads all 83 " +
        s"partitions at any scale:\n$planStr")

    // the runtime effect, not just the plan shape: the fact-side
    // FileSourceScanExec's "number of partitions read" metric must be the
    // 12 surviving months (an un-pruned scan reads all ship_month dirs).
    // AQE wraps finished stages in QueryStageExec LEAF nodes, so a plain
    // collect() never reaches the scan — descend explicitly.
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans) ++
        other.subqueries.flatMap(allScans)
    }
    val factScans = allScans(executed).filter(
      _.metadata.get("Location").exists(_.contains("li_bymonth")))
    assert(factScans.nonEmpty, s"no fact scan found in:\n$planStr")
    val partsRead = factScans.head.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(12L),
      s"fact scan read ${partsRead.getOrElse("?")} partitions " +
        s"(metrics: ${factScans.head.metrics.keys.mkString(",")}) — DPP " +
        s"should leave exactly the 12 months of 1996")
  }
}
