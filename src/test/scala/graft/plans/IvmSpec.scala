package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Executed-plan proof for q220's incremental join-view maintenance: the
  * physical claim is that the maintenance job executes exactly the THREE
  * delta-join terms and SCANS the materialized base view — never a fourth
  * (base ⋈ base) join, which is the term that costs everything at scale.
  * A silently-wrong maintenance job fails the oracle; a silently
  * re-deriving one would pass it, so the plan shape is the only place
  * this contract can be pinned.
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def descend(p: SparkPlan): Seq[SparkPlan] = (p match {
    case a: AdaptiveSparkPlanExec => descend(a.executedPlan)
    case q: QueryStageExec => descend(q.plan)
    case other => other.children.flatMap(descend) ++
      other.subqueries.flatMap(descend)
  }) :+ p

  test("q220 executes exactly 3 joins and scans the base-view checkpoint") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.SourceQueries.ivmJoinView(spark, dir)
    assert(out.collect().length == 80)
    val nodes = descend(out.queryExecution.executedPlan)
    val joins = nodes.collect {
      case j: SortMergeJoinExec => j: BaseJoinExec
      case j: BroadcastHashJoinExec => j
      case j: ShuffledHashJoinExec => j
    }
    assert(joins.length == 3,
      s"expected the three delta-join terms, got ${joins.length}:\n" +
        out.queryExecution.executedPlan)
    val viewScans = nodes.collect { case s: FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(_.contains("q220_base_")))
    assert(viewScans.nonEmpty,
      "maintenance plan does not scan the materialized base view")
  }

  test("q220's delta quadrants are all populated (ΔO⋈ΔL included)") {
    // the quadrant split rides public predicates, so re-derive the three
    // delta terms here: an order-aligned lineitem split would silently
    // leave ΔO⋈ΔL empty and stop testing the most-dropped term
    val dir = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, dir).select($"o_orderkey")
    val l = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey")
    def n(oDelta: Boolean, lDelta: Boolean): Long = {
      val oSide = o.filter(if (oDelta) $"o_orderkey" % 37 === 0L
                           else $"o_orderkey" % 37 =!= 0L)
      val lSide = l.filter(if (lDelta) $"l_partkey" % 13 === 0L
                           else $"l_partkey" % 13 =!= 0L)
      oSide.join(lSide, $"o_orderkey" === $"l_orderkey").count()
    }
    val (dOl, oDl, dOdL) = (n(true, false), n(false, true), n(true, true))
    assert(dOl > 0, "ΔO⋈L_base quadrant empty")
    assert(oDl > 0, "O_base⋈ΔL quadrant empty")
    assert(dOdL > 0, "ΔO⋈ΔL quadrant empty — the split rules degenerated")
    // and the maintained view's totals equal base + the three quadrants
    val total = Tables.lineitem(spark, dir).count()
    assert(n(false, false) + dOl + oDl + dOdL == total)
  }
}
