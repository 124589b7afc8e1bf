package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Executed-plan proof for q221's hidden partitioning (the DppSpec
  * pattern): the reader-injected bucket predicate must turn a point
  * lookup into directory pruning — "partitions read = 3 of 16" on the
  * actual scan metrics — while a reader WITHOUT the transform rewrite
  * reads all 16 directories for the same query.
  */
class HiddenPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    case q: QueryStageExec => allScans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(allScans) ++
      other.subqueries.flatMap(allScans)
  }

  private def partitionsRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = allScans(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("q221_hidden_")))
    assert(scans.nonEmpty, "no scan of the hidden layout found")
    scans.head.metrics.get("numPartitions").map(_.value)
      .getOrElse(fail("scan has no numPartitions metric"))
  }

  test("q221's lookup reads 3 of 16 bucket directories; a naive reader reads all 16") {
    val dir = "/root/testdata/sf0.001"
    val pruned = graft.ops.SourceQueries.hiddenPartitionLookup(spark, dir)
    assert(pruned.collect().length == 3)
    assert(partitionsRead(pruned) == 3L,
      "hidden-partition rewrite did not prune to the 3 key buckets")

    // negative control: same query phrased only in data-column terms
    val path = graft.ops.SourceQueries.hiddenLayout(spark, dir)
    val naive = spark.read.parquet(path)
      .where($"l_orderkey".isin(1L, 2L, 3L))
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n_lines"))
    assert(partitionsRead(naive) == 16L,
      "control reader should scan every bucket — the layout is hidden " +
        "from a predicate that never mentions it")
  }
}
