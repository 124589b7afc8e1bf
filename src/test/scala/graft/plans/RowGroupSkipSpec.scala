package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Executed-scan proof for ROW-GROUP DATA SKIPPING (q202, VERDICT r10 #3)
  * — the sub-directory scan-killer DppSpec's partition pruning doesn't
  * cover: parquet footer min/max statistics must let a selective date
  * predicate materialize only the row groups whose range overlaps it, and
  * only when the physical layout clusters the column. The spec pins the
  * metric shape on q202's fixture pair: the scrambled copy is the control
  * (every row group spans the full corpus, so the scan materializes the
  * ENTIRE table), the date-clustered copy must materialize a small
  * fraction, and both must agree on the query result to the bit.
  */
class RowGroupSkipSpec extends SparkSpec {
  import spark.implicits._

  private def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    case q: QueryStageExec => allScans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(allScans) ++
      other.subqueries.flatMap(allScans)
  }

  test("q202: footer stats skip row groups on the clustered layout, none on the scrambled") {
    val dir = "/root/testdata/sf0.001"
    val (sortedPath, scrambledPath) =
      graft.ops.SourceQueries.skipLayouts(spark, dir)
    val total = spark.read.parquet(scrambledPath).count()
    val pred = $"ship_day" >= lit(java.sql.Date.valueOf("1998-03-01")) &&
      $"ship_day" <= lit(java.sql.Date.valueOf("1998-03-31"))

    def measure(path: String): (Long, Seq[org.apache.spark.sql.Row]) = {
      val df = spark.read.parquet(path).filter(pred)
        .agg(count(lit(1)), sum($"l_quantity".cast("decimal(14,2)")),
          sum($"l_extendedprice".cast("decimal(14,2)")))
      val rows = df.collect().toSeq
      val scans = allScans(df.queryExecution.executedPlan)
        .filter(_.metadata.get("Location").exists(_.contains(
          new java.io.File(path).getName)))
      assert(scans.nonEmpty, s"no scan over $path in the executed plan")
      // the predicate must actually reach the reader, or min/max stats
      // never get consulted
      assert(scans.exists(_.metadata.get("PushedFilters")
          .exists(f => f.contains("ship_day") && !f.contains("PushedFilters: []"))),
        s"date predicate was not pushed to the $path scan:\n" +
          scans.map(_.metadata.get("PushedFilters")).mkString(", "))
      (scans.map(_.metrics("numOutputRows").value).sum, rows)
    }

    val (sortedScan, sortedRows) = measure(sortedPath)
    val (scrambledScan, scrambledRows) = measure(scrambledPath)
    // control: a scrambled layout defeats min/max stats — every row group
    // overlaps March 1998, so the scan materializes the entire table
    assert(scrambledScan == total,
      s"scrambled scan materialized $scrambledScan of $total — the control " +
        "is broken (did the fixture stop scrambling?)")
    // claim: the clustered layout materializes only the covering groups.
    // sf0.001 lineitem (~6k rows) at 64 KiB block size yields several row
    // groups over 7 shipped years; one month must cost well under half
    assert(sortedScan * 2 <= scrambledScan,
      s"clustered scan materialized $sortedScan vs $scrambledScan — " +
        "row groups are not being skipped")
    // a scan can never materialize fewer rows than the query returns
    val matched = sortedRows.head.getLong(0)
    assert(sortedScan >= matched, s"$sortedScan < $matched matched rows")
    // and physical layout must be invisible in the numbers
    assert(sortedRows == scrambledRows,
      s"layouts disagree: $sortedRows vs $scrambledRows")
  }
}
