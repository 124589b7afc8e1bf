package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

import graft.SparkEntry

/** One-line-per-query physical-plan audit: how many scans, shuffle
  * exchanges, broadcasts, sorts, and whole-stage-codegen spans each gate
  * query plans — the at-a-glance review for "does this operator shuffle
  * more than it must?" Writes a markdown table (PLANS.md when given a
  * path, stdout otherwise).
  *
  * Usage: runMain graft.tools.PlanAudit [outFile] [--dir sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.sliding(2).collectFirst { case Array("--dir", d) => d }
      .getOrElse("/root/testdata/sf0.01")
    val outFile = args.filterNot(_.startsWith("--"))
      .filterNot(a => args.sliding(2).exists {
        case Array(f, v) => f == "--dir" && v == a; case _ => false
      }).headOption

    val spark = graft.LocalSession.fromEnv(defaultCpus = "8", logLevel = "ERROR")

    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case _ => Seq(p)
      }
      self ++ p.children.flatMap(flatten) ++
        p.subqueries.flatMap(flatten)
    }

    // numeric qNN(N) order, not lexicographic (q100 after q99, not at q10)
    val rows = SparkEntry.queries.toSeq.sortBy { case (name, _) =>
      ("""\d+""".r.findFirstIn(name).map(_.toInt).getOrElse(Int.MaxValue), name)
    }.map { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan
        val nodes = flatten(plan)
        val names = nodes.map(_.nodeName)
        Seq(name,
          names.count(_.contains("Scan")).toString,
          nodes.count(_.isInstanceOf[ShuffleExchangeExec]).toString,
          nodes.count(_.isInstanceOf[BroadcastExchangeExec]).toString,
          names.count(_.startsWith("Sort")).toString,
          names.count(_.contains("HashAggregate")).toString)
      } catch {
        case e: Throwable => Seq(name, "ERR", e.getClass.getSimpleName, "", "", "")
      }
    }

    val header = Seq("query", "scans", "shuffles", "broadcasts", "sorts",
      "hashAggs")
    val table = (Seq(header, header.map(_ => "---")) ++ rows)
      .map(_.mkString("| ", " | ", " |")).mkString("\n")
    val doc =
      s"""# Physical-plan audit (sf dir: $dir)
         |
         |Per gate query: node counts from the initial physical plan
         |(AQE may further coalesce at runtime). Review rule of thumb:
         |shuffles should match the operator's semantic needs (one per
         |repartition/groupBy/fact-fact join), dimension joins should be
         |broadcasts, and window families should share one sort. (Codegen spans
         |are applied per query stage at AQE materialization, so they are not
         |countable pre-execution.)
         |
         |$table
         |""".stripMargin
    outFile match {
      case Some(f) =>
        java.nio.file.Files.write(java.nio.file.Paths.get(f), doc.getBytes)
        println(s"wrote $f")
      case None => println(doc)
    }
    spark.stop()
  }
}
