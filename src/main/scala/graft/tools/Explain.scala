package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan-audit utility: print the formatted physical plan of one or all
  * SparkEntry queries. The review checklist per query: filters appear in
  * `PushedFilters`, `ReadSchema` carries only referenced columns, dimension
  * joins are `BroadcastHashJoin`, aggregates split partial/final around one
  * exchange, and window specs share a single sort+exchange.
  *
  * Usage: runMain graft.tools.Explain [queryName ...] [--dir sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.sliding(2).collectFirst { case Array("--dir", d) => d }
      .getOrElse("/root/testdata/sf0.01")
    val names = args.filterNot(_.startsWith("--")).filterNot(a => args.sliding(2)
      .exists { case Array(f, v) => f == "--dir" && v == a; case _ => false })
    val spark = graft.LocalSession.fromEnv(defaultCpus = "8", logLevel = "ERROR")
    val chosen = if (names.nonEmpty) names.toSeq else SparkEntry.queries.keys.toSeq.sorted
    chosen.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n=== $name ===")
          fn(spark, dir).explain("formatted")
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
