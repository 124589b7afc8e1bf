package graft

import org.apache.spark.sql.SparkSession

/** The one local-mode session recipe shared by every gate entry point
  * (Verify, Bench, tools.TimeQuery, tools.Explain, tools.PlanAudit):
  * shuffle partitions = cores (the CLAUDE.md sizing rule), UTC, graft
  * extensions, no UI. Centralized because a conf drift between these mains
  * would make a plan audit or a single-query timing measure a DIFFERENT
  * engine than the one the correctness gate runs.
  *
  * The hockey CLIs (Experiment, Subsample) intentionally keep their own
  * config — SPARK_MASTER override, reference appName, no extensions — they
  * model the reference deployment, not the gate. */
object LocalSession {
  def fromEnv(defaultCpus: String, logLevel: String = "WARN"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
