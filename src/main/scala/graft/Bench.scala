package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * `$SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Protocol: one untimed warm-up pass over all queries first (JIT +
  * whole-stage-codegen compilation + file-system cache + any operator-level
  * caches), then one timed pass in sorted name order — so per-query numbers
  * measure steady-state plan execution, not first-query session warm-up.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.fromEnv(defaultCpus = "4")

    // Execute the FULL physical plan via the noop sink: a plain df.count()
    // would let Catalyst prune every projection/window the query exists to
    // compute (a string-functions query would be timed as a bare scan).
    def execute(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (name, fn) =>
      try execute(fn) catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
    }
    // Operators that cache intermediates (e.g. the minhash shingle table)
    // leave warm entries behind; clear so every timed run executes its FULL
    // plan instead of reading the warm-up's cached partitions.
    spark.catalog.clearCache()

    // failed queries report -1 (never a fake positive time) and are
    // excluded from the total
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { execute(fn); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      spark.catalog.clearCache() // no cross-query cache accumulation
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Artifact robustness (VERDICT r2 #4): the driver's log scraping
    // truncated the r2 JSON line, losing 20 query timings. Persist the
    // result to a fixed path too, so the artifact never depends on stdout.
    try java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    spark.stop()
  }
}
