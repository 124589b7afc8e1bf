package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * `$SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Protocol: one untimed warm-up pass over all queries first (JIT +
  * whole-stage-codegen compilation + file-system cache + any operator-level
  * caches), then N timed suite passes in sorted name order with per-query
  * min — so per-query numbers measure steady-state plan execution, not
  * first-query session warm-up or whichever query a GC pause happened to
  * land on.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Bench times the PRODUCTION plans: q64's exact yardstick twins (a
    // multi-scan that exists only to verify the sketches at the sf0.01
    // correctness gate) are switched off here — see
    // ExtendedQueries.yardstickEnabled. SPARK_GRAFT_YARDSTICK=on re-enables.
    if (!sys.props.contains("graft.yardstick"))
      System.setProperty("graft.yardstick", "off")
    // q148 (exact O(n²) mutual-kNN) is likewise a yardstick — it exists
    // only as q149's recall baseline (AnnQueries.mutualKnn doc). It stays
    // in the bench because at the gate corpus it is cheap (~1.4 s at
    // sf0.1), but it must NOT be scaled with the corpus — and that is now
    // ENFORCED, not just documented (VERDICT r6 #3): mutualKnn fails fast
    // past AnnQueries.MutualKnnExactCap rows with a pointer at q149.
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

    // Timed passes: the whole suite is run SPARK_GRAFT_BENCH_TRIALS times
    // (default 3) and each query reports its MIN across passes. Rationale
    // (r3 finding #2): four adjacent memory-heavy queries drifted 2.9-4.2×
    // in-suite while their isolated times were unchanged — single-JVM
    // GC/fragmentation noise from the 100-query run, not plan regressions
    // (adjudicated with TimeQuery, r4). The min across suite passes is the
    // steady-state plan cost; a GC hit lands on different queries each pass.
    // Default raised 2 → 3 in r4: back-to-back full-suite runs of identical
    // code measured 125 s vs 181 s total (shared-host tenancy noise swamping
    // any single pass); a third pass materially tightens the per-query min.
    val trials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "3").toInt.max(1)
    // failed queries report -1 (never a fake positive time) and are
    // excluded from the total
    def timedPass(): Map[String, Double] = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { execute(fn); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      // stop the clock BEFORE the inter-query cache clear: unpersisting
      // another query's leftovers is harness bookkeeping, not plan cost
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // no cross-query cache accumulation
      name -> (if (ok) dt else -1.0)
    }.toMap
    val passes = (1 to trials).map(_ => timedPass())
    val results = ordered.map { case (name, _) =>
      val ts = passes.map(_(name)).filter(_ >= 0)
      name -> (if (ts.nonEmpty) ts.min else -1.0)
    }
    // Self-adjudication (VERDICT r4 #1): min-of-N alone cannot distinguish
    // a plan regression from host contention after the fact. Alongside the
    // per-query min, the artifact records each trial's full-suite total and
    // every query's max across trials, so a reader can see the spread (a
    // quiet run shows trial totals within ~1.3×; a contended one does not)
    // and which queries absorbed the noise — without re-running anything.
    val trialTotals = passes.map(_.values.filter(_ >= 0).sum)
    val maxima = ordered.map { case (name, _) =>
      val ts = passes.map(_(name)).filter(_ >= 0)
      name -> (if (ts.nonEmpty) ts.max else -1.0)
    }
    // 3-decimal timings: millisecond precision is all the measurement
    // carries, and shorter lines are likelier to survive the driver's
    // log-tail intact (r2 AND r3 both head-truncated full-precision lines).
    def r3d(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3d(v) }
      .mkString("{", ",", "}")
    val qsMax = maxima.map { case (k, v) => "\"" + k + "\":" + r3d(v) }
      .mkString("{", ",", "}")
    val totals = trialTotals.map(r3d).mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":${r3d(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","trials":$trials,"trial_totals":$totals,"queries_max":$qsMax}"""
    println(line)
    // Artifact robustness (VERDICT r2 #4, r3 #3), belt and braces:
    //  1. the full line above (complete per-query map, if the tail holds);
    //  2. a SHORT total-only line that fits any log tail;
    //  3. the full JSON written to bench.json in the repo (committed per
    //     round) and to $SPARK_GRAFT_BENCH_OUT (default /tmp/bench.json,
    //     kept for compatibility with the r2/r3 recovery path).
    println(s"""{"metric":"total","value":${r3d(total)},"unit":"sec","nq":${results.size},"sf":"$sfDir","trial_totals":$totals}""")
    def persist(path: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(path),
        (line + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] write $path failed: ${e.getMessage}") }
    persist(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json"))
    persist("bench.json") // sbt cwd = repo root
    spark.stop()
  }
}
