package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Approximate-aggregate surface (SURVEY §2.4: absent from the reference,
  * exposed by the engine as the cardinality/quantile scale path). Sketches
  * are engine-specific, so there is no DuckDB hash oracle — instead the
  * spec pins them within tolerance of the exact answers. At 100 TB these
  * replace exact distinct counts (no Expand blow-up, mergeable partials)
  * and exact medians (no full sort). */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.lineitem(spark, sf0001)
    val (approx, exact) = li.agg(
      approx_count_distinct($"l_partkey").as("a"),
      countDistinct($"l_partkey").as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val li = Tables.lineitem(spark, sf0001)
    val (approx, exact) = li.agg(
      percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("a"),
      median($"l_quantity").as("e"))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) <= 1.0, s"approx=$approx exact=$exact")
  }

  test("q217 bitmap distinct equals exact countDistinct on every group") {
    val rows = ExtendedQueries.bitmapDistinct(spark, sf0001)
      .select($"ym", $"n_exact", $"n_distinct_bitmap", $"n_words")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 80)
    rows.foreach { case (ym, exact, bitmap, words) =>
      assert(bitmap == exact, s"$ym: bitmap=$bitmap exact=$exact")
      // word count is bounded by the id domain, never the row count
      assert(words <= exact && words >= (exact + 62) / 63, s"$ym words=$words")
    }
  }

  test("q218 portable HLL matches an independent JVM replay of the sketch") {
    val got = ExtendedQueries.portableHll(spark, sf0001)
      .select($"grp", $"n_exact", $"hll_est", $"n_filled")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq("A", "N", "R"))
    // third implementation, sharing nothing with Spark or DuckDB: plain
    // java.security MD5 over the distinct keys, same fixed-point estimator
    val keys = Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", $"l_partkey").distinct()
      .as[(String, Long)].collect().groupBy(_._1)
    got.foreach { case (grp, nExact, est, nFilled) =>
      val regs = scala.collection.mutable.Map.empty[Int, Int]
      for ((_, k) <- keys(grp)) {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(k.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val bucket = Integer.parseInt(hex.substring(0, 2), 16)
        val w = java.lang.Long.parseLong(hex.substring(2, 8), 16)
        val rho = if (w == 0L) 24 else 25 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        regs(bucket) = math.max(regs.getOrElse(bucket, 0), rho)
      }
      val ssum = regs.values.map(r => 1L << (24 - r)).sum +
        (256L - regs.size) * (1L << 24)
      val expected = (718274L * 65536L * (1L << 24)) / (1000000L * ssum)
      assert(nExact == keys(grp).length.toLong)
      assert(nFilled == regs.size.toLong, s"$grp: filled $nFilled vs ${regs.size}")
      assert(est == expected, s"$grp: est $est vs JVM replay $expected")
    }
  }
}
