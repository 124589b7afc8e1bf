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
}
