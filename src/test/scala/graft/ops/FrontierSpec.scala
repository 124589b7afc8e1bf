package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property tests for the round-4 analytic gates that have non-obvious
  * algebra: the banded two-phase skyline (distributivity soundness) and
  * the exact-moments correlation (vs direct driver-side computation).
  * The gate queries prove oracle equality on the corpus; these prove the
  * ALGORITHM on adversarial/random inputs the corpus may not contain.
  */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  /** Reference skyline: O(n²) dominance test, the semantics the q133
    * oracle states. Minimize price, maximize size. */
  private def bruteSkyline(pts: Seq[(Long, Long, Int)]): Set[(Long, Long, Int)] =
    pts.filter { p =>
      !pts.exists(q =>
        (q._2 < p._2 && q._3 >= p._3) || (q._2 <= p._2 && q._3 > p._3))
    }.toSet

  private def sparkSkyline(pts: Seq[(Long, Long, Int)]): Set[(Long, Long, Int)] = {
    val dir = graft.Scratch.fresh("sky").toString
    pts.toDF("p_partkey", "cents", "p_size")
      .select($"p_partkey",
        ($"cents".cast("double") / 100).as("p_retailprice"), $"p_size",
        lit("B").as("p_brand"), lit("t").as("p_type"), lit("n").as("p_name"))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    ExtendedQueries.skyline(spark, dir)
      .as[(Long, Long, Int)].collect().toSet
  }

  test("banded skyline equals brute-force dominance on seeded random points") {
    val rnd = new scala.util.Random(7)
    // prices span many $100 bands so the band-local phase really prunes
    val pts = (1L to 400L).map(i =>
      (i, 1000L + rnd.nextInt(500000).toLong, 1 + rnd.nextInt(50)))
    assert(sparkSkyline(pts) == bruteSkyline(pts))
  }

  test("banded skyline keeps duplicated frontier points and strict dominators win") {
    // two copies of a frontier point (neither strictly dominates the other),
    // one point dominated only CROSS-band (its dominator sits in a cheaper
    // band — exercises the phase-2 merge), one in-band domination
    val pts = Seq(
      (1L, 10000L, 40), (2L, 10000L, 40), // duplicated frontier point
      (3L, 30000L, 39), // dominated cross-band by 1/2 (cheaper, bigger)
      (4L, 10500L, 10), // dominated in-band by 1/2
      (5L, 5000L, 5)) // frontier: cheapest
    assert(sparkSkyline(pts) == bruteSkyline(pts))
    assert(sparkSkyline(pts).map(_._1) == Set(1L, 2L, 5L))
  }

  test("exact-moments correlation matches direct computation") {
    val rnd = new scala.util.Random(11)
    val xs = (1 to 300).map(_ => 100L + rnd.nextInt(100000).toLong)
    val ys = xs.map(x => (x / 1000 + rnd.nextInt(20)).toInt) // correlated
    val dir = graft.Scratch.fresh("corr").toString
    xs.zip(ys).zipWithIndex.map { case ((x, y), i) =>
      (i.toLong, x.toDouble / 100, y, "B", "t", "n")
    }.toDF("p_partkey", "p_retailprice", "p_size", "p_brand", "p_type", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = ExtendedQueries.exactCorr(spark, dir)
      .select($"corr").as[Double].head()
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.map(_.toLong).sum.toDouble)
    val sxx = xs.map(x => x * x).sum.toDouble
    val syy = ys.map(y => y.toLong * y).sum.toDouble
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(got - want) < 1e-9)
  }

  test("correlation is NULL for zero-variance groups") {
    val dir = graft.Scratch.fresh("corr0").toString
    Seq((1L, 10.0, 5, "B", "t", "n"), (2L, 10.0, 9, "B", "t", "n"))
      .toDF("p_partkey", "p_retailprice", "p_size", "p_brand", "p_type", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val row = ExtendedQueries.exactCorr(spark, dir).head()
    assert(row.isNullAt(row.fieldIndex("corr")))
  }
}
