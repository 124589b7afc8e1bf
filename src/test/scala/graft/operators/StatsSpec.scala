package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("exactMedian equals the median aggregate (odd n, even n, skew, constants)") {
    val odd = Seq(5.0, 1.0, 9.0, 3.0, 7.0).toDF("v")
    assert(Stats.exactMedian(odd, "v") == 5.0)
    val even = Seq(4.0, 1.0, 3.0, 2.0).toDF("v")
    assert(Stats.exactMedian(even, "v") == 2.5)
    val const = Seq.fill(10)(42.0).toDF("v")
    assert(Stats.exactMedian(const, "v") == 42.0)
    // heavy concentration in one histogram bucket still resolves exactly
    val skew = (Seq.fill(999)(1.0) ++ Seq(1000.0)).toDF("v")
    assert(Stats.exactMedian(skew, "v") == 1.0)
    assert(Seq.empty[Double].toDF("v").transform(df =>
      { assert(Stats.exactMedian(df, "v").isNaN); df }).count() == 0)
  }

  test("exactMedian matches median() on the real lineitem corpus") {
    val li = Tables.lineitem(spark, sf0001)
    val viaAgg = li.agg(expr("median(l_extendedprice)")).head().getDouble(0)
    val viaPrune = Stats.exactMedian(li, "l_extendedprice")
    assert(math.abs(viaAgg - viaPrune) < 1e-9, s"$viaAgg vs $viaPrune")
  }
}
