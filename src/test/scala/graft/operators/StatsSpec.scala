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

  test("exactPercentile matches percentile() for p25/p50/p75 on integral data") {
    val li = Tables.lineitem(spark, sf0001)
    for (p <- Seq(0.25, 0.5, 0.75)) {
      val viaAgg = li.agg(expr(s"percentile(l_quantity, ${p}D)")).head().getDouble(0)
      val viaPrune = Stats.exactPercentile(li, "l_quantity", p)
      // integral values + dyadic p → single exact double on any engine
      assert(viaAgg == viaPrune, s"p=$p: $viaAgg vs $viaPrune")
    }
  }

  test("property: exactPercentile equals the percentile aggregate on random data") {
    // a handful of seeded random shapes (sizes, duplicates, negatives)
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 50 + rng.nextInt(400)
      val base = Seq.fill(n)(math.floor(rng.nextGaussian() * 50) - 10)
      val data = (base ++ base.take(rng.nextInt(n))).toDF("v") // duplicates
      val p = Seq(0.0, 0.1, 0.5, 0.9, 1.0)(trial % 5)
      val viaAgg = data.agg(expr(s"percentile(v, ${p}D)")).head().getDouble(0)
      val viaPrune = Stats.exactPercentile(data, "v", p, buckets = 32, maxCollect = 16)
      assert(viaAgg == viaPrune, s"trial $trial p=$p: $viaAgg vs $viaPrune")
    }
  }

  test("groupedPercentile matches the percentile aggregate per group") {
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(4000) { i =>
      val g = s"g${i % 3}"
      val v = g match {
        case "g0" => math.floor(rng.nextGaussian() * 100)
        case "g1" => (i % 97).toDouble
        case _    => 42.0 // fully degenerate group
      }
      (g, v)
    } :+ (("g3", 5.0)) // singleton group
    val df = rows.toDF("g", "v")
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val viaAgg = df.groupBy("g").agg(expr(s"percentile(v, ${p}D)").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      // tiny buckets/maxCollect force several narrowing levels
      val viaPrune = Stats.groupedPercentile(df, "g", "v", p,
        buckets = 16, maxCollect = 8)
      assert(viaPrune.keySet == viaAgg.keySet.map(identity[Any]))
      viaAgg.foreach { case (g, want) =>
        assert(viaPrune(g) == want, s"p=$p group $g: ${viaPrune(g)} vs $want")
      }
    }
  }

  test("NaN and infinities are excluded instead of poisoning the histogram") {
    val df = (Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity) ++
      (1 to 99).map(_.toDouble)).toDF("v")
    // quantiles over the 99 finite values only (no degenerate driver path)
    assert(Stats.exactPercentile(df, "v", 0.5, buckets = 16, maxCollect = 8) == 50.0)
    val g = df.withColumn("g", lit("x"))
    assert(Stats.groupedPercentile(g, "g", "v", 0.5,
      buckets = 16, maxCollect = 8) == Map[Any, Double]("x" -> 50.0))
  }

  test("balanced two-valued data resolves without narrowing (straddle case)") {
    // r1 falls on the last row of the first bucket and r2 on the first row
    // of the last — narrowing would keep the full range forever; the
    // straddle must resolve via the max/min-of-edge-buckets aggregate
    val df = (Seq.fill(1000)(0.0) ++ Seq.fill(1000)(1.0)).toDF("v")
    assert(Stats.exactPercentile(df, "v", 0.5, buckets = 16, maxCollect = 2) == 0.5)
    val g = (Seq.fill(5000)(("g0", 0.0)) ++ Seq.fill(5000)(("g0", 1.0))).toDF("g", "v")
    assert(Stats.groupedPercentile(g, "g", "v", 0.5,
      buckets = 16, maxCollect = 8) == Map[Any, Double]("g0" -> 0.5))
  }

  test("groupedPercentiles: several ps in one loop equal the per-p answers") {
    // the multi-p path (range-shared narrowing, VERDICT r10 #5) must be
    // bit-identical to N independent single-p loops — including ps that
    // fork into different buckets of one group, ps that SHARE a target
    // bucket, and degenerate/singleton groups; tiny buckets/maxCollect
    // drive several levels so child ranges genuinely fork and re-merge
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(6000) { i =>
      val g = s"g${i % 3}"
      val v = g match {
        case "g0" => math.floor(rng.nextGaussian() * 100)
        case "g1" => (i % 97).toDouble
        case _    => 42.0
      }
      (g, v)
    } :+ (("g3", 5.0))
    val df = rows.toDF("g", "v")
    val ps = Seq(0.05, 0.1, 0.5, 0.51, 0.9, 0.95)
    val multi = Stats.groupedPercentiles(df, "g", "v", ps,
      buckets = 16, maxCollect = 8)
    ps.foreach { p =>
      val single = Stats.groupedPercentile(df, "g", "v", p,
        buckets = 16, maxCollect = 8)
      single.foreach { case (g, want) =>
        assert(multi((g, p)) == want, s"p=$p group $g: ${multi((g, p))} vs $want")
      }
    }
    // and against the builtin aggregate (exactness, not just self-parity)
    ps.foreach { p =>
      val viaAgg = df.groupBy("g").agg(expr(s"percentile(v, ${p}D)").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      viaAgg.foreach { case (g, want) =>
        assert(multi((g, p)) == want, s"agg p=$p group $g")
      }
    }
  }

  test("groupedPercentiles: two ps resolving in different buckets of one range") {
    // regression for the pair-collapse bug: a Map.map to (rid, bucket)
    // pairs silently dropped one of two resolve buckets of the same range
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val multi = Stats.groupedPercentiles(df, "g", "v", Seq(0.05, 0.95),
      buckets = 16, maxCollect = 100)
    for (p <- Seq(0.05, 0.95)) {
      val want = df.agg(expr(s"percentile(v, ${p}D)")).head().getDouble(0)
      assert(multi(("g", p)) == want, s"p=$p: ${multi(("g", p))} vs $want")
    }
  }

  test("recursive narrowing (tiny maxCollect) returns the same quantiles") {
    // maxCollect=4 forces the histogram to narrow several levels before
    // the final bounded take — must agree with the one-shot answer
    val vs = (1 to 5000).map(i => (i * 37 % 4999) / 7.0).toDF("v")
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val oneShot = Stats.exactPercentile(vs, "v", p)
      val recursed = Stats.exactPercentile(vs, "v", p, buckets = 16, maxCollect = 4)
      assert(oneShot == recursed, s"p=$p: $oneShot vs $recursed")
    }
  }
}
