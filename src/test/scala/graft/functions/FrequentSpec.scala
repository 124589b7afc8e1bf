package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FrequentSpec extends SparkSpec {
  import spark.implicits._

  test("misra-gries: bounded size, no false negatives above n/(k+1), merge-safe") {
    // skewed stream: 2 heavy items + 600 singletons; k = 16 ⇒ the guarantee
    // bound is n/(k+1) = 1020/17 = 60, so "hot" (300) and "warm" (120) MUST
    // survive any merge order. repartition(7) forces real partial merges.
    val rows = Seq.fill(300)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 600).map(i => s"cold$i")
    val cands = rows.toDF("tok").repartition(7)
      .agg(Frequent.misraGries($"tok", 16)).head().getSeq[String](0)
    assert(cands.size <= 16)
    assert(cands.contains("hot") && cands.contains("warm"))
    assert(cands == cands.sorted) // eval publishes a canonical order
  }

  test("two-pass heavy hitters equals the brute-force frequency filter") {
    val hh = graft.ops.TextQueries.heavyHitters(spark, sf0001)
      .orderBy("tok").as[(String, Long, Double)].collect()
    val toks = graft.Tables.documents(spark, sf0001)
      .select(explode(TextFunctions.tokens($"text")).as("tok"))
    val n = toks.count()
    val brute = toks.groupBy("tok").count()
      .filter($"count" * 100 >= n)
      .orderBy("tok").as[(String, Long)].collect()
    assert(hh.nonEmpty && hh.map(r => (r._1, r._2)).toSeq == brute.toSeq)
    spark.catalog.clearCache() // heavyHitters caches its token frame
  }
}
