package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed fact table: 90% of rows share key 1
  private lazy val fact = ((1 to 90).map(i => (1, s"v$i")) ++
    (1 to 10).map(i => (i + 1, s"w$i"))).toDF("k", "payload")
  private lazy val dim = (1 to 11).map(i => (i, s"dim$i")).toDF("k", "attr")

  test("salted join equals the plain join") {
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "attr")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), numSalts = 4)
      .select("k", "payload", "attr")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 100)
  }

  test("salted aggregation equals the plain aggregation") {
    val plain = fact.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    val salted = Skew.saltedAgg(fact, Seq("k"), numSalts = 4) {
      (df, keys) => df.groupBy(keys: _*).agg(count(lit(1)).as("pn"))
    } { (df, keys) => df.groupBy(keys: _*).agg(sum($"pn").as("n")) }
      .as[(Int, Long)].collect().toMap
    assert(salted == plain)
    assert(salted(1) == 90L)
  }
}
