package graft.functions

import scala.util.Random

import graft.SparkSpec

/** Native-expression specs, including seeded property-style checks (plain
  * ScalaTest loops — the scalatest↔scalacheck bridge artifact isn't in the
  * offline dependency set). */
class NativeSpec extends SparkSpec {
  import spark.implicits._

  test("SQL registration: graft_cosine and graft_rolling_hash usable from spark.sql") {
    Native.registerSql(spark)
    val row = spark.sql(
      """SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |       graft_rolling_hash('ab') AS h""".stripMargin).head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getLong(1) == 97L * 31 + 98) // (0*31+97)*31+98
  }

  test("native shingles are identical to the HOF formulation (incl. edges)") {
    import graft.operators.Dedup
    val rnd = new Random(11)
    val words = Seq("the", "quick", "brown", "fox", "über", "日本", "a", "bb")
    val docs = (Seq(
      "", " ", "one", "one two", "one two three", "a  b\t\nc", " lead trail ",
      "tab\tsep\nnl", "x  y \f z \r w") ++
      Seq.fill(40)(Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size)))
        .mkString(" ")))
      .zipWithIndex.map(_.swap).toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val got = docs.select($"id", Dedup.wordShingles($"text", n).as("s"))
        .orderBy("id").as[(Int, Seq[String])].collect().toSeq
      val want = docs.select($"id", Dedup.wordShinglesHof($"text", n).as("s"))
        .orderBy("id").as[(Int, Seq[String])].collect().toSeq
      assert(got == want, s"shingle mismatch at n=$n")
    }
  }

  test("native tokens are identical to the split+filter formulation") {
    val docs = Seq("", " ", "one", " a  b\t\nc ", "x \f y \r z", "über 日本 ok")
      .zipWithIndex.map(_.swap).toDF("id", "text")
    val got = docs.select($"id", TextFunctions.tokens($"text").as("t"))
      .orderBy("id").as[(Int, Seq[String])].collect().toSeq
    val want = docs.select($"id", TextFunctions.tokensHof($"text").as("t"))
      .orderBy("id").as[(Int, Seq[String])].collect().toSeq
    assert(got == want)
  }

  test("SQL registration: graft_shingles usable from spark.sql") {
    Native.registerSql(spark)
    val row = spark.sql(
      "SELECT graft_shingles('a b c d', 3) AS s").head().getSeq[String](0)
    assert(row == Seq("a b c", "b c d"))
  }

  test("rolling hash property: in [0, 1e9+7), deterministic, order-sensitive") {
    Native.registerSql(spark)
    val rnd = new Random(42)
    val strs = Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(60)).mkString)
    val hs = strs.toDF("s").selectExpr("graft_rolling_hash(s) AS h")
      .as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < 1000000007L))
    val again = strs.toDF("s").selectExpr("graft_rolling_hash(s) AS h")
      .as[Long].collect()
    assert(hs.toSeq == again.toSeq)
    val Seq(h1, h2) = Seq("ab", "ba").toDF("s")
      .selectExpr("graft_rolling_hash(s) AS h").as[Long].collect().toSeq
    assert(h1 != h2)
  }

  test("cosine property: fused loop stays in [-1,1], symmetric, equals HOF baseline") {
    val rnd = new Random(7)
    val pairs = Seq.fill(100)((
      Array.fill(16)(rnd.nextDouble() * 20 - 10),
      Array.fill(16)(rnd.nextDouble() * 20 - 10)))
    val rows = pairs.toDF("a", "b").select(
      Native.cosine($"a", $"b").as("ab"),
      Native.cosine($"b", $"a").as("ba"),
      graft.operators.Ann.cosine($"a", $"b").as("hof"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (ab, ba, hof) =>
      assert(ab >= -1.0000001 && ab <= 1.0000001)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab == hof, "fused loop must be bit-identical to the HOF fold")
    }
  }
}
