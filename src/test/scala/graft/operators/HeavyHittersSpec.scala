package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SpaceSaving candidate pass and the exact verify around it: the
  * superset guarantee must hold under adversarial arrival orders, and the
  * two-pass operator must equal the naive exact computation regardless of
  * partitioning — exactness is the operator's contract, the sketch only
  * bounds memory. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: key i appears ~N/i times. */
  private def zipf(nKeys: Int, scale: Int): Seq[String] =
    (1 to nKeys).flatMap(i => Seq.fill(scale / i)(s"k$i"))

  test("spaceSavingKeys: every above-floor item survives, summary stays bounded") {
    val stream = zipf(400, 2000) // ~2000 + 1000 + 666 + ... tail of 5s
    val n = stream.size
    val m = 64
    val mustKeep = stream.groupBy(identity).view.mapValues(_.size)
      .filter { case (_, c) => c > n / m }.keySet
    // adversarial orders: heavy-first (evictions hit the tail), heavy-LAST
    // (heavies must displace an already-full summary), shuffled
    val orders = Seq(
      stream.sorted,
      stream.sorted.reverse,
      new scala.util.Random(7).shuffle(stream))
    orders.zipWithIndex.foreach { case (order, i) =>
      val kept = HeavyHitters.spaceSavingKeys(order.iterator, m).toSet
      assert(kept.size <= m, s"order $i: summary exceeded m")
      val missed = mustKeep.diff(kept)
      assert(missed.isEmpty, s"order $i dropped above-floor keys: $missed")
    }
  }

  test("heavyHitters equals the naive exact computation under any partitioning") {
    val stream = zipf(300, 1500)
    val n = stream.size
    val k = 50
    val expected = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
    assert(expected.nonEmpty && expected.size < 30, s"bad fixture: $expected")
    for (parts <- Seq(1, 7, 32)) {
      // m barely above k → constant per-partition state, real evictions
      val got = HeavyHitters.heavyHitters(
        stream.toDF("term").repartition(parts), "term", k = k, m = k + 5)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts: $got vs $expected")
    }
  }

  test("exactly-at-floor keys are excluded (strict inequality)") {
    // 10 keys x 10 occurrences, n=100, k=10: every count*k == n, none pass
    val flat = (1 to 10).flatMap(i => Seq.fill(10)(s"f$i"))
    val got = HeavyHitters.heavyHitters(flat.toDF("term"), "term", k = 10, m = 32)
    assert(got.count() == 0, "floor must be strict")
  }
}
