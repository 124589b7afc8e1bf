package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the bench.json canary acceptance decision
  * ([[Bench.canaryRefusal]]) — pure logic, no SparkSession.
  *
  * The load-bearing case is the ANCHOR-RATCHET (VERDICT r13 #2): under the
  * single-step rule alone, a chain of +14% acceptances walked r13's anchor
  * 0.794 → 0.953 with no step tripping the gate. The median-of-history
  * guard must kill such a chain within a step or two, while leaving
  * ordinary bounded host noise (±10% oscillation) freely accepted.
  */
class BenchCanarySpec extends AnyFunSuite {

  test("medianOf: odd, even, singleton") {
    assert(Bench.medianOf(Seq(3.0)) == 3.0)
    assert(Bench.medianOf(Seq(1.0, 3.0, 2.0)) == 2.0)
    assert(Bench.medianOf(Seq(4.0, 1.0, 3.0, 2.0)) == 2.5)
  }

  test("first-ever commit (no committed canary) is accepted") {
    assert(Bench.canaryRefusal(0.8, None, Nil).isEmpty)
  }

  test("failed canary (<= 0) is refused even on a steady history") {
    val r = Bench.canaryRefusal(-1.0, Some(0.8), Seq(0.8, 0.8, 0.8))
    assert(r.exists(_.contains("canary queries failed")))
  }

  test("single-step >15% vs latest anchor is refused") {
    val r = Bench.canaryRefusal(0.95, Some(0.8), Seq(0.8))
    assert(r.exists(_.contains("host not comparable")))
  }

  test("bounded host noise (±10% oscillation) is always accepted") {
    val hist = Seq(1.0, 0.9, 1.1, 0.95, 1.05)
    for (c <- Seq(0.95, 1.0, 1.08))
      assert(Bench.canaryRefusal(c, Some(hist.last), hist).isEmpty,
        s"canary $c should be accepted against $hist")
  }

  test("anchor-ratchet: a chain of +14% steps is refused by step 2") {
    // Replay the r13 drift: each step is within 15% of the PREVIOUS
    // accepted anchor, so the single-step rule alone accepts forever.
    var hist = Seq(0.794)
    var refusedAt = -1
    var c = 0.794
    var step = 0
    while (refusedAt < 0 && step < 6) {
      step += 1
      c = c * 1.14
      Bench.canaryRefusal(c, Some(hist.last), hist) match {
        case Some(why) =>
          refusedAt = step
          assert(why.contains("anchor-ratchet"),
            s"expected the median guard, got: $why")
        case None => hist = hist :+ c
      }
    }
    assert(refusedAt >= 1 && refusedAt <= 2,
      s"drift chain must die by step 2, survived to step $refusedAt " +
        s"(history ${hist.mkString(", ")})")
    // And the anchor cannot have migrated past ~1.15× of the origin.
    assert(hist.last <= 0.794 * 1.15 + 1e-9,
      s"anchor ratcheted to ${hist.last} before refusal")
  }

  test("median guard uses only the last 5 accepted canaries") {
    // Ancient slow entries must not veto a long-steady present.
    val hist = Seq(2.0, 2.0, 0.8, 0.8, 0.8, 0.8, 0.8)
    assert(Bench.canaryRefusal(0.8, Some(0.8), hist).isEmpty)
  }

  test("non-positive history entries are ignored, not median-polluting") {
    val hist = Seq(-1.0, 0.8, 0.8)
    assert(Bench.canaryRefusal(0.8, Some(0.8), hist).isEmpty)
  }

  // ---- nextHistory (r14 ADVICE: a refused run's artifact must not carry
  // the never-accepted canary — any written artifact's history must be
  // valid to promote as-is) ----

  test("nextHistory: accepted run appends, most recent last, capped at 8") {
    val h = Bench.nextHistory(0.82, Some(0.8), Seq(0.78, 0.8),
      rebaseline = false, isSubset = false)
    assert(h == Seq(0.78, 0.8, 0.82))
    val long = (1 to 9).map(i => 0.8 + i * 0.001)
    val capped = Bench.nextHistory(0.81, Some(long.last), long,
      rebaseline = false, isSubset = false)
    assert(capped.size == 8 && capped.last == 0.81)
  }

  test("nextHistory: a REFUSED canary leaves the committed history unchanged") {
    // >15% above both the anchor and the history median → persist refuses;
    // the artifact's history must therefore be the committed one verbatim.
    val h = Bench.nextHistory(1.2, Some(0.8), Seq(0.78, 0.8),
      rebaseline = false, isSubset = false)
    assert(h == Seq(0.78, 0.8), s"refused canary leaked into history: $h")
  }

  test("nextHistory: a failed canary (-1) never enters the history") {
    val h = Bench.nextHistory(-1.0, Some(0.8), Seq(0.8),
      rebaseline = false, isSubset = false)
    assert(h == Seq(0.8))
  }

  test("nextHistory: subset runs never touch the history, even rebaselined") {
    assert(Bench.nextHistory(0.81, Some(0.8), Seq(0.8),
      rebaseline = false, isSubset = true) == Seq(0.8))
    // subset refusal is not bypassable (CLAUDE.md), so neither is its
    // history freeze
    assert(Bench.nextHistory(0.81, Some(0.8), Seq(0.8),
      rebaseline = true, isSubset = true) == Seq(0.8))
  }

  test("nextHistory: re-baseline restarts the history at this run's canary") {
    val h = Bench.nextHistory(1.1, Some(0.8), Seq(0.78, 0.8),
      rebaseline = true, isSubset = false)
    assert(h == Seq(1.1))
  }
}
