package graft.tools

import graft.SparkSpec
import graft.tools.KCoreCertify.CensusRow

/** Pins the q301 second-scale self-certifier (VERDICT r14 #2).
  *
  * The sf0.1 certification itself runs in `tools/sweep_sf01.sh` (and its
  * result is recorded in VERIFY_SF01.md); this spec proves the CERTIFIER
  * at the always-on scale: (a) the independent driver-side reference
  * reproduces the engine's census at sf0.001, (b) the reference peel is
  * correct on a hand-computed graph, and (c) the comparator actually
  * detects a tampered census (non-vacuity — a comparator that returns
  * None unconditionally would "certify" anything).
  */
class KCoreCertifySpec extends SparkSpec {

  test("reference peel on a hand-computed graph") {
    // Graph: triangle {1,2,3} + pendant 4-1. Degrees 3,2,2,1 → k = 8/4 = 2.
    // Round 1: remove 4 (deg 1); edges left = triangle (3).
    // Rounds 2-3: everyone has degree 2 ≥ k — nothing removed.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val (k, census) = KCoreCertify.referenceCensus(edges)
    assert(k == 2L)
    assert(census == Seq(CensusRow(1, 1, 3, 3), CensusRow(2, 0, 3, 3),
      CensusRow(3, 0, 3, 3)))
  }

  test("engine census == independent reference census at sf0.001") {
    val engine = KCoreCertify.engineCensus(spark, sf0001)
    val edges = KCoreCertify.referenceEdges(spark, sf0001)
    val (_, reference) = KCoreCertify.referenceCensus(edges)
    assert(engine.size == 3 && reference.size == 3)
    assert(KCoreCertify.mismatch(engine, reference).isEmpty,
      s"engine $engine vs reference $reference")
  }

  test("non-vacuity: a tampered census row is detected") {
    val ref = Seq(CensusRow(1, 1, 3, 3), CensusRow(2, 0, 3, 3))
    val tampered = Seq(CensusRow(1, 1, 3, 3), CensusRow(2, 0, 3, 4))
    assert(KCoreCertify.mismatch(tampered, ref).nonEmpty)
    // and row order must not matter
    assert(KCoreCertify.mismatch(ref.reverse, ref).isEmpty)
  }
}
