package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The LSH sizing recipe as an executable law (BASELINE.md measured it; this
  * pins the arithmetic): planes grow with log2 of corpus growth, keeping
  * expected bucket occupancy — and pair fan-out — bounded by a constant.
  */
class ScaleSizingSpec extends AnyFunSuite {

  import SimilarityFunctions.planesForCorpus

  test("measured datapoints: 4 planes at 2k vectors -> 8 planes at 10x") {
    assert(planesForCorpus(2000, 2000, 4) === 4)
    assert(planesForCorpus(20000, 2000, 4) === 8)   // the BASELINE A/B point
    assert(planesForCorpus(2000000, 2000, 4) === 14) // 1000x
  }

  test("occupancy law: corpus / 2^planes never exceeds 2x the base occupancy") {
    val prop = Prop.forAll(Gen.chooseNum(0, 29)) { g =>
      val base = 4096L
      val n = base << g
      val planes = planesForCorpus(n, base, 6)
      val occupancy = n.toDouble / (1L << math.min(planes, 62))
      val baseOcc = base.toDouble / (1 << 6)
      occupancy <= 2 * baseOcc
    }
    val res = SCTest.check(SCTest.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }

  test("shrinking corpora never reduce below basePlanes; invalid args rejected") {
    assert(planesForCorpus(10, 2000, 4) === 4)
    intercept[IllegalArgumentException](planesForCorpus(0, 10, 4))
  }
}
