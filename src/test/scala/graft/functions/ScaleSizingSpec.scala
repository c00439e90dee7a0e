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

  // ---- r17 default-form sizing rules (VERDICT r16 task 1) ----------------

  import SimilarityFunctions.{cellsForCorpus, sampleModForScope}

  test("q81 cells: measured datapoints and the gate identity") {
    // gate fixtures derive the PINNED k=8 (oracle unrolls exactly 8 cells):
    // sf0.01 = 500 vectors, sf0.1 = 2000 vectors
    assert(cellsForCorpus(500, 2000, 8) === 8)
    assert(cellsForCorpus(2000, 2000, 8) === 8)
    // the measured 100× recipe point: k=800 → 20.3× (SCALETREND_r16.json)
    assert(cellsForCorpus(200000, 2000, 8) === 800)
    assert(cellsForCorpus(20000, 2000, 8) === 80) // 10×
    intercept[IllegalArgumentException](cellsForCorpus(0, 2000, 8))
  }

  test("q81 cells: per-cell population law — occupancy never exceeds the base") {
    val prop = Prop.forAll(Gen.chooseNum(1L, 1000000000L)) { n =>
      val cells = cellsForCorpus(n, 2000, 8)
      // expected population n/cells stays at or below the calibrated 250
      n.toDouble / cells <= 2000.0 / 8 + 1e-9
    }
    val res = SCTest.check(SCTest.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }

  test("q134 docMod: measured datapoints and the gate identity") {
    // gate fixtures derive the PINNED docMod=1 (oracle replays unsampled
    // scopes): sf0.01 = 25 docs/scope, sf0.1 = 250 docs/scope
    assert(sampleModForScope(25.0, 250.0) === 1)
    assert(sampleModForScope(250.0, 250.0) === 1)
    // the measured 100× recipe point: docMod=100 → 1.4× (SCALETREND_r16.json)
    assert(sampleModForScope(25000.0, 250.0) === 100)
    assert(sampleModForScope(2500.0, 250.0) === 10) // 10×
    // an empty sample (avg 0) degrades to no sampling, not a crash
    assert(sampleModForScope(0.0, 250.0) === 1)
    intercept[IllegalArgumentException](sampleModForScope(10.0, 0.0))
  }

  test("q134 docMod: sampled per-scope population law") {
    val prop = Prop.forAll(Gen.chooseNum(1.0, 1.0e9)) { pop =>
      val mod = sampleModForScope(pop, 250.0)
      // the sampled population pop/mod returns to within ~2x the base shape
      pop / mod <= 2 * 250.0 + 1e-9
    }
    val res = SCTest.check(SCTest.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }
}
