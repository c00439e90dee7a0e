package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins `SimilarityFunctions.quant9Long` — the allocation-free 9-dp HALF_UP
  * rank key (r18 serving hot-path fix) — EXACTLY against the BigDecimal
  * reference it replaces. The differential gate compares rank orders across
  * engines, so any divergence here would flip oracle rows; the fast path
  * must agree on every double, including values engineered onto the
  * rounding boundaries its margin guard exists for.
  */
class Quant9Spec extends AnyFunSuite {

  private def ref(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).unscaledValue().longValue()

  test("quant9Long equals BigDecimal HALF_UP on boundary-adversarial values") {
    val adversarial = Seq(
      0.0, -0.0, 5e-10, -5e-10, 1.5e-9, -1.5e-9, 2.5e-9, -2.5e-9,
      0.1234567895, -0.1234567895, 1.9999999995, -1.9999999995,
      1.0, -1.0, 0.9999999999, 1.0000000001,
      1.0 / 3.0, -1.0 / 3.0, 2.0 / 3.0, -2.0 / 3.0,
      1e-12, -1e-12, 1e-18, -1e-18,
      math.nextUp(0.5e-9), math.nextDown(0.5e-9),
      math.nextUp(1.2345678905), math.nextDown(1.2345678905))
    adversarial.foreach { x =>
      assert(SimilarityFunctions.quant9Long(x) == ref(x), s"x=$x")
    }
  }

  test("quant9Long equals BigDecimal HALF_UP on random and boundary-adjacent doubles") {
    val rnd = new scala.util.Random(42)
    (1 to 200000).foreach { _ =>
      val x = rnd.nextDouble() * 4 - 2 // the cosine range the serving loops quantize
      assert(SimilarityFunctions.quant9Long(x) == ref(x), s"x=$x")
      // a value as close to the k + 0.5 half-boundary as doubles get — the
      // exact-fallback territory
      val k = rnd.nextInt(2000000000) - 1000000000
      val b = (k + 0.5) / 1e9
      assert(SimilarityFunctions.quant9Long(b) == ref(b), s"b=$b")
      assert(SimilarityFunctions.quant9Long(math.nextUp(b)) == ref(math.nextUp(b)))
      assert(SimilarityFunctions.quant9Long(math.nextDown(b)) == ref(math.nextDown(b)))
    }
  }

  test("quant9Long throws on scores outside the long-unscaled range (ADVICE r18)") {
    // |x| ≳ 9.2e9 overflows the scale-9 unscaled long; the old longValue()
    // fallback truncated mod 2^64 and could misorder graft_topk — the
    // contract is now a loud ArithmeticException, never a wrapped key
    intercept[ArithmeticException](SimilarityFunctions.quant9Long(9.3e9))
    intercept[ArithmeticException](SimilarityFunctions.quant9Long(-9.3e9))
    intercept[ArithmeticException](SimilarityFunctions.quant9Long(1e18))
    // just inside the range still works and matches the reference
    assert(SimilarityFunctions.quant9Long(9.0e9) == ref(9.0e9))
    assert(SimilarityFunctions.quant9Long(-9.0e9) == ref(-9.0e9))
  }

  test("quant9Long preserves the BigDecimal failure contract on non-finite input") {
    intercept[NumberFormatException](SimilarityFunctions.quant9Long(Double.NaN))
    intercept[NumberFormatException](SimilarityFunctions.quant9Long(Double.PositiveInfinity))
    intercept[NumberFormatException](SimilarityFunctions.quant9Long(Double.NegativeInfinity))
  }
}
