package graft.stats

import scala.util.Random

import org.apache.commons.math3.stat.inference.TTest
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WelchTTest

class StatKernelSpec extends AnyFunSuite {

  private def stats(a: Array[Double]): (Double, Double, Double) = {
    val n = a.length.toDouble
    val m = a.sum / n
    val v = a.map(x => (x - m) * (x - m)).sum / (n - 1)
    (m, math.sqrt(v), n)
  }

  test("welch_t matches commons-math3 TTest (independent implementation)") {
    val rng = new Random(7)
    val tt = new TTest()
    for (_ <- 1 to 50) {
      val x = Array.fill(3 + rng.nextInt(40))(rng.nextGaussian() * 2 + 1)
      val y = Array.fill(3 + rng.nextInt(40))(rng.nextGaussian() * 3)
      val (m1, s1, n1) = stats(x)
      val (m2, s2, n2) = stats(y)
      val Some((t, _, p)) = WelchTTest.compute(m1, s1, n1, m2, s2, n2)
      assert(math.abs(t - tt.t(x, y)) < 1e-9)
      assert(math.abs(p - tt.tTest(x, y)) < 1e-9)
    }
  }

  test("welch_t guards degenerate inputs; zero variance mirrors scipy") {
    assert(WelchTTest.compute(1.0, 0.0, 1, 2.0, 1.0, 5).isEmpty) // n1 < 2
    // both variances zero: scipy's ttest_ind_from_stats pins the nan
    // Welch–Satterthwaite df to 1 and divides by the zero standard error
    // — ±inf and p = 0 when the means differ, nan/nan when they agree
    // (r9: the earlier None here silently dropped decisively-significant
    // constant-vs-constant contrasts)
    assert(WelchTTest.compute(1.0, 0.0, 5, 2.0, 0.0, 5)
      .contains((Double.NegativeInfinity, 1.0, 0.0)))
    assert(WelchTTest.compute(2.0, 0.0, 5, 1.0, 0.0, 5)
      .contains((Double.PositiveInfinity, 1.0, 0.0)))
    val Some((tEq, dfEq, pEq)) = WelchTTest.compute(2.0, 0.0, 5, 2.0, 0.0, 5)
      : @unchecked
    assert(tEq.isNaN && dfEq == 1.0 && pEq.isNaN)
  }

  /** Brute-force permutation oracle: independent enumeration via bitmasks. */
  private def bruteP(x: Array[Double], y: Array[Double]): Double = {
    val pooled = x ++ y
    val n = pooled.length
    val k = x.length
    val obs = x.sum / x.length - y.sum / y.length
    val eps = 1e-12 * math.max(1.0, math.abs(obs))
    var hits = 0
    var count = 0
    for (mask <- 0 until (1 << n) if Integer.bitCount(mask) == k) {
      var sx = 0.0
      var sy = 0.0
      for (i <- 0 until n) {
        if ((mask & (1 << i)) != 0) sx += pooled(i) else sy += pooled(i)
      }
      val d = sx / k - sy / (n - k)
      if (math.abs(d) >= math.abs(obs) - eps) hits += 1
      count += 1
    }
    hits.toDouble / count
  }

  test("exact permutation matches independent bitmask enumeration") {
    val rng = new Random(11)
    for (_ <- 1 to 20) {
      val x = Array.fill(3 + rng.nextInt(5))(rng.nextGaussian() + 0.5)
      val y = Array.fill(3 + rng.nextInt(5))(rng.nextGaussian())
      val r = PermutationTest.test(x, y, 10000, exactCutoff = 1000000)
      assert(r.method == "permutation_exact")
      assert(math.abs(r.p_value - bruteP(x, y)) < 1e-12,
        s"x=${x.mkString(",")} y=${y.mkString(",")}")
    }
  }

  test("monte-carlo permutation approximates the exact p") {
    val rng = new Random(13)
    val x = Array.fill(8)(rng.nextGaussian() + 0.8)
    val y = Array.fill(8)(rng.nextGaussian())
    val exact = PermutationTest.test(x, y, 0, exactCutoff = Long.MaxValue)
    val mc = PermutationTest.test(x, y, 20000, exactCutoff = 1)
    assert(mc.method == "permutation_mc")
    assert(math.abs(mc.p_value - exact.p_value) < 0.02,
      s"mc=${mc.p_value} exact=${exact.p_value}")
  }

  test("monte-carlo p is deterministic and order-independent") {
    val rng = new Random(17)
    val x = Array.fill(30)(rng.nextGaussian() + 0.3)
    val y = Array.fill(25)(rng.nextGaussian())
    val a = PermutationTest.test(x, y, 5000, exactCutoff = 1)
    val b = PermutationTest.test(x.reverse, y.reverse, 5000, exactCutoff = 1)
    assert(a.p_value == b.p_value)
  }

  test("early stop settles decisively-insignificant tests at a checkpoint " +
      "and never touches near-threshold ones") {
    val rng = new Random(19)
    // identical distributions → true p ≈ 1: stops at the first checkpoint
    val x0 = Array.fill(20)(rng.nextGaussian())
    val y0 = Array.fill(20)(rng.nextGaussian())
    val full = PermutationTest.test(x0, y0, 10000, exactCutoff = 1)
    val early = PermutationTest.test(x0, y0, 10000, exactCutoff = 1,
      earlyStopAbove = 0.1)
    assert(early.method === "permutation_mc_early")
    assert(early.p_value > 0.1)
    // still a valid estimate of the same quantity (checkpoint = 1000)
    assert(math.abs(early.p_value - full.p_value) < 0.1)

    // strongly separated → tiny p: the bound never triggers, full budget,
    // bit-identical to the unbounded run
    val x1 = Array.fill(20)(rng.nextGaussian() + 3.0)
    val y1 = Array.fill(20)(rng.nextGaussian())
    val fullSig = PermutationTest.test(x1, y1, 10000, exactCutoff = 1)
    val earlySig = PermutationTest.test(x1, y1, 10000, exactCutoff = 1,
      earlyStopAbove = 0.1)
    assert(earlySig.method === "permutation_mc")
    assert(earlySig.p_value === fullSig.p_value)
  }
}
