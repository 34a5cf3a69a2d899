package graft.operators

import org.apache.commons.math3.distribution.TDistribution
import org.scalatest.funsuite.AnyFunSuite

/** Pins the numerical contract behind [[TCdfSql]]: the two-sided Student-t
  * p-value via the Numerical-Recipes-style incomplete-beta continued
  * fraction agrees with commons-math's TDistribution (what
  * [[graft.functions.WelchTTest]] evaluates engine-side) to well inside
  * the driver's hash normalization, across the full (t, df) range the
  * suite produces — df ≈ 1 (Welch with a side of 2) up to df ≈ 2×10⁴
  * (q23 buckets at sf0.1 and beyond).
  *
  * The Scala loop below is the line-for-line twin of the SQL recursion in
  * TCdfSql.fragment (same seed, same even/odd half-steps, same FPMIN
  * clamps, same 1e-15 stop); the SQL rendering itself is exercised against
  * DuckDB by tools/selfcheck.py on `q23_welch_full` and
  * `mwas_pipeline_full` at every SF.
  */
class TCdfSpec extends AnyFunSuite {

  private val FPMIN = 1e-30

  private def betacf(a: Double, b: Double, x: Double): Double = {
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FPMIN) d = FPMIN
    d = 1.0 / d
    var h = d
    var m = 0
    var done = false
    while (m < 200 && !done) {
      m += 1
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FPMIN) d = FPMIN
      c = 1.0 + aa / c
      if (math.abs(c) < FPMIN) c = FPMIN
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FPMIN) d = FPMIN
      c = 1.0 + aa / c
      if (math.abs(c) < FPMIN) c = FPMIN
      d = 1.0 / d
      val del = d * c
      h *= del
      done = math.abs(del - 1.0) < 1e-15
    }
    h
  }

  import org.apache.commons.math3.special.Gamma.logGamma

  /** I_x(a, b) with the symmetry swap, x/1−x passed as direct ratios. */
  private def ibeta(a: Double, b: Double, x: Double, x1m: Double): Double =
    if (x <= 0) 0.0
    else if (x1m <= 0) 1.0
    else if (x >= (a + 1.0) / (a + b + 2.0)) 1.0 - ibeta(b, a, x1m, x)
    else {
      val bt = math.exp(logGamma(a + b) - logGamma(a) - logGamma(b) +
        a * math.log(x) + b * math.log(x1m))
      bt * betacf(a, b, x) / a
    }

  private def pTwoSided(t: Double, df: Double): Double =
    ibeta(df / 2.0, 0.5, df / (df + t * t), (t * t) / (df + t * t))

  test("continued-fraction p agrees with commons-math across the suite's " +
      "(t, df) envelope") {
    val dfs = Seq(1.0007, 1.5, 2.0, 3.3, 5.42, 42.0, 336.0, 468.9,
      4200.0, 8400.0, 20000.0)
    val ts = Seq(1e-3, 0.0208, 0.5, 1.0, 1.7, 2.3, 5.0, 10.0, 50.0)
    var worst = 0.0
    for (df <- dfs; t <- ts; s <- Seq(-1.0, 1.0)) {
      val expected =
        2.0 * new TDistribution(df).cumulativeProbability(-math.abs(s * t))
      val got = pTwoSided(s * t, df)
      worst = math.max(worst, math.abs(got - expected))
    }
    // measured ~1e-12 worst (lgamma ulps at large df); 1e-9 leaves two
    // orders of slack while still far inside the driver's value grid
    assert(worst < 1e-9, s"CF vs commons-math diverged: $worst")
  }

  test("t = 0 gives exactly p = 1 on both sides (commons-math's x == 0 " +
      "special case)") {
    assert(pTwoSided(0.0, 5.5) === 1.0)
    assert(2.0 * new TDistribution(5.5).cumulativeProbability(0.0) === 2.0 * 0.5)
  }
}
