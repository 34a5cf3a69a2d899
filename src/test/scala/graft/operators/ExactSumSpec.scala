package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Pins the arithmetic fact the r8 long-cents recipe rests on: a
  * 2-decimal quantity stored as DOUBLE round-trips to exact integer
  * cents via `round(x * 100)`. The true product k/100·100 = k is an
  * integer; the two double roundings (k/100, then ·100) perturb it by
  * well under 0.5, so round() recovers k exactly — on every engine,
  * because k±ε is never near the k+0.5 half-way that plagues
  * round(·, n≥1) (NOTES_r8 class C). If this ever fails, every
  * long-cents sum in the suite is unsound.
  */
class ExactSumSpec extends Properties("LongCents") {

  property("round(x*100) recovers exact cents across magnitudes") =
    // up to 10^15 cents ($10^13) — far above any per-row value in the
    // data (prices are ~1e5 dollars); the recipe's documented bound is
    // per-GROUP sums, this pins the per-row conversion
    Prop.forAll(Gen.choose(0L, 1_000_000_000_000_000L)) { cents =>
      val asDouble = cents / 100.0 // what the parquet column holds
      Math.round(asDouble * 100.0) == cents
    }

  property("1e-4-grid variant used by the exact-numerator avgs") =
    Prop.forAll(Gen.choose(0L, 10_000_000_000_000L)) { units =>
      val asDouble = units / 10000.0
      Math.round(asDouble * 10000.0) == units
    }

  property("0-decimal round convention matches across engines") =
    // Two distinct safety arguments, kept precise:
    // (a) the CENTS conversions never reach a half-way at all — the
    //     true value is an integer ± ulps regardless of sign, so the
    //     engines' half-way conventions are unreachable;
    // (b) the avg NUMERATOR divisions (N/n) CAN be exactly k+0.5, and
    //     there Spark's HALF_UP and DuckDB's std::round agree (away
    //     from zero) for the POSITIVE values this suite produces
    //     (verified: every cents-summed column is >= 0 at all SFs).
    //     For negative half-way values Spark SQL round (HALF_UP, away
    //     from zero) and java Math.round (toward +inf) differ — do NOT
    //     model Spark SQL round with Math.round if negatives appear.
    Prop.all(
      Prop(Math.round(2.5) == 3L),
      Prop(Math.round(3.5) == 4L),
      Prop(Math.round(12345.4999999999) == 12345L),
      Prop(Math.round(12345.5000000001) == 12346L))
}
