package graft.stats

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input sample: one observation + which side of the contrast it belongs to. */
case class Obs(value: Double, isTrue: Boolean)

/** Aggregation buffer: raw observations per side. Bounded by contrast group
  * size, NOT dataset size — the caller must route only small groups here
  * (the reference does the same: permutation only when min side >= 4,
  * main/mwas_general.py:404-419). `maxSide` is a hard guard against
  * accidentally collecting an unbounded vector on a skewed key. */
case class PermBuffer(t: ArrayBuffer[Double], f: ArrayBuffer[Double])

case class PermResult(statistic: Double, p_value: Double, method: String,
    n_true: Long, n_false: Long)

/** Two-sample permutation test on the difference of means, as a typed Spark
  * `Aggregator` (register with `functions.udaf`).
  *
  * Re-expresses the reference's scipy call
  * (`permutation_test(..., statistic=mean_diff, n_resamples=10000,
  * vectorized=True)`, main/mwas_general.py:413-419) Spark-natively:
  *
  *   - EXACT enumeration of all C(n, k) label assignments when that count is
  *     <= `exactCutoff` — deterministic and engine-independent (the reference
  *     explored the same cutoff idea, main/tests/permutation_test.py:25-78);
  *   - otherwise `resamples` Monte-Carlo permutations from an RNG seeded by
  *     the data content (order-independent), so results are reproducible
  *     across runs/partitionings — scipy's global RNG is not, which is why
  *     parity with the reference is statistical, not bitwise (SURVEY §7.4.1).
  *
  * Two-sided p-value; the Monte-Carlo path uses the (hits+1)/(N+1)
  * correction, matching scipy's randomized estimator.
  */
class PermutationTest(resamples: Int = 10000, exactCutoff: Long = 20000,
    maxSide: Int = 1 << 20)
    extends Aggregator[Obs, PermBuffer, PermResult] {

  override def zero: PermBuffer = PermBuffer(ArrayBuffer.empty, ArrayBuffer.empty)

  override def reduce(b: PermBuffer, a: Obs): PermBuffer = {
    val side = if (a.isTrue) b.t else b.f
    if (side.length < maxSide) side += a.value
    b
  }

  override def merge(b1: PermBuffer, b2: PermBuffer): PermBuffer = {
    b1.t ++= b2.t.take(maxSide - b1.t.length)
    b1.f ++= b2.f.take(maxSide - b1.f.length)
    b1
  }

  override def finish(b: PermBuffer): PermResult = {
    val x = b.t.toArray
    val y = b.f.toArray
    PermutationTest.test(x, y, resamples, exactCutoff)
  }

  override def bufferEncoder: Encoder[PermBuffer] = Encoders.product[PermBuffer]
  override def outputEncoder: Encoder[PermResult] = Encoders.product[PermResult]
}

object PermutationTest {

  private def mean(a: Array[Double], from: Int, until: Int): Double = {
    var s = 0.0; var i = from
    while (i < until) { s += a(i); i += 1 }
    s / (until - from)
  }

  /** C(n, k) with overflow clamp. */
  def choose(n: Int, k: Int): Long = {
    val kk = math.min(k, n - k)
    var r = 1L
    var i = 1
    while (i <= kk) {
      r = r * (n - kk + i) / i
      if (r < 0 || r > (1L << 56)) return Long.MaxValue
      i += 1
    }
    r
  }

  /** @param earlyStopAbove Monte-Carlo only: at deterministic checkpoints
    *        (1000, 2000, 5000 resamples) stop early if the p estimate
    *        already exceeds this bound. Callers that only CLASSIFY against
    *        a significance threshold pass a generous multiple of it (the
    *        pipeline uses 20×): a test reporting p ≈ 0.1 off 1000 samples
    *        instead of 10000 loses resolution only where the result is
    *        decisively insignificant — p near or below the threshold always
    *        runs the full budget. Infinity (default) = scipy-faithful fixed
    *        n_resamples. Deterministic: the checkpoint rule sees only the
    *        seeded RNG stream, never wall-clock or partitioning. */
  def test(x: Array[Double], y: Array[Double], resamples: Int,
      exactCutoff: Long,
      earlyStopAbove: Double = Double.PositiveInfinity): PermResult = {
    val nx = x.length
    val ny = y.length
    if (nx < 2 || ny < 2) {
      return PermResult(Double.NaN, Double.NaN, "insufficient", nx, ny)
    }
    val pooled = new Array[Double](nx + ny)
    System.arraycopy(x, 0, pooled, 0, nx)
    System.arraycopy(y, 0, pooled, nx, ny)
    val obs = mean(x, 0, nx) - mean(y, 0, ny)
    val total = pooled.sum
    val n = pooled.length
    // p(side-of-size-nx assignment) from the sum of the chosen side alone:
    // meanDiff = s/nx - (total-s)/ny, so only the chosen side's sum matters.
    def diffFromSum(s: Double): Double = s / nx - (total - s) / ny
    val eps = 1e-12 * math.max(1.0, math.abs(obs))
    val absObs = math.abs(obs)

    if (choose(n, nx) <= exactCutoff) {
      // exact: enumerate every C(n, k) choice of the SMALLER side (same
      // combination count as the x-side walk — C(n,nx) == C(n,ny) over the
      // complement — but the inner sum is min(nx, ny) adds) via a
      // lexicographic combination walk over indices.
      val k = math.min(nx, ny)
      val sideIsX = k == nx
      val idx = Array.range(0, k)
      var hits = 0L
      var count = 0L
      var done = false
      while (!done) {
        var s = 0.0
        var i = 0
        while (i < k) { s += pooled(idx(i)); i += 1 }
        val sx = if (sideIsX) s else total - s
        if (math.abs(diffFromSum(sx)) >= absObs - eps) hits += 1
        count += 1
        // next combination
        var j = k - 1
        while (j >= 0 && idx(j) == n - k + j) j -= 1
        if (j < 0) done = true
        else {
          idx(j) += 1
          var m = j + 1
          while (m < k) { idx(m) = idx(m - 1) + 1; m += 1 }
        }
      }
      PermResult(obs, hits.toDouble / count, "permutation_exact", nx, ny)
    } else {
      // Monte-Carlo: seed from a commutative content hash (Long addition is
      // order-independent, unlike FP summation) so the result is reproducible
      // across runs, row orders, and partitionings. SplittableRandom, not
      // java.util.Random: Random.next() CASes an AtomicLong per draw, which
      // dominated the hot loop (the r16 audit's 7.9 s single-row straggler
      // in mwas_pipeline_full — resamples × min-side draws at the
      // permMaxPooled bound). Every consumer gate is statistical (3·SE
      // bands, order-invariance, early-stop equivalence), so the stream
      // only needs to be deterministic, not any particular sequence.
      var seed = 41L * n + 7L * nx
      pooled.foreach { v =>
        seed += java.lang.Double.doubleToLongBits(v) * 0x9E3779B97F4A7C15L
      }
      val rng = new java.util.SplittableRandom(seed)
      // sort so the resampling stream is independent of input row order
      // (the statistic depends only on the multiset)
      val work = pooled.clone()
      java.util.Arrays.sort(work)
      // drawing a size-k side determines BOTH side sums (s and total-s), so
      // always resample the SMALLER side — the loop is resamples × min(nx,
      // ny) instead of resamples × nx, which matters when the true side is
      // the majority (include=false contrasts)
      val k = math.min(nx, ny)
      val sampleIsX = k == nx
      var hits = 0L
      var r = 0
      var stopped = false
      while (r < resamples && !stopped) {
        // partial Fisher-Yates: first k entries become the resampled small
        // side; work(i) is final once swapped, so the side sum accumulates
        // in the same pass (identical RNG stream and result as a separate
        // summing loop — this is the hot path)
        var s = 0.0
        var i = 0
        while (i < k) {
          val j = i + rng.nextInt(n - i)
          val tmp = work(i); work(i) = work(j); work(j) = tmp
          s += work(i)
          i += 1
        }
        val sx = if (sampleIsX) s else total - s
        if (math.abs(diffFromSum(sx)) >= absObs - eps) hits += 1
        r += 1
        if ((r == 1000 || r == 2000 || r == 5000) && r < resamples &&
            (hits + 1).toDouble / (r + 1) > earlyStopAbove)
          stopped = true
      }
      PermResult(obs, (hits + 1).toDouble / (r + 1),
        if (stopped) "permutation_mc_early" else "permutation_mc", nx, ny)
    }
  }
}
