package graft.tools

/** Shared scaffolding for two-arm measurement tools (LevAb,
  * BpeRoundsAb): order-balanced interleaving — the arm order alternates
  * across reps so JIT warmup and OS page cache, both of which favor
  * whichever arm runs later in the JVM, cancel instead of biasing one
  * arm (ADVICE r11). One definition so the convention cannot drift
  * between tools. */
object AbHarness {

  def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  /** Run `once(arm)` for both arms, `reps` times each, arm=true first
    * on even reps; returns (median(true-arm), median(false-arm)). */
  def interleaved(reps: Int)(once: Boolean => Double): (Double, Double) = {
    val timed = (0 until reps).flatMap { r =>
      val order = if (r % 2 == 0) Seq(true, false) else Seq(false, true)
      order.map(a => (a, once(a)))
    }
    (median(timed.collect { case (true, t) => t }),
      median(timed.collect { case (false, t) => t }))
  }
}
