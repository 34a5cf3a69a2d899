package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B: the binned range join vs the naive non-equi spelling
  * ([[graft.operators.RangeJoinQueries]]). The naive arm plans as
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons — so
  * it is expected to fall off a quadratic cliff as the events table
  * grows while the binned arm (equi-join on the bin id) stays
  * near-linear. Arms run the SAME aggregate over the SAME relations and
  * differ only in the join spelling; order-balanced via [[AbHarness]].
  *
  * The naive arm is capped: pass `naiveMax` (seconds) and it is skipped
  * with a DNF marker when a prior rep exceeded the cap — the 30×
  * fixture's naive arm is not worth hours of wall-clock to prove a
  * cliff two decades of measurements already show.
  *
  * Usage: sbt "runMain graft.tools.RangeJoinAb [dir] [reps] [naiveMaxS]"
  */
object RangeJoinAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val naiveMax = args.lift(2).map(_.toDouble).getOrElse(300.0)
    // naiveMax <= 0: skip the naive arm entirely (binned-slope-only
    // runs at fixture sizes where one naive rep costs an hour-plus)
    @volatile var naiveBlown = naiveMax <= 0

    def once(binned: Boolean): Double = {
      if (!binned && naiveBlown) return Double.NaN
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName(s"range-join-ab-$binned")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try {
        val t0 = System.nanoTime()
        val df =
          if (binned) graft.operators.RangeJoinQueries.rangeJoinBinned(s, dir)
          else graft.operators.RangeJoinQueries.rangeJoinNaive(s, dir)
        // noop writer, NOT count(): count() lets Catalyst prune the
        // aggregate columns and with them most of the join's work
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[range-join-ab] binned=$binned t=$dt%.2f s")
        if (!binned && dt > naiveMax) {
          naiveBlown = true
          println(f"[range-join-ab] naive arm exceeded cap $naiveMax%.0f s" +
            " — skipping its remaining reps (DNF)")
        }
        dt
      } finally s.stop()
    }
    val (on, off) = AbHarness.interleaved(reps)(once)
    println(f"[range-join-ab] MEDIAN naive=$off%.2f s binned=$on%.2f s" +
      (if (naiveMax <= 0) "  (naive arm skipped by request)"
      else if (naiveBlown) "  (naive hit the DNF cap)" else ""))
  }
}
