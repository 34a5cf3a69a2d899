// lives in graft.operators.tools to reach the package-private
// BpeQueries.train; dev measurement harness, not an operator
package graft.operators.tools

import org.apache.spark.sql.SparkSession

/** A/B for the BPE train-loop checkpoint (VERDICT r11 item 5): at real
  * merge counts, does per-round `localCheckpoint` kill the O(rounds²)
  * lineage recompute the r11 scaladoc warned about?
  *
  * Arms run interleaved per rep (checkpoint first on even reps — the
  * LevAb order-balance convention) so JIT/page-cache warmup cancels.
  * Usage: sbt "runMain graft.operators.tools.BpeRoundsAb [sfDir] [rounds] [reps]"
  */
object BpeRoundsAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nRounds = args.lift(1).map(_.toInt).getOrElse(10)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(checkpoint: Boolean): Double = {
      val t0 = System.nanoTime()
      val (state, merges) =
        graft.operators.BpeQueries.train(spark, dir, nRounds, checkpoint)
      val n = state.count() // force the final state, not just the merges
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-ab] checkpoint=$checkpoint rounds=$nRounds " +
        f"types=$n merges=${merges.size} t=$dt%.2f s")
      dt
    }
    val (on, off) = graft.tools.AbHarness.interleaved(reps)(once)
    println(f"[bpe-ab] MEDIAN checkpoint=$on%.2f s " +
      f"no-checkpoint=$off%.2f s (rounds=$nRounds)")
    spark.stop()
  }
}
