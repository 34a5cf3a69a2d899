package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: does [[graft.plans.DistinctGateRewrite]] pay on the stock
  * `HAVING count(DISTINCT doc_id) >= 2` pair-gate spelling?
  *
  * Workload: the cross-document repeated-shingle gate (the
  * `dedup_substring` inner shape) written the way a user writes it —
  * group the (shingle, doc) relation by shingle, count distinct docs,
  * keep shingles seen in ≥ 2. The input relation is checkpointed so
  * both arms time only the aggregate pipeline. Arms differ ONLY in
  * whether the extensions are installed; order-balanced via
  * [[AbHarness]].
  * Usage: sbt "runMain graft.tools.DistinctGateAb [sfDir] [reps]"
  */
object DistinctGateAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)

    def once(withRule: Boolean): Double = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName(s"distinct-gate-ab-$withRule")
      val s = (if (withRule)
        b.withExtensions(new graft.extensions.GraftExtensions()) else b)
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try {
        val sh = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            explode(graft.functions.ShingleOps
              .ngram_hashes(split(col("text"), " "), 3)).as("h"))
          .localCheckpoint(true)
        val t0 = System.nanoTime()
        val n = sh.groupBy(col("h"))
          .agg(countDistinct(col("doc_id")).as("c"))
          .filter(col("c") >= 2)
          .select(col("h"))
          .count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[distinct-gate-ab] rule=$withRule shingles=$n t=$dt%.2f s")
        dt
      } finally s.stop()
    }
    val (on, off) = AbHarness.interleaved(reps)(once)
    println(f"[distinct-gate-ab] MEDIAN off=$off%.2f s on=$on%.2f s")
  }
}
