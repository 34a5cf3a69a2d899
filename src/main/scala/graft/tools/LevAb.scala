package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: does [[graft.plans.LevenshteinPrefilter]] pay on long strings?
  *
  * Workload: blocked fuzzy self-join over document TEXTS (hundreds of
  * chars — the O(|a|·|b|) DP is ~10⁵ cell updates per pair), distance
  * bound 50, within source blocks. Arms differ ONLY in whether the
  * optimizer rule is installed; same data, same plan otherwise. The arm
  * ORDER alternates across reps (off-first on even reps, on-first on
  * odd) so JIT warmup and OS page cache — both of which favor whichever
  * arm runs later in the JVM — cancel instead of systematically
  * inflating the rule-on arm (ADVICE r11).
  * Usage: sbt "runMain graft.tools.LevAb [sfDir] [reps]"
  */
object LevAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)

    def once(withRule: Boolean): Double = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName(s"lev-ab-$withRule")
      val s = (if (withRule)
        b.withExtensions(new graft.extensions.GraftExtensions()) else b)
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try {
        val d = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"), col("text"))
          .filter(col("doc_id") % 4 === 0)
          .localCheckpoint(true)
        val t0 = System.nanoTime()
        val n = d.as("a").join(d.as("b"),
          col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id") &&
            levenshtein(col("a.text"), col("b.text")) <= 50).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[lev-ab] rule=$withRule pairs=$n t=$dt%.2f s")
        dt
      } finally s.stop()
    }
    val (on, off) = AbHarness.interleaved(reps)(once)
    println(f"[lev-ab] MEDIAN off=$off%.2f s on=$on%.2f s")
  }
}
