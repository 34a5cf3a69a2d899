package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: does [[graft.plans.ExplodeCountRewrite]] pay on the stock
  * explode-then-count word-count spelling?
  *
  * Two workloads, each explode-then-`count(*)` written the way a user
  * writes it. `corpus`: tokens-per-document over `documents` (split
  * cost is shared by both arms — the rule saves only the per-token
  * aggregate hash insert). `widearr`: a pre-materialized ARRAY column
  * with ~4k elements per row (no split in the timed path — the
  * aggregate-input volume IS the cost, the shape where the rewrite's
  * |tokens|→|rows| reduction should dominate). The rule-on arm plans
  * both WITHOUT a Generate (per-row `size`). Arms differ ONLY in
  * whether the extensions are installed; order-balanced via
  * [[AbHarness]].
  * Usage: sbt "runMain graft.tools.ExplodeCountAb [sfDir] [reps]"
  */
object ExplodeCountAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)

    // wide-array fixture: written once, read by both arms (parquet read
    // replaces the split so the timed region is explode+count only)
    val wideDir = "/tmp/graft_explode_ab_wide"
    locally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master("local[8]")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try {
        s.range(25000)
          .select(col("id"),
            split(repeat(concat(lit("tok"), pmod(col("id"), lit(97)),
              lit(" ")), 4000), " ").as("arr"))
          .write.mode("overwrite").parquet(wideDir)
      } finally s.stop()
    }

    def once(withRule: Boolean): Double = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        // the wide fixture has ~4k-element arrays: the default
        // 4096-row reader batch holds ~16M string slots per batch and
        // GC-thrashes BOTH arms into bimodal noise; bound it (shared
        // config — fair to both)
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .appName(s"explode-count-ab-$withRule")
      val s = (if (withRule)
        b.withExtensions(new graft.extensions.GraftExtensions()) else b)
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try {
        val d = s.read.parquet(s"$dir/documents.parquet")
        var t0 = System.nanoTime()
        val perDoc = d
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        // consume the aggregate (sum over it keeps outputs tiny and
        // forces every group)
        val total = perDoc.agg(sum(col("n"))).head().getLong(0)
        val dtCorpus = (System.nanoTime() - t0) / 1e9

        val w = s.read.parquet(wideDir)
        t0 = System.nanoTime()
        val perRow = w
          .select(col("id"), explode(col("arr")).as("e"))
          .groupBy(col("id")).agg(count(lit(1)).as("n"))
        val totalW = perRow.agg(sum(col("n"))).head().getLong(0)
        val dtWide = (System.nanoTime() - t0) / 1e9
        println(f"[explode-count-ab] rule=$withRule tokens=$total " +
          f"corpus=$dtCorpus%.2f s wide($totalW)=$dtWide%.2f s")
        dtCorpus + dtWide
      } finally s.stop()
    }
    val (on, off) = AbHarness.interleaved(reps)(once)
    println(f"[explode-count-ab] MEDIAN(sum of both) off=$off%.2f s on=$on%.2f s")
  }
}
