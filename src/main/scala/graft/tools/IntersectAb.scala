package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: does [[graft.plans.IntersectSizeRewrite]] pay on an
  * overlap-predicate join written in the STOCK spelling?
  *
  * Workload: blocked self-join over document word arrays with
  * `size(array_intersect(wa, wb)) >= 8` — the shape a user writes
  * without knowing the native expression exists. Arms differ ONLY in
  * whether the extensions (and thus the rewrite rule) are installed;
  * order-balanced via [[AbHarness]].
  * Usage: sbt "runMain graft.tools.IntersectAb [sfDir] [reps]"
  */
object IntersectAb {
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
        .appName(s"intersect-ab-$withRule")
      val s = (if (withRule)
        b.withExtensions(new graft.extensions.GraftExtensions()) else b)
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try {
        val d = s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("source"),
            array_distinct(split(col("text"), " ")).as("ws"))
          .filter(col("doc_id") % 2 === 0)
          .localCheckpoint(true)
        val t0 = System.nanoTime()
        val n = d.as("a").join(d.as("b"),
          col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id") &&
            size(array_intersect(col("a.ws"), col("b.ws"))) >= 8).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[intersect-ab] rule=$withRule pairs=$n t=$dt%.2f s")
        dt
      } finally s.stop()
    }
    val (on, off) = AbHarness.interleaved(reps)(once)
    println(f"[intersect-ab] MEDIAN off=$off%.2f s on=$on%.2f s")
  }
}
