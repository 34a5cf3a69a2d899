// lives in graft.operators.tools to reach the package-private exactNn /
// annLshNn internals; dev probe, not part of the operator surface
package graft.operators.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupQueries

/** Stage decomposition + skew probe for `ann_lsh_bucket` (VERDICT r8
  * item 4: driver medians drifted 5.47 → 7.22 s across rounds while
  * builder-local runs sat at 4.3–4.5 s — is there hyperplane-bucket
  * skew on the no-cluster fixture, or is it host weather?).
  *
  * Decomposes the query into its three sequential pieces — the exact
  * chunked-sweep baseline (recall denominator), the LSH candidate
  * join + per-vector top-1, and the final recall summarize — and
  * reports per-vector candidate-count dispersion (mean/p99/max): with
  * 16 tables × 5 sign bits on uniform noise the buckets are near-
  * binomial, so max/mean staying ~O(1) rules the skew theory out.
  */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[lsh] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    time("exactNn   ")(DedupQueries.exactNn(spark, sfDir))
    time("annLshNn  ")(DedupQueries.annLshNn(spark, sfDir))
    time("full_query")(
      graft.SparkEntry.queries("ann_lsh_bucket")(spark, sfDir))

    val d = DedupQueries.annLshNn(spark, sfDir)
      .agg(count(lit(1)).as("n"),
        avg(col("n_candidates")).as("mean_cand"),
        expr("percentile(n_candidates, 0.99)").as("p99_cand"),
        max(col("n_candidates")).as("max_cand"))
      .head()
    println(s"[lsh] candidates per vector: n=${d.getAs[Long]("n")} " +
      f"mean=${d.getAs[Double]("mean_cand")}%.1f " +
      f"p99=${d.getAs[Double]("p99_cand")}%.1f " +
      s"max=${d.getAs[Long]("max_cand")} " +
      f"(max/mean=${d.getAs[Long]("max_cand") / d.getAs[Double]("mean_cand")}%.2f)")
    spark.stop()
  }
}
