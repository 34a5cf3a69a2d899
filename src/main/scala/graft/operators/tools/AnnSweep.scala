// lives in graft.operators.tools (a sub-package of graft.operators) to
// reach the package-private exactNn sweep baseline; it is a dev tool,
// not part of the operator surface
package graft.operators.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnRecall, DedupQueries, IvfQueries}

/** Parameter sweep for the two approximate-NN operators: recall@1 vs
  * comparison budget on the synthetic embeddings fixture (64-dim uniform
  * noise — NN cosine ≈ 0.37, labels geometrically meaningless — i.e. the
  * adversarial no-cluster case). Results are recorded in PLANS.md; the
  * chosen defaults back AnnRecallSpec's asserted bands.
  *
  * Budget column: mean candidates per vector / (n-1) — the fraction of a
  * brute-force sweep actually compared. For uniform noise recall rises
  * only with that fraction (no free lunch without cluster structure), so
  * the defaults buy the highest recall that still searches a strict
  * minority of the corpus; real embedding tables with cluster structure
  * get much better trades at the same settings.
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val exact = DedupQueries.exactNn(spark, sfDir).cache()
    exact.count()

    def report(tag: String, nn: org.apache.spark.sql.DataFrame): Unit = {
      val cand = nn.agg(avg(col("n_candidates"))).head().getDouble(0)
      val r = AnnRecall.summarize(nn, exact).head()
      val n = r.getAs[Long]("n_vectors")
      println(f"[sweep] $tag%-18s recall@1=${r.getAs[Double]("recall_at_1")}%.3f " +
        f"mean_cand=$cand%7.1f budget=${cand / (n - 1)}%.3f n=$n")
    }

    for ((l, b) <- Seq((8, 6), (16, 6), (8, 5), (16, 5), (24, 5), (16, 4)))
      report(s"lsh L=$l bits=$b", DedupQueries.annLshNn(spark, sfDir, l, b))
    for ((k, np) <- Seq((16, 1), (16, 2), (16, 4), (16, 6), (32, 4), (32, 8)))
      report(s"ivf k=$k nprobe=$np", IvfQueries.annIvfNn(spark, sfDir, k, np))
    spark.stop()
  }
}
