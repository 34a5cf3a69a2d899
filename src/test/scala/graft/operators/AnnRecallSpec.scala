package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the approximate-NN operators: recall@1 against the
  * exact sweep, asserted as a BAND around the measured value, not a loose
  * floor — a floor of 0.25 would pass an ANN whose answers are 70% wrong.
  *
  * The synthetic embeddings are clusterless 64-dim uniform noise (NN
  * cosine ≈ 0.37, labels geometrically meaningless — verified by pairwise
  * cosine profile), the hardest case for LSH/IVF: recall rises only with
  * the fraction of the corpus actually compared. The defaults were chosen
  * by the tools.AnnSweep parameter sweep (recorded in PLANS.md) as the
  * cheapest configs clearing 0.8 recall@1 while still searching a strict
  * minority (~41%) of a brute-force sweep:
  *   LSH L=16 tables × 5 bits → measured 0.824 @ sf0.001
  *   IVF k=32, nprobe=8       → measured 0.816 @ sf0.001 (k-means||
  *     init, 5 Lloyd iterations; a random-init fit measured 0.708 and
  *     was rejected — see IvfQueries)
  * Both operators are seeded (hyperplanes: Random(7); k-means: seed 11),
  * so ±0.10 around the measured value is generous slack for FP fold-order
  * drift while still failing any real parameter or plan regression.
  */
class AnnRecallSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("ann-recall-spec")
    .getOrCreate()

  private def recall(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
    val r = df.collect().head
    (r.getAs[Long]("n_vectors"), r.getAs[Double]("recall_at_1"))
  }

  test("LSH-bucketed ANN recall@1 stays in the measured band") {
    val (n, rec) = recall(DedupQueries.annLshBucket(spark, dir))
    assert(n > 0)
    assert(rec >= 0.72 && rec <= 0.93,
      s"LSH recall@1 $rec outside measured band 0.824 ± 0.10")
  }

  test("IVF ANN recall@1 stays in the measured band") {
    val (n, rec) = recall(IvfQueries.annIvf(spark, dir))
    assert(n > 0)
    assert(rec >= 0.71 && rec <= 0.92,
      s"IVF recall@1 $rec outside measured band 0.816 ± 0.10")
  }
}
