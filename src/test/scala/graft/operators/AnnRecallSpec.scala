package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the approximate-NN operators: recall@1 against the
  * exact sweep must clear a floor. The synthetic embeddings are
  * clusterless uniform noise — the hardest case for LSH/IVF — so the
  * floors are deliberately conservative (measured: LSH ≈ 0.40, IVF ≈
  * 0.53 at sf0.01); a regression to near-random (1/n) still fails them
  * by an order of magnitude. */
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

  test("LSH-bucketed ANN clears the recall floor") {
    val (n, rec) = recall(DedupQueries.annLshBucket(spark, dir))
    assert(n > 0)
    assert(rec >= 0.25, s"LSH recall@1 $rec below floor")
  }

  test("IVF ANN clears the recall floor") {
    val (n, rec) = recall(IvfQueries.annIvf(spark, dir))
    assert(n > 0)
    assert(rec >= 0.30, s"IVF recall@1 $rec below floor")
  }
}
