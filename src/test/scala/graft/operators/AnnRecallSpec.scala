package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the approximate-NN operators, asserting BOTH sides
  * of the recall-vs-work trade:
  *
  *   - recall@1 against the exact sweep stays above a floor near the
  *     measured value (a floor of 0.25 would pass an ANN whose answers
  *     are 70% wrong);
  *   - the comparison budget — mean n_candidates / (n-1), the fraction
  *     of a brute-force sweep actually executed — stays a strict
  *     minority. This is the guard against the degenerate "ANN" that
  *     wins recall by quietly comparing everything (one LSH table with
  *     0 bits, nprobe=k); a recall UPPER bound was tried first and
  *     rejected, since it fails legitimately improved operators and
  *     benign FP/fold-order drift.
  *
  * The synthetic embeddings are clusterless 64-dim uniform noise (NN
  * cosine ≈ 0.37, labels geometrically meaningless — verified by pairwise
  * cosine profile), the hardest case for LSH/IVF: recall rises only with
  * the fraction of the corpus actually compared. The defaults were chosen
  * by the tools.AnnSweep parameter sweep (recorded in PLANS.md) as the
  * cheapest configs clearing 0.8 recall@1 while still searching a strict
  * minority (~41%) of a brute-force sweep:
  *   LSH L=16 tables × 5 bits → measured 0.824 recall, 0.41 budget
  *   IVF k=32, nprobe=8       → measured 0.816 recall, 0.41 budget
  *     (k-means|| init, 5 Lloyd iterations; a random-init fit measured
  *     0.708 and was rejected — see IvfQueries)
  * Both operators are seeded (hyperplanes: Random(7); k-means: seed 11),
  * so floor −0.10 / budget +0.10 is generous slack for FP fold-order
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

  /** (n_vectors, recall@1, mean n_candidates/(n-1)) from the per-vector
    * NN relation — the budget is computed on the SAME relation the
    * recall summary consumes (persisted, so the expensive candidate
    * generation executes once, not once per consumer). */
  private def gate(nnDf: org.apache.spark.sql.DataFrame)
      : (Long, Double, Double) = {
    val nn = nnDf.persist()
    try {
      val s = AnnRecall.summarize(nn,
        DedupQueries.exactNn(spark, dir)).collect().head
      val n = s.getAs[Long]("n_vectors")
      // n = 1 would make the budget denominator 0 (NaN/Inf instead of a
      // clear failure); the callers' later n > 0 asserts run too late
      assert(n > 1, s"degenerate fixture: $n vector(s), budget undefined")
      val meanCand = nn.agg(avg(col("n_candidates"))).head().getDouble(0)
      (n, s.getAs[Double]("recall_at_1"), meanCand / (n - 1))
    } finally nn.unpersist()
  }

  test("LSH ANN: recall@1 above floor, candidate budget a strict minority") {
    val (n, rec, budget) = gate(DedupQueries.annLshNn(spark, dir))
    assert(n > 0)
    assert(rec >= 0.72, s"LSH recall@1 $rec below floor (measured 0.824)")
    assert(budget <= 0.51,
      s"LSH budget $budget above 0.51 (measured 0.41): the operator is " +
        "drifting toward brute force")
  }

  test("IVF ANN: recall@1 above floor, candidate budget a strict minority") {
    val (n, rec, budget) = gate(IvfQueries.annIvfNn(spark, dir))
    assert(n > 0)
    assert(rec >= 0.71, s"IVF recall@1 $rec below floor (measured 0.816)")
    assert(budget <= 0.51,
      s"IVF budget $budget above 0.51 (measured 0.41): the operator is " +
        "drifting toward brute force")
  }
}
