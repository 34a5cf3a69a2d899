package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy gate for the deterministic PCA: the hash oracle proves the
  * quantize→decimal ladder is engine-independent; THIS proves the
  * ladder computes what it claims — 8 rounds of power iteration on the
  * true covariance. The reference is the SAME 8 rounds in plain-Scala
  * float64 (isolating quantization error; |cos| ≥ 0.999, eigenvalue
  * within 1%). Full convergence to the top eigenvector is a property
  * of the SPECTRUM, not the ladder: this fixture is clusterless noise
  * with λ₂/λ₁ ≈ 0.97, so 8 rounds are deliberately partial
  * ((λ₂/λ₁)⁸ ≈ 0.78 residual — measured |cos| vs the converged vector
  * ≈ 0.36, documented in the operator). Progress gates: the Rayleigh
  * quotient must strictly exceed both the start vector's and the mean
  * eigenvalue (trace/d) — a sign error, transposed index, or skipped
  * centering fails these by orders of magnitude. */
class PcaSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("pca-spec")
    .getOrCreate()

  test("loadings match a float64 reference PCA in direction and scale") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("cast(embedding as array<double>) as v")
      .collect().map(_.getSeq[Double](0).toArray)
    val n = rows.length
    val d = rows.head.length
    val mean = Array.tabulate(d)(j => rows.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d) { (j, k) =>
      rows.map(r => (r(j) - mean(j)) * (r(k) - mean(k))).sum / n
    }
    def rayleigh(w: Array[Double]): Double =
      (0 until d).map(j =>
        (0 until d).map(k => w(j) * cov(j)(k) * w(k)).sum).sum
    var w = Array.fill(d)(1.0 / 8)
    val eigStart = rayleigh(w.map(_ / math.sqrt(w.map(x => x * x).sum)))
    (1 to 8).foreach { _ =>
      val y = Array.tabulate(d)(j =>
        (0 until d).map(k => cov(j)(k) * w(k)).sum)
      val nrm = math.sqrt(y.map(x => x * x).sum)
      w = y.map(_ / nrm)
    }
    val eigRef = rayleigh(w)
    val eigMean = (0 until d).map(j => cov(j)(j)).sum / d

    val got = EmbeddingQueries.embPcaPower(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == d)
    val loadings = got.sortBy(_._1).map(_._2)
    val cos = loadings.zip(w).map { case (a, b) => a * b }.sum /
      math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(cos) >= 0.999, s"direction off: |cos|=$cos")
    val eig = got.head._3
    assert(math.abs(eig - eigRef) <= 0.01 * eigRef,
      s"eigenvalue off: $eig vs reference $eigRef")
    // progress: strictly above the start vector's quotient and trace/d
    assert(eig > eigStart && eig > eigMean,
      s"no spectral progress: $eig vs start $eigStart / mean $eigMean")
    // the loadings are (near-)unit-norm — a broken renormalization fails
    val nrm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 0.001, s"norm drifted: $nrm")

    // projection: score_i == (x_i - mean)·w within quantization slack
    val scores = EmbeddingQueries.embPcaProject(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.size == rows.length)
    // collect (id, vector) TOGETHER — two separate collects have no
    // ordering contract to align on
    val byId = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    var worst = 0.0
    byId.foreach { case (id, v) =>
      val expect = (0 until d).map(j => (v(j) - mean(j)) * loadings(j)).sum
      worst = math.max(worst, math.abs(scores(id) - expect))
    }
    // coord quantization is 5e-7/coord, 64 coords + round-6 output
    assert(worst < 1e-4, s"projection off by $worst")
    // scores are centered: their mean is ~0
    val sMean = scores.values.sum / scores.size
    assert(math.abs(sMean) < 1e-4, s"projection not centered: $sMean")
  }
}
