package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WelchTTest

/** Pins the flagship dump's masking contract
  * ([[MwasPipelineQueries.pipelineQuery]]): the pipeline runs UNMASKED and
  * only the driver-facing projection nulls, identically to the DuckDB
  * side, the cells no SQL oracle can recompute (permutation-route
  * p-values and everything gated on them). Runs on the real sf0.001
  * fixture — the one SF whose routing mix exercises BOTH sides of the
  * mask (459 Welch rows, 15 permutation rows, Welch-significant rows
  * included). */
class PipelineFullDumpSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .appName("pipeline-full-dump-spec")
    .getOrCreate()

  private lazy val rows = {
    val df = MwasPipelineQueries.pipelineQuery(spark, "/root/testdata/sf0.001")
    try df.collect()
    finally MwasPipelineQueries.evict()
  }

  test("permutation rows are masked: route-only status, null p, null " +
      "listings; Welch rows are not") {
    val (perm, welch) = rows.partition(
      _.getAs[String]("status") == "permutation_test")
    assert(perm.nonEmpty && welch.nonEmpty, "need both routes at sf0.001")
    perm.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("p_value")))
      assert(r.isNullAt(r.fieldIndex("true_biosamples")))
      assert(r.isNullAt(r.fieldIndex("false_biosamples")))
      // the statistic itself is NOT masked (closed-form mean difference)
      assert(!r.isNullAt(r.fieldIndex("test_statistic")))
    }
    assert(welch.forall(_.getAs[String]("status").startsWith("t_test")))
    assert(welch.exists(r => !r.isNullAt(r.fieldIndex("p_value"))))
  }

  test("Welch rows carry the engine's real p (recomputable from the " +
      "row's own sufficient statistics) and significance gates status " +
      "and listings exactly at 0.005") {
    val welch = rows.filter(_.getAs[String]("status").startsWith("t_test"))
    var significant = 0
    welch.foreach { r =>
      val Some((t, _, p)) = WelchTTest.compute(
        r.getAs[Double]("mean_rpm_true"), r.getAs[Double]("sd_rpm_true"),
        r.getAs[Long]("num_true").toDouble,
        r.getAs[Double]("mean_rpm_false"), r.getAs[Double]("sd_rpm_false"),
        r.getAs[Long]("num_false").toDouble): @unchecked
      assert(r.getAs[Double]("test_statistic") === t)
      assert(r.getAs[Double]("p_value") === p, "p must pass through unmasked")
      val sig = p < 0.005
      assert((r.getAs[String]("status") == "t_test; significant") === sig)
      val listing = r.getAs[String]("true_biosamples")
      if (sig) { significant += 1; assert(listing.nonEmpty) }
      else assert(listing == "")
    }
    assert(significant > 0, "sf0.001 should have significant Welch rows")
  }
}
