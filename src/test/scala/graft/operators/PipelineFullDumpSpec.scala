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
      WelchTTest.compute(
        r.getAs[Double]("mean_rpm_true"), r.getAs[Double]("sd_rpm_true"),
        r.getAs[Long]("num_true").toDouble,
        r.getAs[Double]("mean_rpm_false"), r.getAs[Double]("sd_rpm_false"),
        r.getAs[Long]("num_false").toDouble) match {
        case Some((t, _, p)) =>
          assert(r.getAs[Double]("test_statistic") === t)
          assert(r.getAs[Double]("p_value") === p,
            "p must pass through unmasked")
          val sig = p < 0.005
          assert((r.getAs[String]("status") == "t_test; significant") === sig)
          val listing = r.getAs[String]("true_biosamples")
          if (sig) { significant += 1; assert(listing.nonEmpty) }
          else assert(listing == "")
        case None =>
          // a zero-variance-both-sides Welch row is legal output (null
          // statistic, never significant, biosamples still listed) —
          // don't MatchError on a fixture that produces one
          assert(r.isNullAt(r.fieldIndex("test_statistic")),
            "engine emitted a statistic the recompute could not")
          assert(r.getAs[String]("status") == "t_test")
      }
    }
    assert(significant > 0, "sf0.001 should have significant Welch rows")
  }

  test("no fixture p-value sits on the 0.005 significance knife-edge " +
      "(oracle recomputes p independently; the hard threshold must not " +
      "be able to flip on cross-implementation drift)") {
    // the engine thresholds commons-math p; the DuckDB oracle thresholds
    // its own continued-fraction p, and the two agree only to ~1e-11
    // (TCdfSpec). Any fixture row within 1e-9 of the cutoff could make
    // `significant` — and the status string and capped listings derived
    // from it — diverge between engines while both are correct. The
    // fixtures are fixed inputs, so enforce the margin loudly here
    // instead of debugging a mysterious hash mismatch later.
    val margin = rows.filter(r => !r.isNullAt(r.fieldIndex("p_value")))
      .map(r => math.abs(r.getAs[Double]("p_value") - 0.005)).min
    assert(margin > 1e-9,
      f"a p-value sits $margin%.2e from the 0.005 threshold — below the " +
        "cross-implementation agreement band; regenerate or exclude")
  }
}
