package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the binned range join:
  *
  *   - binned ≡ naive on the real fixture (the decomposition proof
  *     executed: same rows, bit-exact, including zero-overlap points);
  *   - bin-boundary correctness on a designed fixture where intervals
  *     and points straddle bin edges exactly (the `div` monotonicity
  *     argument exercised at its boundaries);
  *   - the binned plan contains no nested-loop join and the naive plan
  *     does (the rewrite's entire point).
  */
class RangeJoinSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("range-join-spec")
    .getOrCreate()

  test("binned equals naive on the fixture, including zero-match points") {
    val binned = RangeJoinQueries.rangeJoinBinned(spark, dir).collect()
      .map(r => (r.getLong(0), r.get(1), r.getLong(2), r.getLong(3)))
    val naive = RangeJoinQueries.rangeJoinNaive(spark, dir).collect()
      .map(r => (r.getLong(0), r.get(1), r.getLong(2), r.getLong(3)))
    assert(binned.nonEmpty)
    assert(binned.sameElements(naive))
    // the join is not vacuous: some point sees >1 active session and
    // the heavy count is a strict subset somewhere
    assert(binned.exists(_._3 > 1L))
    assert(binned.exists(t => t._4 < t._3))
  }

  test("bin edges: points and interval endpoints exactly on boundaries") {
    import spark.implicits._
    val W = 3600L * 1000000L
    // intervals in µs: one inside a bin, one spanning 3 bins, one that
    // starts exactly ON a boundary, one point-interval ON a boundary
    val spans = Seq(
      (1L, 100L, 200L),
      (2L, W - 50L, 2 * W + 50L),
      (3L, W, W + 10L),
      (4L, 2 * W, 2 * W)).toDF("sid", "lo", "hi")
    val pts = Seq(
      (10L, 100L),     // in sid=1 start edge
      (11L, 200L),     // in sid=1 end edge (inclusive)
      (12L, 201L),     // just outside
      (13L, W),        // boundary: sids 2,3
      (14L, 2 * W),    // boundary: sids 2,4
      (15L, 3 * W)).toDF("pid", "t")
    val binnedSpans = spans.withColumn("bin",
      explode(sequence(expr(s"lo div $W"), expr(s"hi div $W"))))
    val binnedPts = pts.withColumn("bin", expr(s"t div $W"))
    val got = binnedPts.alias("p")
      .join(binnedSpans.alias("i"),
        col("p.bin") === col("i.bin") &&
          col("p.t") >= col("i.lo") && col("p.t") <= col("i.hi"), "left")
      .groupBy(col("p.pid"))
      .agg(sort_array(collect_list(col("i.sid"))).as("sids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(10L) == Seq(1L))
    assert(got(11L) == Seq(1L))
    assert(got(12L) == Seq.empty)
    assert(got(13L) == Seq(2L, 3L))
    assert(got(14L) == Seq(2L, 4L))
    assert(got(15L) == Seq.empty)
  }

  test("binned plans a hash join; naive plans a nested loop") {
    val binnedPlan = RangeJoinQueries.rangeJoinBinned(spark, dir)
      .queryExecution.executedPlan.toString
    val naivePlan = RangeJoinQueries.rangeJoinNaive(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("NestedLoop"),
      s"binned fell back to a nested loop:\n$binnedPlan")
    assert(naivePlan.contains("NestedLoop"),
      "the naive arm no longer plans a nested loop — the A/B's premise " +
        "changed; re-measure")
  }
}
