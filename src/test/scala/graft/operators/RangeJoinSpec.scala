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

  test("interval overlap: binned equals naive on the fixture") {
    val binned = RangeJoinQueries.intervalOverlapJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = RangeJoinQueries.intervalOverlapNaive(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(binned.nonEmpty)
    assert(binned.sameElements(naive))
  }

  test("interval overlap: a pair sharing many bins is emitted exactly once") {
    import spark.implicits._
    val W = 3600L * 1000000L
    // a and b overlap across 4 shared bins; c overlaps neither
    val spans = Seq(
      (1L, 0L, 4 * W - 1L),
      (2L, W / 2, 3 * W),
      (3L, 10 * W, 11 * W)).toDF("user_id", "lo", "hi")
    val binned = spans
      .withColumn("lobin", expr(s"lo div $W"))
      .withColumn("bin", explode(sequence(col("lobin"), expr(s"hi div $W"))))
    val got = binned.alias("a").join(binned.alias("b"),
        col("a.bin") === col("b.bin") &&
          col("a.user_id") < col("b.user_id") &&
          col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi") &&
          col("a.bin") === greatest(col("a.lobin"), col("b.lobin")))
      .select(col("a.user_id"), col("b.user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // without the greatest(lobin) dedup this would be 4 rows, one per
    // shared bin
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("streaming twin replays the batch result exactly") {
    val batch = RangeJoinQueries.rangeJoinBinned(spark, dir).collect()
      .map(_.toString)
    val stream = StreamingRangeJoinQueries.streamRangeJoin(spark, dir)
      .collect().map(_.toString)
    assert(stream.sameElements(batch))
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
