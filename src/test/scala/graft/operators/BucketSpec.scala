package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The point of bucketing is the plan shape: the bucket-key join must
  * read bucket-aligned splits with NO shuffle under the join. */
class BucketSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    // disable broadcast so the join strategy is the bucket-sensitive one
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .appName("bucket-spec")
    .getOrCreate()

  test("bucket-key join has no shuffle below the join") {
    BucketQueries.bucketedJoin(spark, "/root/testdata/sf0.001").collect()
    // AQE wraps the plan (AdaptiveSparkPlanExec doesn't expose children to
    // collect), so assert on the tree string: children print BELOW their
    // parent, so any Exchange feeding the join would appear after the
    // SortMergeJoin line
    val text = BucketQueries.joinPlan(spark)
      .queryExecution.executedPlan.toString
    val joinIdx = text.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join in:\n$text")
    val below = text.substring(joinIdx)
    assert(!below.contains("Exchange"),
      s"bucketed join must not shuffle its inputs:\n$below")
  }
}
