package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The scale claim behind q_exists_correlated: Catalyst must decorrelate
  * the EXISTS / NOT EXISTS / scalar-count subqueries into joins. A plan
  * that re-executes a subquery per outer row dies at 100 TB; a
  * semi/anti/aggregate-join plan is just three shuffles. */
class DecorrelationSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("decorrelation-spec")
    .getOrCreate()

  test("correlated EXISTS/NOT EXISTS/scalar subqueries plan as " +
      "semi/anti/outer joins, not per-row subqueries") {
    val plan = RelationalExtraQueries
      .correlatedSubqueries(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    // the scalar count decorrelates to an aggregate + outer join
    assert(plan.contains("LeftOuter"), s"no outer join for scalar agg:\n$plan")
    // nothing correlated survives optimization
    assert(!plan.contains("correlated=true"), s"correlation survived:\n$plan")
  }
}
