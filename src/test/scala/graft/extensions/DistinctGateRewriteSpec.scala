package graft.extensions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the count(DISTINCT)-pair-gate optimizer rule: the rewrite
  * fires on the HAVING >= 2 shape (distinct count dropped, min/max
  * substituted), preserves values against a rule-less session on
  * null/degenerate groups across every supported comparison spelling,
  * and stays away when the count escapes or is used beyond the gate. */
class DistinctGateRewriteSpec extends AnyFunSuite {

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .appName("distinct-gate-spec")
      .getOrCreate()
  }

  // groups: g=0 two distinct / g=1 one value twice / g=2 single row /
  // g=3 all-null k / g=4 one null one value / g=5 null + two distinct
  private def fixture(s: SparkSession): Unit = {
    import s.implicits._
    Seq[(Long, Option[Long])](
      (0L, Some(1L)), (0L, Some(2L)),
      (1L, Some(7L)), (1L, Some(7L)),
      (2L, Some(9L)),
      (3L, None), (3L, None),
      (4L, None), (4L, Some(5L)),
      (5L, None), (5L, Some(1L)), (5L, Some(2L)))
      .toDF("g", "k").createOrReplaceTempView("t")
  }

  private val spellings = Seq(
    "c >= 2" -> Set(0L, 5L),
    "c > 1" -> Set(0L, 5L),
    "2 <= c" -> Set(0L, 5L),
    "1 < c" -> Set(0L, 5L),
    "c <= 1" -> Set(1L, 2L, 3L, 4L),
    "c < 2" -> Set(1L, 2L, 3L, 4L),
    "1 >= c" -> Set(1L, 2L, 3L, 4L),
    "2 > c" -> Set(1L, 2L, 3L, 4L),
    "c = 1" -> Set(1L, 2L, 4L),
    "1 = c" -> Set(1L, 2L, 4L))

  private def q(pred: String): String =
    s"""SELECT g FROM (
       |  SELECT g, count(DISTINCT k) AS c FROM t GROUP BY g
       |) WHERE $pred""".stripMargin

  test("fires on the gate shape and drops the distinct count") {
    fixture(spark)
    val plan = spark.sql(q("c >= 2")).queryExecution.optimizedPlan.toString
    assert(!plan.contains("distinct"), s"distinct count survived:\n$plan")
    assert(plan.contains("_gate_mn") && plan.contains("_gate_mx"),
      s"min/max gate absent:\n$plan")
    // physical plan: ONE pair of exchanges (agg by g), not the
    // two-aggregate distinct pipeline keyed by (g, k)
    val phys = spark.sql(q("c >= 2")).queryExecution.executedPlan.toString
    assert(!phys.contains("count(distinct"), s"physical distinct:\n$phys")
  }

  test("every spelling matches the rule-less session on degenerate groups") {
    fixture(spark)
    val withRule = spellings.map { case (pred, _) =>
      spark.sql(q(pred)).collect().map(_.getLong(0)).toSet
    }
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val bare = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("distinct-gate-bare")
      .getOrCreate()
    // no bare.stop(): local-mode sessions share one SparkContext —
    // stopping it would kill the suite's main session (the
    // IntersectSizeRewriteSpec convention)
    fixture(bare)
    spellings.zip(withRule).foreach { case ((pred, expected), got) =>
      val bareGot = bare.sql(q(pred)).collect().map(_.getLong(0)).toSet
      assert(got == bareGot, s"'$pred': rule=$got bare=$bareGot")
      assert(got == expected, s"'$pred': got $got, fixture says $expected")
    }
  }

  test("negated and nested spellings keep null-group semantics") {
    fixture(spark)
    // NOT(c >= 2): null-group g=3 must KEEP (c=0, NOT(false)=true) —
    // the coalesce inside the gate is what makes this survive NOT
    val got = spark.sql(q("NOT (c >= 2)")).collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L), s"NOT spelling broke: $got")
  }

  test("vetoes when the count escapes or has non-gate uses") {
    fixture(spark)
    // count projected out alongside the gate → must survive
    val escaped = spark.sql(
      """SELECT g, c FROM (
        |  SELECT g, count(DISTINCT k) AS c FROM t GROUP BY g
        |) WHERE c >= 2""".stripMargin)
    assert(escaped.queryExecution.optimizedPlan.toString
      .contains("distinct"), "rewrite fired despite projected count")
    assert(escaped.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet == Set((0L, 2L), (5L, 2L)))
    // band predicate: gate + non-gate use of the same count → veto
    val band = spark.sql(q("c >= 2 AND c < 10"))
    assert(band.queryExecution.optimizedPlan.toString.contains("distinct"),
      "rewrite fired despite a non-gate use")
    assert(band.collect().map(_.getLong(0)).toSet == Set(0L, 5L))
  }

  test("leaves filtered and multi-arg distinct counts alone") {
    fixture(spark)
    val filtered = spark.sql(
      """SELECT g FROM (
        |  SELECT g, count(DISTINCT k) FILTER (WHERE k > 1) AS c
        |  FROM t GROUP BY g
        |) WHERE c >= 2""".stripMargin)
    // Spark's own RewriteDistinctAggregates may have expanded the
    // distinct away already — the gate's absence is the real assertion
    assert(!filtered.queryExecution.optimizedPlan.toString
      .contains("_gate_mn"), "rewrite fired on a FILTER'd count")
    // FILTER k > 1 keeps {2}, {7,7}, {9}, {}, {5}, {2} per group
    assert(filtered.collect().isEmpty)
    val multi = spark.sql(
      """SELECT g FROM (
        |  SELECT g, count(DISTINCT k, g) AS c FROM t GROUP BY g
        |) WHERE c >= 2""".stripMargin)
    assert(!multi.queryExecution.optimizedPlan.toString.contains("_gate_mn"),
      "rewrite fired on a multi-arg count")
  }
}
