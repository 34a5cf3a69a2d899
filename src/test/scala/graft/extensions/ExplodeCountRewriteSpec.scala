package graft.extensions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the explode-count optimizer rule: the rewrite fires on the
  * stock LATERAL VIEW / DataFrame explode-then-count spellings (the
  * Generate disappears, `sum(size)` replaces the count), preserves
  * values against a rule-less session on every degenerate array shape,
  * and stays away from outer explodes, generator-referencing
  * aggregates, and non-count aggregate functions. */
class ExplodeCountRewriteSpec extends AnyFunSuite {

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .appName("explode-count-spec")
      .getOrCreate()
  }

  // degenerate shapes: normal / empty array / NULL array / null
  // elements / duplicate group key
  private def fixture(s: SparkSession): Unit = {
    import s.implicits._
    Seq[(Long, Option[Seq[Option[String]]])](
      (0L, Some(Seq(Some("a"), Some("b"), Some("c")))),
      (1L, Some(Seq.empty)),
      (2L, None),
      (3L, Some(Seq(Some("x"), None, Some("y")))),
      (4L, Some(Seq(Some("p")))),
      (4L, Some(Seq(Some("q"), Some("r")))))
      .toDF("id", "arr").createOrReplaceTempView("t")
  }

  private val lateral =
    """SELECT id, count(*) AS n FROM t
      |LATERAL VIEW explode(arr) x AS w GROUP BY id""".stripMargin

  test("fires on the LATERAL VIEW spelling: Generate gone, sum(size) in") {
    fixture(spark)
    val opt = spark.sql(lateral).queryExecution.optimizedPlan.toString
    assert(!opt.contains("Generate"), s"Generate survived:\n$opt")
    // on a parquet/real source the projected size survives; on this
    // LocalRelation fixture ConvertToLocalRelation folds the project,
    // leaving the summed size attribute
    assert(opt.contains("size(") || opt.contains("_graft_explode_sz"),
      s"size projection absent:\n$opt")
    val phys = spark.sql(lateral).queryExecution.executedPlan.toString
    assert(!phys.contains("Generate"), s"physical Generate:\n$phys")
  }

  test("fires on the DataFrame spelling") {
    fixture(spark)
    val df = spark.table("t")
      .select(col("id"), explode(col("arr")).as("w"))
      .groupBy(col("id")).count()
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Generate"), s"Generate survived:\n$opt")
  }

  test("values match the rule-less session on every degenerate shape") {
    fixture(spark)
    val withRule = spark.sql(lateral).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val globalWithRule = spark.sql(
      "SELECT count(*) AS n FROM t LATERAL VIEW explode(arr) x AS w")
      .collect().head.getLong(0)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val bare = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("explode-count-bare")
      .getOrCreate()
    // no bare.stop(): local-mode sessions share one SparkContext
    fixture(bare)
    val bareGot = bare.sql(lateral).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withRule == bareGot, s"rule=$withRule bare=$bareGot")
    // empty/null arrays absent; null ELEMENTS counted; dup keys summed
    assert(withRule == Set((0L, 3L), (3L, 3L), (4L, 3L)))
    assert(globalWithRule ==
      bare.sql(
        "SELECT count(*) AS n FROM t LATERAL VIEW explode(arr) x AS w")
        .collect().head.getLong(0))
    assert(globalWithRule == 9L, "global aggregate (no GROUP BY) rewrites too")
  }

  test("vetoes: outer explode, generator-referencing aggs, non-count aggs") {
    fixture(spark)
    // OUTER explode emits a row for empty/null arrays — count differs
    val outer = spark.sql(
      """SELECT id, count(*) AS n FROM t
        |LATERAL VIEW OUTER explode(arr) x AS w GROUP BY id""".stripMargin)
    assert(outer.queryExecution.optimizedPlan.toString.contains("Generate"),
      "rewrite fired on OUTER explode")
    assert(outer.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 3L), (1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))
    // count of the exploded column skips its nulls — not size(arr)
    val countW = spark.sql(
      """SELECT id, count(w) AS n FROM t
        |LATERAL VIEW explode(arr) x AS w GROUP BY id""".stripMargin)
    assert(countW.queryExecution.optimizedPlan.toString.contains("Generate"),
      "rewrite fired on count(<exploded col>)")
    assert(countW.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 3L), (3L, 2L), (4L, 3L)))
    // grouping BY the exploded column
    val byW = spark.sql(
      """SELECT w, count(*) AS n FROM t
        |LATERAL VIEW explode(arr) x AS w GROUP BY w""".stripMargin)
    assert(byW.queryExecution.optimizedPlan.toString.contains("Generate"),
      "rewrite fired when grouping by the exploded column")
    // a second, non-count aggregate function
    val withSum = spark.sql(
      """SELECT id, count(*) AS n, sum(length(w)) AS s FROM t
        |LATERAL VIEW explode(arr) x AS w GROUP BY id""".stripMargin)
    assert(withSum.queryExecution.optimizedPlan.toString.contains("Generate"),
      "rewrite fired alongside a sum over exploded rows")
    // count(DISTINCT *) shapes
    val distinct = spark.sql(
      """SELECT id, count(DISTINCT w) AS n FROM t
        |LATERAL VIEW explode(arr) x AS w GROUP BY id""".stripMargin)
    assert(distinct.queryExecution.optimizedPlan.toString.contains("Generate"),
      "rewrite fired on count(DISTINCT)")
  }

  test("computed arrays are a scope veto; the kill-switch disables the rule") {
    fixture(spark)
    import spark.implicits._
    // explode(split(...)) — a COMPUTED array — stays on the explode plan
    // (measured scope decision: the rewrite re-evaluates the computation
    // in a branch shared pipelines pay for; see the rule's scope note)
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "x y")).toDF("d", "text")
    val counted = docs
      .select(col("d"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
    assert(counted.queryExecution.optimizedPlan.toString.contains("Generate"),
      "rewrite fired on a computed array")
    assert(counted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L), (2L, 1L), (3L, 2L)))
    // the session kill-switch turns the attribute case off too
    spark.conf.set(graft.plans.ExplodeCountRewrite.EnabledKey, "false")
    try {
      val off = spark.sql(lateral).queryExecution.optimizedPlan.toString
      assert(off.contains("Generate"), "kill-switch ignored")
    } finally spark.conf.set(
      graft.plans.ExplodeCountRewrite.EnabledKey, "true")
  }
}
