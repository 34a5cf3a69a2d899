package graft.extensions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the row_number-top-k optimizer rule: the stock SQL
  * spelling plans as the TopKPerGroup operator under the extension,
  * values match a rule-less session (ties, residual predicates, both
  * comparison spellings), and the vetoes hold (rank escapes, other
  * window functions, sibling window expressions, rank used beyond the
  * gate). */
class RowNumberTopKRewriteSpec extends AnyFunSuite {

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .appName("rownum-topk-spec")
      .getOrCreate()
  }

  private def fixture(s: SparkSession): Unit = {
    import s.implicits._
    // group 0: 5 rows with a tie at the k boundary; group 1: 2 rows
    Seq((0L, 1L, 5.0), (0L, 2L, 4.0), (0L, 3L, 4.0), (0L, 4L, 3.0),
      (0L, 5L, 2.0), (1L, 6L, 9.0), (1L, 7L, 8.0))
      .toDF("g", "id", "v").createOrReplaceTempView("tk")
  }

  private val stock =
    """SELECT g, id FROM (
      |  SELECT g, id, row_number() OVER (
      |    PARTITION BY g ORDER BY v DESC, id) AS rn FROM tk
      |) WHERE rn <= 2""".stripMargin

  test("stock spelling plans as TopKPerGroup and matches values") {
    fixture(spark)
    val df = spark.sql(stock)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("TopKPerGroup"), s"rewrite did not fire:\n$opt")
    assert(!opt.contains("Window"), s"window survived:\n$opt")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 1L), (0L, 2L), (1L, 6L), (1L, 7L)))
    // rn < 3 spelling too
    val lt = spark.sql(stock.replace("rn <= 2", "rn < 3"))
    assert(lt.queryExecution.optimizedPlan.toString.contains("TopKPerGroup"))
    assert(lt.collect().length == 4)
  }

  test("residual predicates survive above the operator") {
    fixture(spark)
    val df = spark.sql(stock.replace("rn <= 2", "rn <= 2 AND id > 1"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("TopKPerGroup"), s"residual blocked rewrite:\n$opt")
    assert(df.collect().map(_.getLong(1)).toSet == Set(2L, 6L, 7L))
  }

  test("vetoes: rank escapes, rank bands, non-row_number, siblings") {
    fixture(spark)
    val escaped = spark.sql(
      """SELECT g, rn FROM (
        |  SELECT g, id, row_number() OVER (
        |    PARTITION BY g ORDER BY v DESC, id) AS rn FROM tk
        |) WHERE rn <= 2""".stripMargin)
    assert(!escaped.queryExecution.optimizedPlan.toString
      .contains("TopKPerGroup"), "fired despite projected rank")
    val band = spark.sql(stock.replace("rn <= 2", "rn <= 2 AND rn > 0"))
    assert(!band.queryExecution.optimizedPlan.toString
      .contains("TopKPerGroup"), "fired despite band use of rank")
    assert(band.collect().length == 4)
    // rank() without the tiebreak: BOTH 4.0-ties rank 2 — semantics
    // row_number cannot reproduce, so the rule must not touch it
    val rank = spark.sql(
      """SELECT g, id FROM (
        |  SELECT g, id, rank() OVER (
        |    PARTITION BY g ORDER BY v DESC) AS rn FROM tk
        |) WHERE rn <= 2""".stripMargin)
    assert(!rank.queryExecution.optimizedPlan.toString
      .contains("TopKPerGroup"), "fired on rank() — tie semantics differ")
    assert(rank.collect().length == 5)
    val sibling = spark.sql(
      """SELECT g, id, s FROM (
        |  SELECT g, id,
        |    row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rn,
        |    sum(v) OVER (PARTITION BY g) AS s
        |  FROM tk) WHERE rn <= 2""".stripMargin)
    assert(!sibling.queryExecution.optimizedPlan.toString
      .contains("TopKPerGroup"), "fired despite a sibling window expr")
  }

  test("global top-N (no PARTITION BY) rewrites and runs") {
    fixture(spark)
    // the empty-partition case: ClusteredDistribution(Nil) is rejected
    // by its own require — AllTuples in TopKExec is what keeps this
    // common spelling from crashing under the extension
    val df = spark.sql(
      """SELECT g, id FROM (
        |  SELECT g, id, row_number() OVER (ORDER BY v DESC, id) AS rn
        |  FROM tk) WHERE rn <= 3""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("TopKPerGroup"),
      "global spelling did not rewrite")
    assert(df.collect().map(_.getLong(1)).toSet == Set(6L, 7L, 1L))
  }

  test("parity with a rule-less session on the stock spelling") {
    fixture(spark)
    val withRule = spark.sql(stock).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val bare = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("rownum-topk-bare")
      .getOrCreate()
    fixture(bare)
    val without = bare.sql(stock).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withRule == without, s"rule changed values: $withRule vs $without")
  }
}
