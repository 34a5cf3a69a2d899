package graft.extensions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the TopKPerGroup custom operator: the physical plan is the
  * two-phase bounded-heap exec (no Window, no full-input Sort below the
  * exchange), values match the row_number window spelling on
  * adversarial shapes (ties, k > group size, null order keys, single
  * group), and the partial stage provably bounds what the exchange
  * carries. */
class TopKPerGroupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("topk-spec")
    .getOrCreate()

  private def fixture = {
    import spark.implicits._
    // group 0: 6 rows incl. a tie on v; group 1: 2 rows (< k);
    // group 2: null v rows mixed in; group 3: singleton
    Seq[(Long, Long, Option[Double])](
      (0L, 1L, Some(5.0)), (0L, 2L, Some(5.0)), (0L, 3L, Some(4.0)),
      (0L, 4L, Some(3.0)), (0L, 5L, Some(2.0)), (0L, 6L, Some(1.0)),
      (1L, 7L, Some(9.0)), (1L, 8L, Some(8.0)),
      (2L, 9L, None), (2L, 10L, Some(7.0)), (2L, 11L, None),
      (3L, 12L, Some(0.0)))
      .toDF("g", "id", "v")
  }

  test("plan: two TopKExec stages, no Window, exchange between them") {
    // AQE off so the physical tree is directly inspectable (the node
    // placement is identical under AQE — see the plans/ snapshot)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.plans.TopK.perGroup(fixture,
        Seq(col("g")), Seq(col("v").desc, col("id")), 3)
      val plan = df.queryExecution.executedPlan
      val stages = plan.collect { case t: graft.plans.TopKExec => t }
      assert(stages.map(_.partial).sorted == Seq(false, true),
        s"expected one partial + one final TopKExec:\n$plan")
      assert(plan.toString.toLowerCase.contains("exchange"),
        s"no exchange:\n$plan")
      assert(!plan.toString.contains("Window"),
        s"window survived:\n$plan")
      // the final stage sits ABOVE the exchange, the partial below it
      val ex = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.head
      assert(ex.collect { case t: graft.plans.TopKExec => t }
        .forall(_.partial), "partial stage must be below the exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("values match the window spelling on adversarial shapes") {
    val d = fixture
    for (k <- Seq(1, 3, 10)) {
      val got = graft.plans.TopK.perGroup(d,
          Seq(col("g")), Seq(col("v").desc, col("id")), k)
        .select(col("g"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = d.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
            .orderBy(col("v").desc, col("id"))))
        .filter(col("rn") <= k)
        .select(col("g"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"k=$k: got $got want $want")
    }
  }

  test("global top-k: empty keys plan as AllTuples, not a crash") {
    import spark.implicits._
    // the common global top-N spelling — ClusteredDistribution(Nil) is
    // rejected by its own require, so empty keys must map to AllTuples
    val d = spark.range(1000)
      .select(col("id"), (col("id") * 37 % 101).cast("double").as("v"))
    val got = graft.plans.TopK.perGroup(d,
        Seq.empty, Seq(col("v").desc, col("id")), 3)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val want = d.orderBy(col("v").desc, col("id")).limit(3)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == want, s"global top-3: got $got want $want")
    // the SQL rewrite path for the same shape lives in
    // RowNumberTopKRewriteSpec (needs the extension-installed session)
  }

  test("float group keys normalize: 0.0 and -0.0 are one group") {
    import spark.implicits._
    // Spark's NormalizeFloatingNumbers rule only matches
    // Aggregate/Window/Join — the strategy applies the same
    // normalization to the custom node's keys, else raw UnsafeRow bytes
    // split the logical group and the operator returns up to 2k rows
    val d = Seq((0.0, 1L, 1.0), (-0.0, 2L, 2.0), (-0.0, 3L, 3.0))
      .toDF("g", "id", "v")
    val got = graft.plans.TopK.perGroup(d,
        Seq(col("g")), Seq(col("v").desc, col("id")), 2)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // one group of 3 rows, k=2 → ids of the two largest v
    assert(got == Set(3L, 2L), s"zero-sign split the group: $got")
  }

  test("partial stage bounds the exchanged rows") {
    // 4,000 rows, 4 groups, k=2: the exchange must carry at most
    // partitions * groups * k rows, never the input
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = spark.range(4000).repartition(4)
        .select((col("id") % 4).as("g"), col("id").as("id"),
          (col("id") * 37 % 1001).cast("double").as("v"))
      val df = graft.plans.TopK.perGroup(d,
        Seq(col("g")), Seq(col("v").desc, col("id")), 2)
      assert(df.count() == 8)
      val exchanged = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.collect {
              case t: graft.plans.TopKExec => t }.nonEmpty =>
          e.metrics("shuffleRecordsWritten").value
      }
      assert(exchanged.nonEmpty && exchanged.forall(_ <= 4L * 4 * 2),
        s"exchange carried too much: $exchanged")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
