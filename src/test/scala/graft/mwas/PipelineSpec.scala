package graft.mwas


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline check on a hand-computed fixture, plus the S7
  * partitioned-sink round trip. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("pipeline-spec")
    .getOrCreate()

  test("hand-computed Welch contrast flows through; partitioned sink " +
      "round-trips") {
    import spark.implicits._
    // spots = 1e6 so rpm == quantifier; quantifiers 1..6 over 6 biosamples
    val catalog = (1 to 6)
      .map(i => (s"R$i", s"BS$i", "bp1", 1000000.0))
      .toDF("run", "bio_sample", "bio_project", "spots")
    val input = (1 to 6).map(i => (s"R$i", "g1", i.toDouble))
      .toDF("run", "group", "quantifier")
    // one set: members {BS1,BS2,BS3}, include=true
    val sets = Seq(("bp1", "tissue", "liver", Seq("BS1", "BS2", "BS3"),
        3, true, 6, 42L))
      .toDF("bioproject", "attributes", "values", "members", "n_stored",
        "include", "n_biosamples", "set_id")

    val out = Pipeline.run(input, catalog, sets, MwasConfig()).cache()
    val row = out.collect()
    assert(row.length === 1)
    val r = row.head
    // true side {1,2,3}: mean 2, pop sd sqrt(2/3); false side {4,5,6}:
    // mean 5 → Welch t = (2-5)/sqrt(2*(2/3)/3) = -4.5; min side 3 < 4 → t
    assert(r.getAs[Long]("num_true") === 3L)
    assert(r.getAs[Long]("num_false") === 3L)
    assert(math.abs(r.getAs[Double]("mean_rpm_true") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("mean_rpm_false") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("test_statistic") - (-4.5)) < 1e-9)
    assert(r.getAs[String]("status").startsWith("t_test"))
    assert(math.abs(r.getAs[Double]("fold_change") -
      (math.log(2.0 / 5.0) / math.log(2.0))) < 1e-9)

    // S7: per-bioproject partitioned CSV sink round-trips
    val dir = graft.core.TempDirs.create("graft_sink")
    Pipeline.writePerBioproject(out, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 1)
    assert(back.select(col("bioproject")).as[String].head() === "bp1")
  }

  test("a group over permCollectCap completes and routes to the Welch " +
      "path (no unbounded value buffer)") {
    import spark.implicits._
    // 10 nonzero biosamples; stored side {BS1..BS5} → min side 5 >= the
    // permutation cutoff (4), so ONLY the cap can force the t-test route
    val catalog = (1 to 10)
      .map(i => (s"R$i", s"BS$i", "bp1", 1000000.0))
      .toDF("run", "bio_sample", "bio_project", "spots")
    val input = (1 to 10).map(i => (s"R$i", "g1", i.toDouble))
      .toDF("run", "group", "quantifier")
    val sets = Seq(("bp1", "tissue", "liver", (1 to 5).map(i => s"BS$i"),
        5, true, 10, 42L))
      .toDF("bioproject", "attributes", "values", "members", "n_stored",
        "include", "n_biosamples", "set_id")

    def statusWith(cfg: MwasConfig): String =
      Pipeline.run(input, catalog, sets, cfg)
        .select(col("status")).as[String].head()

    // sanity: uncapped, this contrast takes the permutation route
    assert(statusWith(MwasConfig()).startsWith("permutation_test"))
    // capped below the group's 10 nonzeros: values are never collected
    // and the contrast routes to the closed-form Welch t — completing
    // where an unbounded collect_list would have buffered the whole group
    val capped = Pipeline.run(input, catalog, sets,
      MwasConfig(permCollectCap = 5)).cache()
    val r = capped.collect().head
    assert(r.getAs[String]("status").startsWith("t_test"))
    assert(!r.getAs[Double]("test_statistic").isNaN)
    assert(r.getAs[Long]("num_true") === 5L)
    // true side {1..5} mean 3, false side {6..10} mean 8, pop var 2 each:
    // t = (3-8)/sqrt(2/5 + 2/5) = -5.590169...
    assert(math.abs(r.getAs[Double]("test_statistic") -
      (-5.0 / math.sqrt(0.8))) < 1e-9)
  }

  test("per-biosample aggregation subtree is planned ONCE: its exchange " +
      "is reused, not re-derived, by every downstream consumer") {
    import spark.implicits._
    val catalog = (1 to 8)
      .map(i => (s"R$i", s"BS$i", "bp1", 1000000.0))
      .toDF("run", "bio_sample", "bio_project", "spots")
    val input = (1 to 8).map(i => (s"R$i", "g1", i.toDouble))
      .toDF("run", "group", "quantifier")
    val sets = Seq(("bp1", "tissue", "liver", (1 to 4).map(i => s"BS$i"),
        4, true, 8, 42L))
      .toDF("bioproject", "attributes", "values", "members", "n_stored",
        "include", "n_biosamples", "set_id")
    // AQE hides exchange reuse behind runtime stage reuse; the static plan
    // makes it assertable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Pipeline.run(input, catalog, sets, MwasConfig())
        .queryExecution.executedPlan.toString
      // the bsRpm aggregate partitions on exactly these three keys; its
      // consumers (group totals, all_vals, stored totals, stored_vals)
      // must READ the one materialized shuffle, not repeat the
      // catalog⋈input join — so exactly one plan line carries a fresh
      // exchange on the keys (ReusedExchange lines quote the target
      // exchange's description, hence the line-wise filter)
      val lines = plan.linesIterator
        .filter(_.contains("Exchange hashpartitioning(bio_project#")).toSeq
      val fresh = lines.filter(l => l.contains("bio_sample#") &&
        !l.contains("ReusedExchange"))
      val reused = lines.filter(l => l.contains("bio_sample#") &&
        l.contains("ReusedExchange"))
      assert(fresh.size === 1, s"bsRpm exchange planned ${fresh.size} times:\n$plan")
      assert(reused.nonEmpty, s"no ReusedExchange of bsRpm in plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
