package graft.mwas


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CsvIo, PickleCompat}

/** The full §3.1 lifecycle on REFERENCE-shaped data, end to end through
  * the CLI surface: the reference's own 1000-row user input
  * (main/tests/test_file_1.csv — quoted 3-column run/group/quantifier
  * CSV, 850 runs × 94 family groups) + metadata arriving as the MIGRATED
  * pickle corpus (PickleCompat over the .mwaspkl fixtures) rather than
  * testdata projections. Only the run→biosample catalog is synthesized
  * (the reference resolves runs against its live SQL catalog, which does
  * not exist offline): runs are assigned round-robin over the migrated
  * projects' own biosample universes, deterministically.
  *
  * Asserts the 18-column combined schema, the per-bioproject tree, and
  * the structural spot values the reference's output obeys: every
  * contrast row's num_true + num_false equals its bioproject's
  * n_biosamples (virtual zero-densification counts every member), both
  * sides ≥ 2, and only ok-status projects with sets appear.
  */
class MwasReferenceCorpusSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("mwas-reference-corpus-spec")
    .getOrCreate()

  test("reference input + migrated pickles -> 18-column MWAS output") {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_refcorpus")
    val inputCsv = "src/test/resources/reference_corpus/test_file_1.csv"
    val pklDir = "src/test/resources/mwaspkl"

    // the reference CSV parses clean through the positional reader: all
    // 1000 rows valid (n_reads is numeric), 850 runs, 94 groups
    val routed = CsvIo.readUserInputRouted(spark, inputCsv)
    assert(routed.count() === 1000)
    assert(routed.filter(col("reject_reason").isNotNull).count() === 0)
    assert(routed.select(col("run")).distinct().count() === 850)
    assert(routed.select(col("group")).distinct().count() === 94)

    // migrate the pickle corpus once (S4 → condensed-sets schema) …
    val sets = PickleCompat.condensedSets(spark, pklDir).cache()
    val setsPath = s"$dir/sets"
    sets.write.mode("overwrite").parquet(setsPath)

    // … and synthesize the catalog: every distinct run round-robined
    // over the corpus' distinct (bioproject, biosample) universe, spots
    // deterministic per biosample
    val bios = PickleCompat.biosampleRef(spark, pklDir)
      .select(col("bioproject"), col("biosample_id")).distinct()
      .withColumn("bn", row_number().over(
        Window.orderBy(col("bioproject"), col("biosample_id"))))
    val nBios = bios.count()
    val runs = routed.select(col("run")).distinct()
      .withColumn("rn", row_number().over(Window.orderBy(col("run"))))
    val catalog = runs
      .withColumn("bn", ((col("rn") - 1) % nBios + 1).cast("int"))
      .join(bios, Seq("bn"))
      .select(col("run"), col("biosample_id").as("bio_sample"),
        col("bioproject").as("bio_project"),
        (lit(1000000.0) + col("bn") * 1000.0).as("spots"))
    val catalogPath = s"$dir/catalog"
    catalog.write.mode("overwrite").parquet(catalogPath)

    val (n, sig) = MwasCli.run(spark, Array(
      inputCsv, catalogPath, setsPath, s"$dir/out", "--p-threshold=0.05"))
    assert(n > 0, "lifecycle produced no tests")
    assert(sig >= 0 && sig <= n)

    // multiLine: the migrated corpus carries metadata values with
    // embedded newlines; the sink quotes them correctly (as pandas
    // to_csv does), so the read-back must be newline-aware
    val combined = spark.read.option("header", "true")
      .option("multiLine", "true").csv(s"$dir/out/combined")
    assert(combined.count() === n)
    assert(combined.columns.toSeq === Seq(
      "bioproject", "group", "metadata_field", "metadata_value", "status",
      "runtime_seconds", "memory_usage_bytes", "num_true", "num_false",
      "mean_rpm_true", "mean_rpm_false", "sd_rpm_true", "sd_rpm_false",
      "fold_change", "test_statistic", "p_value", "true_biosamples",
      "false_biosamples"))

    // structural spot values: virtual zero-densification means every
    // contrast covers the WHOLE biosample universe of its project —
    // num_true + num_false == n_biosamples, both sides ≥ 2 (A6/P9)
    val perProject = sets
      .select(col("bioproject"), col("n_biosamples")).distinct()
    val drift = combined
      .join(perProject, "bioproject")
      .filter(col("num_true").cast("long") + col("num_false").cast("long")
        =!= col("n_biosamples").cast("long") ||
        col("num_true").cast("long") < 2 || col("num_false").cast("long") < 2)
    assert(drift.count() === 0,
      "num_true/num_false must partition the project's biosample universe")

    // only ok-status projects with sets can appear; PRJTEST1 (the main
    // migrated fixture) must be among them
    val outProjects = combined.select(col("bioproject")).distinct()
      .as[String].collect().toSet
    val okProjects = sets.select(col("bioproject")).distinct()
      .as[String].collect().toSet
    assert(outProjects.subsetOf(okProjects))
    assert(outProjects.contains("PRJTEST1"))

    // per-bioproject tree partitions over exactly the output's projects
    val per = spark.read.option("header", "true")
      .option("multiLine", "true")
      .option("basePath", s"$dir/out/per_bioproject")
      .csv(s"$dir/out/per_bioproject")
    assert(per.select(col("bioproject")).distinct()
      .as[String].collect().toSet === outProjects)

    // value-level spot check: recompute mean_rpm_true for EVERY output
    // row with an independent formulation (raw input ⋈ catalog, per-
    // biosample rpm averaging, virtual zeros as coalesce-to-0 over the
    // full true side) and require agreement to 1e-6. None of Pipeline's
    // code is reused below.
    val rpmPerBs = spark.read.parquet(catalogPath)
      .join(routed.filter(col("reject_reason").isNull)
        .select(col("run"), col("group"), col("quantifier")),
        Seq("run"), "left_outer")
      .na.fill(Map("quantifier" -> 0.0))
      .withColumn("rpm", col("quantifier") * lit(1e6) /
        when(col("spots") === 0 || col("spots").isNull, lit(1e6))
          .otherwise(col("spots")))
      .filter(col("group").isNotNull)
      .groupBy(col("bio_project").as("bioproject"), col("group"),
        col("bio_sample").as("member"))
      .agg(avg(col("rpm")).as("rpm"))
    val uni = PickleCompat.biosampleRef(spark, pklDir)
      .groupBy(col("bioproject"))
      .agg(collect_set(col("biosample_id")).as("all_bs"))
    val trueMembers = sets.join(uni, "bioproject")
      .select(col("bioproject"),
        regexp_replace(col("attributes"), ",", " ").as("metadata_field"),
        regexp_replace(col("values"), ",", " ").as("metadata_value"),
        explode(when(col("include"), col("members"))
          .otherwise(array_except(col("all_bs"), col("members"))))
          .as("member"))
    val recomputed = combined
      .select(col("bioproject"), col("group"), col("metadata_field"),
        col("metadata_value"), col("num_true").cast("long").as("num_true"),
        col("mean_rpm_true").cast("double").as("mean_rpm_true"))
      .join(trueMembers,
        Seq("bioproject", "metadata_field", "metadata_value"))
      .join(rpmPerBs, Seq("bioproject", "group", "member"), "left_outer")
      .groupBy(col("bioproject"), col("group"), col("metadata_field"),
        col("metadata_value"), col("num_true"), col("mean_rpm_true"))
      .agg(sum(coalesce(col("rpm"), lit(0.0))).as("sum_rpm"),
        count(lit(1)).as("n_members"))
    val rc = recomputed.collect()
    assert(rc.length.toLong === n,
      "every combined row must resolve to exactly one set's true side")
    rc.foreach { r =>
      assert(r.getAs[Long]("n_members") === r.getAs[Long]("num_true"))
      val expectedMean = r.getAs[Double]("sum_rpm") / r.getAs[Long]("num_true")
      assert(math.abs(r.getAs[Double]("mean_rpm_true") - expectedMean) < 1e-6,
        s"mean_rpm_true drift on ${r.getAs[String]("bioproject")}/" +
          s"${r.getAs[String]("group")}: got " +
          s"${r.getAs[Double]("mean_rpm_true")}, expected $expectedMean")
    }
    sets.unpersist()
  }
}
