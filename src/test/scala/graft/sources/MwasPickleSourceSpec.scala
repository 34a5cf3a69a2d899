package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the DataSource V2 pickle source: cross-path identity
  * against the binaryFile reader on the reference-written fixtures,
  * file pruning from pushed bioproject predicates, and decode skipping
  * under meta-only projections. */
class MwasPickleSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("mwaspkl-ds-spec")
    .getOrCreate()

  private val fixtures =
    new java.io.File("src/test/resources/mwaspkl").getAbsolutePath

  private def v2 = spark.read.format("mwaspkl").load(fixtures)

  test("full read matches the binaryFile + flatMap path row-for-row") {
    val got = v2
      .select(col("bioproject"), col("status"), col("attributes"),
        col("values"), col("index_list"), col("include"),
        col("n_biosamples"))
      .orderBy(col("bioproject"), col("attributes"), col("values"))
      .collect().map(_.toString)
    val expected = PickleCompat.readProjects(spark, fixtures)
      .withColumn("n_biosamples",
        when(col("status") === "ok", size(col("biosamples"))))
      .select(col("bioproject"), col("status"),
        when(size(col("attributes")) > 0,
          arrays_zip(col("attributes"), col("values"), col("index_lists"),
            col("includes"))).as("sets"),
        col("n_biosamples"))
      .select(col("bioproject"), col("status"),
        explode_outer(col("sets")).as("s"), col("n_biosamples"))
      .select(col("bioproject"), col("status"),
        col("s.attributes"), col("s.values"),
        col("s.index_lists").as("index_list"),
        col("s.includes").as("include"), col("n_biosamples"))
      .orderBy(col("bioproject"), col("attributes"), col("values"))
      .collect().map(_.toString)
    assert(got.length == expected.length)
    assert(got.sameElements(expected))
    // the relation is not trivial: sentinels present as null-set rows,
    // ok files contribute real sets
    assert(v2.filter(col("status") =!= "ok").count() == 3) // EMPTY/BLACK/NOSETS
    assert(v2.filter(col("attributes").isNotNull).count() > 10)
  }

  test("bioproject predicates prune the FILE LISTING, not just rows") {
    v2.filter(col("bioproject") === "PRJBIG").collect()
    val eq = MwasPickleSource.lastPlannedFiles.get()
    assert(eq.map(f => f.substring(f.lastIndexOf('/') + 1)) ==
      Seq("PRJBIG.mwaspkl"), s"expected 1 planned file, got $eq")

    v2.filter(col("bioproject").isin("PRJTEST1", "PRJEDGE")).collect()
    assert(MwasPickleSource.lastPlannedFiles.get().size == 2)

    v2.filter(col("bioproject").startsWith("PRJP")).collect()
    assert(MwasPickleSource.lastPlannedFiles.get()
      .map(f => f.substring(f.lastIndexOf('/') + 1)) ==
      Seq("PRJPROTO2.mwaspkl"))

    // pushdown is visible in the plan, and pruned-exact filters leave no
    // post-scan Filter for the bioproject predicate
    val plan = v2.filter(col("bioproject") === "PRJBIG")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("mwaspkl"),
      s"scan description missing:\n$plan")
  }

  test("a meta-only projection never runs the pickle VM") {
    MwasPickleSource.decodeCount.set(0)
    val statuses = v2.select(col("bioproject"), col("status"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(MwasPickleSource.decodeCount.get() == 0,
      "pickle VM ran under a bioproject/status-only projection")
    assert(statuses("PRJEMPTY") == "empty")
    assert(statuses("PRJBLACK") == "blacklisted")
    assert(statuses("PRJWIDE") == "ok")

    MwasPickleSource.decodeCount.set(0)
    v2.select(col("bioproject"), col("attributes")).collect()
    assert(MwasPickleSource.decodeCount.get() > 0,
      "expected full decodes once a set column is requested")
  }

  test("unsupported predicates stay as residual filters and still apply") {
    val rows = v2.filter(col("status") === "ok" &&
        col("include") === true)
      .select(col("bioproject")).distinct().collect()
    assert(rows.nonEmpty)
    // every surviving project really is ok-status
    val all = v2.filter(col("status") =!= "ok")
      .select(col("bioproject")).collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).forall(p => !all.contains(p)))
  }
}
