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

  test("column pruning never changes cardinality (r12 advisor catch)") {
    // The old meta-only shortcut emitted ONE row per ok-file while the
    // full projection emits one row per set — df.count() depended on the
    // projected columns. These three counts must be identical.
    val full = v2.select(col("bioproject"), col("status"),
      col("attributes"), col("values"), col("index_list"), col("include"),
      col("n_biosamples")).count()
    assert(v2.count() == full, "count() disagrees with full projection")
    assert(v2.select(col("bioproject")).count() == full,
      "single-column projection disagrees with full projection")
    // and per-group counts agree too (the status-census aggregate)
    val metaCensus = v2.groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullCensus = v2.select(col("status"), col("attributes"))
      .groupBy(col("status")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(metaCensus == fullCensus)
  }

  test("meta-only projection skips the VM for sentinels only") {
    MwasPickleSource.decodeCount.set(0)
    val statuses = v2.select(col("bioproject"), col("status"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val okFiles = new java.io.File(fixtures).listFiles()
      .count(f => f.getName.endsWith(".mwaspkl") && f.length() > 1)
    assert(MwasPickleSource.decodeCount.get() == okFiles,
      "ok-files must decode (their row count IS the set count); " +
        "sentinels must not")
    assert(statuses("PRJEMPTY") == "empty")
    assert(statuses("PRJBLACK") == "blacklisted")
    assert(statuses("PRJWIDE") == "ok")

    MwasPickleSource.decodeCount.set(0)
    v2.select(col("bioproject"), col("attributes")).collect()
    assert(MwasPickleSource.decodeCount.get() == okFiles,
      "expected full decodes once a set column is requested")
  }

  test("a zero-byte file fails loudly, naming the path") {
    val dir = java.nio.file.Files.createTempDirectory("mwaspkl-empty")
    val bad = dir.resolve("PRJZERO.mwaspkl")
    java.nio.file.Files.write(bad, Array.empty[Byte])
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("mwaspkl").load(dir.toString)
        .select(col("bioproject"), col("status")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("PRJZERO") && c.getMessage.contains("0 bytes")))
    java.nio.file.Files.delete(bad); java.nio.file.Files.delete(dir)
  }

  test("committed pandas mirror is in sync with the fixture corpus") {
    // pickle_ds_scan/pickle_migrate's driver oracle reads the COMMITTED
    // pandas-exported mirror (tools/picklemirror.py); if the fixtures
    // change without regenerating it, the drift must fail HERE, in sbt
    // test, not in the driver's round gate
    val mirrorPath = new java.io.File(
      new java.io.File(fixtures).getParentFile, "mwaspkl_mirror")
    val mirror = spark.read
      .parquet(new java.io.File(mirrorPath, "scan.parquet").toString)
      .select(col("bioproject"), col("status"), col("attributes"),
        col("values"), col("index_list"), col("include"),
        col("n_biosamples").cast("int").as("n_biosamples"))
      .collect().map(_.toString).sorted
    val scan = v2.select(col("bioproject"), col("status"),
        col("attributes"), col("values"),
        array_join(col("index_list"), "; ").as("index_list"),
        col("include"), col("n_biosamples"))
      .collect().map(_.toString).sorted
    assert(mirror.length == scan.length &&
      mirror.sameElements(scan),
      "mwaspkl_mirror is out of sync with the fixture corpus — " +
        "regenerate with: python3 tools/picklemirror.py")
  }

  test("committed pandas mirror sets.parquet is in sync (migrate grain)") {
    // same gate for pickle_migrate's oracle grain (r13 advisor: scan
    // .parquet alone left the condensed-set mirror checked only at the
    // driver round gate). set_id is excluded exactly as the driver
    // compare excludes it (xxhash64 is not cross-engine).
    val mirrorPath = new java.io.File(
      new java.io.File(fixtures).getParentFile, "mwaspkl_mirror")
    val mirror = spark.read
      .parquet(new java.io.File(mirrorPath, "sets.parquet").toString)
      .select(col("bioproject"), col("attributes"), col("values"),
        col("members"), col("n_stored").cast("long").as("n_stored"),
        col("include"), col("n_biosamples").cast("long").as("n_biosamples"))
      .collect().map(_.toString).sorted
    val sets = PickleCompat.condensedSets(spark, fixtures)
      .select(col("bioproject"), col("attributes"), col("values"),
        array_join(col("members"), "; ").as("members"),
        col("n_stored").cast("long").as("n_stored"), col("include"),
        col("n_biosamples").cast("long").as("n_biosamples"))
      .collect().map(_.toString).sorted
    assert(mirror.length == sets.length && mirror.sameElements(sets),
      "mwaspkl_mirror sets.parquet is out of sync with the fixture " +
        "corpus — regenerate with: python3 tools/picklemirror.py")
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
