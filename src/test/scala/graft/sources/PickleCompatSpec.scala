package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.MetadataCondenser

/** S4 round trip: fixtures under src/test/resources/mwaspkl were written by
  * the REFERENCE's own converter path (real `pickle.dump` of the
  * `metadata_to_set_accession` outputs, pandas 2.x, protocols 2 AND 4 —
  * protocol 2 encodes ndarray bytes via `_codecs.encode` latin-1 records)
  * from known wide frames; `long_form.parquet` holds the SAME data melted
  * to the condenser's long relation. Reading the pickles must therefore
  * produce exactly what condensing the long relation produces —
  * including the adversarial PRJEDGE corpus (unicode, emoji, embedded
  * newlines/tabs, quotes, 400-char values, ;/: label collisions) and the
  * 66k-row PRJWIDE pickle. */
class PickleCompatSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("pickle-compat-spec")
    .getOrCreate()

  private val fixtures =
    new java.io.File("src/test/resources/mwaspkl").getAbsolutePath

  test("sentinel files decode to empty/blacklisted statuses, not rows") {
    val statuses = PickleCompat.readProjects(spark, fixtures)
      .collect().map(p => p.bioproject -> p.status).toMap
    assert(statuses("PRJEMPTY") === "empty")
    assert(statuses("PRJBLACK") === "blacklisted")
    // no-sets projects are written as the '0' sentinel by the reference
    assert(statuses("PRJNOSETS") === "empty")
    assert(statuses("PRJTEST1") === "ok")
    assert(statuses("PRJBIG") === "ok")
  }

  test("biosample_ref relation recovers the pickled ref lists " +
      "(incl. the 66k-row pickle whose indexes cross the 16-bit opcode)") {
    val ref = PickleCompat.biosampleRef(spark, fixtures)
    val counts = ref.groupBy(col("bioproject")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("PRJTEST1" -> 12L, "PRJBIG" -> 300L,
      "PRJWIDE" -> 66000L, "PRJEDGE" -> 12L, "PRJPROTO2" -> 10L))
    // idx is the position in the (sorted) ref list — spot-check both ends
    val big = ref.filter(col("bioproject") === "PRJBIG")
      .orderBy(col("idx")).collect()
    assert(big.head.getAs[String]("biosample_id") === "SAM0001")
    assert(big.last.getAs[String]("biosample_id") === "SAM0300")
    assert(big.last.getAs[Int]("idx") === 299)
  }

  test("migrated pickles == MetadataCondenser.condense on the same data " +
      "(the S4 round trip)") {
    val migrated = PickleCompat.condensedSets(spark, fixtures)
    val condensed = MetadataCondenser.condense(
      spark.read.parquet(s"$fixtures/long_form.parquet"))

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("bioproject"), col("attributes"), col("values"),
          array_join(col("members"), "|").as("m"),
          col("n_stored").cast("long"), col("include"),
          col("n_biosamples").cast("long"), col("set_id"))
        .collect().map(_.toSeq.mkString("")).sorted.toSeq

    val (m, c) = (canon(migrated), canon(condensed))
    assert(m.nonEmpty, "no migrated sets parsed")
    assert(m === c)
  }

  test("migrated sets drive the MWAS pipeline end to end (the adoption " +
      "path: old pickle corpus -> parquet -> unchanged engine)") {
    import spark.implicits._
    val out = graft.core.TempDirs.create("graft_migrate")
    PickleCompat.condensedSets(spark, fixtures)
      .write.mode("overwrite").parquet(s"$out/metadata_sets")
    val sets = spark.read.parquet(s"$out/metadata_sets")
      .filter(col("bioproject") === "PRJTEST1")

    // a catalog/input over PRJTEST1's own biosample universe
    val ids = (1 to 12).map(i => f"SAM$i%03d")
    val catalog = ids.zipWithIndex
      .map { case (bs, i) => (s"R$i", bs, "PRJTEST1", 1000000.0) }
      .toDF("run", "bio_sample", "bio_project", "spots")
    val input = ids.indices.map(i => (s"R$i", "g1", (i + 1).toDouble))
      .toDF("run", "group", "quantifier")

    val result = graft.mwas.Pipeline.run(input, catalog, sets,
      graft.mwas.MwasConfig()).cache()
    assert(result.count() > 0)
    // every contrast derives from a migrated set: labels survived intact
    val fields = result.select(col("metadata_field")).distinct()
      .as[String].collect().toSet
    assert(fields.subsetOf(Set("age_group", "reads", "tissue", "notes")),
      s"unexpected fields $fields")
    result.unpersist()
  }

  test("corrupt payloads fail loudly with a parse error, not silent rows") {
    val bad = Array[Byte](0x80.toByte, 4, 'X', 'Y', 'Z')
    val e = intercept[IllegalArgumentException] {
      PickleCompat.parse("PRJBAD", bad)
    }
    assert(e.getMessage.contains("PRJBAD") ||
      e.getMessage.contains("unsupported opcode"))
  }
}
