package graft.mwas

import java.nio.file.Files

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
    val dir = Files.createTempDirectory("graft_sink").toString
    Pipeline.writePerBioproject(out, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 1)
    assert(back.select(col("bioproject")).as[String].head() === "bp1")
  }
}
