package graft.mwas

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E2e over the CLI surface (minus session lifecycle): positional CSV in,
  * per-bioproject tree + combined CSV out, flags routed. The reference's
  * `python mwas_general.py input.csv` contract. */
class MwasCliSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("mwas-cli-spec")
    .getOrCreate()

  test("CSV in -> per-bioproject + combined CSV out, flags applied") {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_cli")

    // positional user CSV (any header names — S1 is positional)
    val csv = s"$dir/input.csv"
    val rows = (1 to 6).map(i => s"R$i,g1,$i.0")
    Files.writeString(java.nio.file.Paths.get(csv),
      ("run,grp,quant" +: rows).mkString("\n"))

    (1 to 6).map(i => (s"R$i", s"BS$i", "bp1", 1000000.0))
      .toDF("run", "bio_sample", "bio_project", "spots")
      .write.mode("overwrite").parquet(s"$dir/catalog")
    // LONG-form metadata: the CLI must condense on the fly
    (1 to 6).map(i =>
        ("bp1", s"BS$i", "tissue", if (i <= 3) "liver" else "kidney"))
      .toDF("bioproject", "biosample_id", "attribute", "value")
      .write.mode("overwrite").parquet(s"$dir/meta")

    val (n, sig) = MwasCli.run(spark, Array(
      csv, s"$dir/catalog", s"$dir/meta", s"$dir/out",
      "--p-threshold=0.9", "--only-t-test"))
    // liver {1,2,3} vs kidney {4,5,6} twice (include flips per factor)
    assert(n === 2)
    assert(sig === 2) // |t|=4.5 -> p ~0.01 < 0.9 with the loose threshold

    val combined = spark.read.option("header", "true")
      .csv(s"$dir/out/combined")
    assert(combined.count() === 2)
    assert(combined.columns.length === 18)
    assert(combined.select(col("status")).as[String].collect()
      .forall(s => s.startsWith("t_test") && s.contains("significant")))
    val per = spark.read.option("header", "true")
      .option("basePath", s"$dir/out/per_bioproject")
      .csv(s"$dir/out/per_bioproject")
    assert(per.select(col("bioproject")).distinct().as[String]
      .collect().toSeq === Seq("bp1"))
  }
}
