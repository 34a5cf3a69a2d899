package graft.sources


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S1/S12: the positional reader's reject routing and the rejected-rows
  * report sink — the side-channel the reference only prints
  * (main/converter_.py:60-64). */
class CsvIoSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("csvio-spec")
    .getOrCreate()

  test("readUserInput drops bad rows; the rejects report captures them") {
    import spark.implicits._
    val in = graft.core.TempDirs.create("graft_csvio_in")
    Seq(
      ("R1", "g1", "1.5"),
      ("R2", "g1", "oops"),   // non-numeric → rejected
      ("R3", "g2", "2.0"),
      ("R4", "g2", null))     // missing → rejected
      .toDF("acc", "grp", "qty") // header names are IGNORED (positional)
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(in)

    val good = CsvIo.readUserInput(spark, in)
    assert(good.count() === 2)
    assert(good.columns.toSeq === Seq("run", "group", "quantifier"))
    assert(good.filter(col("run").isin("R2", "R4")).count() === 0)

    val routed = CsvIo.readUserInputRouted(spark, in)
    val report = graft.core.TempDirs.create("graft_csvio_rep")
    CsvIo.writeRejectsReport(routed, report)
    val back = spark.read.option("header", "true").csv(report)
    assert(back.count() === 2)
    val reasons = back.select(col("run"), col("reject_reason"))
      .as[(String, String)].collect().toMap
    assert(reasons("R2") === "non_numeric_quantifier")
    assert(reasons("R4") === "missing_quantifier")
  }

  test("gzip CSV sink really compresses; the positional reader reads it back") {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_csvio_gz")
    Seq(("R1", "g1", "1.5"), ("R2", "g2", "2.5"))
      .toDF("a", "b", "c")
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").option("compression", "gzip").csv(dir)
    // the etl_csv_gzip oracle only proves VALUES survive; this pins that
    // the files really are gzip (a silently-ignored codec option would
    // leave plain CSV and make the round-trip claim vacuous)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName)
    assert(parts.nonEmpty && parts.forall(_.endsWith(".csv.gz")),
      s"expected .csv.gz parts, got ${parts.toSeq}")
    val back = CsvIo.readUserInput(spark, dir)
    assert(back.count() === 2)
    assert(back.filter(col("run") === "R2").select(col("quantifier"))
      .as[Double].head() === 2.5)
  }
}
