package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the quality-model operators (cross-engine value
  * agreement is the DuckDB oracle's job). */
class QualityModelSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("quality-model-spec")
    .getOrCreate()

  test("text_entropy: uniform=1, degenerate=0, stuffed in between") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("entropy_spec").toString
    graft.core.TempDirs.cleanOnExit(java.nio.file.Paths.get(dir))
    Seq(
      (0L, "a b c d e f g h"),          // 8 distinct once each: uniform
      (1L, "spam spam spam spam spam"), // one word type: degenerate
      (2L, "spam spam spam spam other")) // stuffed: low but nonzero
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = QualityModelQueries.textEntropy(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((8L, 8L, 3.0, 1.0)), s"uniform=${out(0L)}")
    assert(out(1L) == ((5L, 1L, 0.0, 0.0)), s"degenerate=${out(1L)}")
    val (_, _, h2, nh2) = out(2L)
    assert(h2 > 0.0 && nh2 > 0.0 && nh2 < 1.0, s"stuffed=${out(2L)}")
  }

  test("quality_logreg: prose keeps, punctuation soup does not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("logreg_spec").toString
    graft.core.TempDirs.cleanOnExit(java.nio.file.Paths.get(dir))
    val prose = Seq.fill(30)("the report is a summary of the data for it")
      .mkString(" ")
    val soup = "!!! ??? ... ((())) ;;; !!! ??? ... ;;; (((" * 5
    Seq((0L, prose), (1L, soup))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = QualityModelQueries.qualityLogreg(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val (lg0, p0, k0) = out(0L)
    val (lg1, p1, k1) = out(1L)
    assert(k0 && lg0 > 0 && p0 > 0.5, s"prose=${out(0L)}")
    assert(!k1 && lg1 < 0 && p1 < 0.5, s"soup=${out(1L)}")
    // decision is exactly the logit sign, prob is its sigmoid side
    assert((p0 > 0.5) == k0 && (p1 > 0.5) == k1)
  }
}
