package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant gates for the PII-style scrub operator. Value-level
  * correctness is the DuckDB oracle's job (text_scrub is hash-compared
  * by the driver); these pin the redaction CONTRACT: nothing matchable
  * survives a pass, and the per-category counts agree with the planted
  * surface (1 email + 1 for every third doc, 1 URL, 1 digit run).
  */
class TextScrubSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("text-scrub-spec")
    .getOrCreate()

  test("scrubbed output carries no residual matches and counts match " +
      "the planted surface") {
    val out = TextQueries.textScrub(spark, dir).cache()
    try {
      val n = out.count()
      assert(n > 0)
      // the contract: a second scrub pass must find nothing
      val residual = out.agg(sum(
        regexp_count(col("scrubbed"),
          lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")) +
        regexp_count(col("scrubbed"), lit("https?://[^\\s]+")) +
        regexp_count(col("scrubbed"), lit("[0-9]{6,}"))).cast("long"))
        .head().getLong(0)
      assert(residual == 0L, s"residual matches after scrub: $residual")
      // planted surface: every doc has 1 URL and 1 long digit run; docs
      // with doc_id % 3 == 0 have 2 emails, the rest 1
      val r = out.agg(
        sum(col("n_urls")).as("u"), sum(col("n_longnums")).as("d"),
        sum(col("n_emails")).as("e"),
        sum(when(pmod(col("doc_id"), lit(3)) === 0, 1L).otherwise(0L))
          .as("third")).head()
      assert(r.getAs[Long]("u") == n, "expected exactly one URL per doc")
      assert(r.getAs[Long]("d") == n, "expected one digit run per doc")
      assert(r.getAs[Long]("e") == n + r.getAs[Long]("third"),
        "expected 1 email per doc plus 1 extra for every third doc")
      // redaction placeholders actually landed
      assert(out.filter(col("scrubbed").contains("<EMAIL>") &&
        col("scrubbed").contains("<URL>") &&
        col("scrubbed").contains("<NUM>")).count() == n)
    } finally out.unpersist()
  }
}
