package graft.extensions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WelchTTest

/** welch_t must be callable from plain SQL once the extension is
  * installed, and agree with the direct kernel. */
class ExtensionsSpec extends AnyFunSuite {

  test("welch_t is a SQL function under GraftExtensions") {
    // other specs leave an extension-less session active, and the
    // "spark.sql.extensions" conf is STATIC (read from the SparkContext
    // created by whichever spec ran first) — clear the session and inject
    // programmatically instead
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .appName("extensions-spec")
      .getOrCreate()
    try {
      val row = spark.sql(
        "SELECT welch_t(2.0D, 1.0D, 10.0D, 5.0D, 1.5D, 12.0D) AS w")
        .selectExpr("w.t", "w.df", "w.p").head()
      val Some((t, df, p)) = WelchTTest.compute(2.0, 1.0, 10.0, 5.0, 1.5, 12.0)
      assert(math.abs(row.getDouble(0) - t) < 1e-12)
      assert(math.abs(row.getDouble(1) - df) < 1e-12)
      assert(math.abs(row.getDouble(2) - p) < 1e-12)

      // dot_product over SQL array literals (codegen'd native expression)
      val d = spark.sql(
        "SELECT dot_product(array(1.0D, 2.0D, 3.0D), " +
          "array(4.0D, 5.0D, 6.0D)) AS d").head().getDouble(0)
      assert(d === 32.0)
      // arity errors surface at registration, not as a runtime crash
      val err = intercept[Exception] {
        spark.sql("SELECT dot_product(array(1.0D)) AS d").head()
      }
      assert(err.getMessage.contains("2 arguments") ||
        err.getMessage.toLowerCase.contains("invalid"))

      // the dedup primitives compose in pure SQL: 3-gram shingles of
      // "a b c d" = {abc, bcd}, of "b c d e" = {bcd, cde} → J = 1/3
      val j = spark.sql(
        "SELECT sorted_jaccard(ngram_hashes(split('a b c d', ' '), 3), " +
          "ngram_hashes(split('b c d e', ' '), 3)) AS j").head().getDouble(0)
      assert(math.abs(j - 1.0 / 3.0) < 1e-12)
      // n must be a literal (it shapes the compiled loop)
      val nerr = intercept[Exception] {
        spark.sql("SELECT ngram_hashes(split('a b', ' '), 1 + 2) AS h")
          .head()
      }
      assert(nerr.getMessage.contains("INT literal") ||
        nerr.getMessage.toLowerCase.contains("invalid"))

      // LevenshteinPrefilter: the optimizer injects the length lower
      // bound ahead of the DP...
      import spark.implicits._
      val names = Seq("cold widget", "cold widgt", "large bolt",
        "blue rod", "tiny connector assembly").toDF("name")
      names.createOrReplaceTempView("lp_names")
      val q = spark.sql(
        """SELECT a.name, b.name FROM lp_names a JOIN lp_names b
          |ON a.name < b.name AND levenshtein(a.name, b.name) <= 2
          |""".stripMargin)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("abs(") && opt.contains("length("),
        s"guard not injected:\n$opt")
      // ...exactly once (idempotent under the optimizer's fixpoint loop)
      assert(opt.sliding("abs((length(".length)
        .count(_.startsWith("abs((length(")) <= 2, opt)
      // ...and never changes results (the bound is a theorem, not a
      // heuristic): the one distance<=2 pair survives
      val rows = q.collect()
      assert(rows.length === 1)
      assert(rows.head.getString(0) === "cold widget" ||
        rows.head.getString(1) === "cold widget")
      // non-deterministic arguments are NOT rewritten: the guard would
      // re-evaluate them to different values than the DP sees
      val nd = spark.sql(
        """SELECT count(*) FROM lp_names
          |WHERE levenshtein(concat(name, uuid()), name) <= 40
          |""".stripMargin)
      val ndPlan = nd.queryExecution.optimizedPlan.toString
      assert(!ndPlan.contains("abs((length("), s"nondet rewritten:\n$ndPlan")
    } finally spark.stop()
  }
}
