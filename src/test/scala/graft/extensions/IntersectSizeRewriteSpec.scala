package graft.extensions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the size(array_intersect) → intersect_size optimizer rule:
  * the rewrite fires on ARRAY<STRING> under the extension, preserves
  * values (incl. null elements and null arrays), and stays away from
  * non-string arrays and the legacy sizeOfNull mode. */
class IntersectSizeRewriteSpec extends AnyFunSuite {

  private lazy val spark = {
    // other specs leave an extension-less session active (the
    // ExtensionsSpec convention)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .appName("intersect-rewrite-spec")
      .getOrCreate()
  }

  private def optimized(sql: String): String =
    spark.sql(sql).queryExecution.optimizedPlan.toString

  test("rewrites the stock spelling on ARRAY<STRING>") {
    // non-foldable inputs (id-dependent) — a literal expression would be
    // constant-folded away before the plan can be inspected
    val df = spark.range(2).selectExpr(
      "size(array_intersect(split(concat('a b ', id), ' '), " +
        "split(concat('b c ', id), ' '))) AS s")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("stringarrayintersectsize"),
      s"rewrite did not fire:\n$plan")
    // shared words per row: 'b' and the id suffix
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 2))
    val v = spark.sql(
      "SELECT size(array_intersect(array('a','b','c'), array('b','c','d')))")
      .head().getInt(0)
    assert(v == 2) // folded — value must still be right
  }

  test("value parity with a rule-less session on tricky inputs") {
    val qs = Seq(
      "SELECT size(array_intersect(array('a', CAST(NULL AS STRING)), " +
        "array(CAST(NULL AS STRING), 'b')))",
      "SELECT size(array_intersect(CAST(NULL AS ARRAY<STRING>), " +
        "array('a')))",
      "SELECT size(array_intersect(array('a','a'), array('a')))")
    val withRule = qs.map(q => spark.sql(q).head())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val bare = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("intersect-rewrite-bare")
      .getOrCreate()
    val without = qs.map(q => bare.sql(q).head())
    assert(withRule.map(_.toString) == without.map(_.toString),
      s"rule changed values: $withRule vs $without")
  }

  test("leaves non-string arrays and the legacy mode alone") {
    // non-foldable negatives: a literal form would constant-fold and
    // pass vacuously
    val intPlan = spark.range(2).selectExpr(
      "size(array_intersect(array(id, 2L), array(2L, 3L))) AS s")
      .queryExecution.optimizedPlan.toString
    assert(!intPlan.toLowerCase.contains("stringarrayintersectsize"),
      s"rewrite fired on ARRAY<BIGINT>:\n$intPlan")
    // legacy sizeOfNull is only honored with ANSI off (Size's ctor
    // reads legacySizeOfNull && !ansiEnabled; Spark 4 defaults ANSI on)
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val legacyPlan = spark.range(2).selectExpr(
        "size(array_intersect(split(concat('a ', id), ' '), " +
          "split(concat('a ', id), ' '))) AS s")
        .queryExecution.optimizedPlan.toString
      assert(!legacyPlan.toLowerCase.contains("stringarrayintersectsize"),
        s"rewrite fired under legacy sizeOfNull:\n$legacyPlan")
    } finally {
      spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
      spark.conf.set("spark.sql.ansi.enabled", "true")
    }
  }
}
