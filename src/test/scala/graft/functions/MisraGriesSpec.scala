package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries.misraGries

/** Gates for the Misra–Gries TypedImperativeAggregate:
  *
  *   - exact regime (distinct ≤ k): estimates equal true counts under a
  *     many-partition layout that forces real buffer merges;
  *   - approximation regime (distinct > k): the order-independent MG
  *     guarantees — every value with true count > N/(k+1) is present,
  *     and true − N/(k+1) ≤ estimate ≤ true for every tracked value —
  *     checked against exact counts on a skewed corpus, again across
  *     many partitions so serialize/deserialize/merge all execute;
  *   - SQL registration via GraftExtensions;
  *   - null inputs don't vote.
  */
class MisraGriesSpec extends AnyFunSuite {

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.extensions.GraftExtensions())
      .appName("misra-gries-spec")
      .getOrCreate()
  }

  /** Zipf-ish corpus: value i appears ~N/i times, shuffled over 16
    * partitions by a hash so partial buffers see interleaved values. */
  private def corpus(nDistinct: Int) = {
    import spark.implicits._
    (1 to nDistinct).flatMap(i => Seq.fill(600 / i)(s"v$i"))
      .toDF("w")
      .repartition(16, expr("xxhash64(w, monotonically_increasing_id())"))
  }

  private def summary(df: org.apache.spark.sql.DataFrame, k: Int)
      : Map[String, Long] =
    df.agg(misraGries(col("w"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime: distinct <= k reproduces true counts across merges") {
    val df = corpus(20)
    val truth = df.groupBy(col("w")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary(df, 64) == truth)
  }

  test("approximation regime: MG bounds hold on a skewed corpus") {
    val df = corpus(200) // distinct 200 >> k
    val k = 8
    val truth = df.groupBy(col("w")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val slack = n / (k + 1)
    val got = summary(df, k)
    assert(got.size <= k)
    // every tracked estimate is a lower bound within N/(k+1) of truth
    got.foreach { case (v, est) =>
      assert(est <= truth(v), s"$v overestimated: $est > ${truth(v)}")
      assert(est >= truth(v) - slack,
        s"$v underestimated beyond the bound: $est < ${truth(v)} - $slack")
    }
    // every TRUE heavy hitter (count > N/(k+1)) survives
    truth.filter(_._2 > slack).keys.foreach { v =>
      assert(got.contains(v), s"true heavy hitter $v missing")
    }
  }

  test("SQL registration and null handling") {
    import spark.implicits._
    Seq(Some("a"), Some("a"), None, Some("b"), Some("a"), None)
      .toDF("w").createOrReplaceTempView("mg_t")
    val rows = spark.sql(
      """SELECT e.value, e.cnt FROM (
        |  SELECT explode(misra_gries(w, 4)) AS e FROM mg_t)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("a" -> 3L, "b" -> 1L)) // nulls did not vote
  }
}
