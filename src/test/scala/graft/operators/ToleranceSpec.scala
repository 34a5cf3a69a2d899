package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tolerance gates for the two rows-only approximate queries (VERDICT
  * r11 item 2): each sketch answer is pinned against its hash-oracled
  * exact twin, so "no-oracle by design" still means "machine-checked
  * every run", not "trusted".
  *
  *   - q20_approx_distinct: approx_count_distinct's HLL++ answer within
  *     5% of countDistinct (SURVEY §2.1's contract text; Spark's default
  *     rsd is 0.05, and at this cardinality the observed error is far
  *     smaller — the 5% bound is the CONTRACT, not the typical error).
  *   - q21_approx_aggs: percentile_approx(…, 0.5, 10000)'s answer must
  *     be an actual data value whose RANK is within n/accuracy of the
  *     true median rank (the Greenwald–Khanna guarantee), and the HLL
  *     distinct repeats the 5% gate.
  */
class ToleranceSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("tolerance-spec")
    .getOrCreate()

  test("q20_approx_distinct within 5% of its exact twin") {
    val approx = RelationalQueries.q20(spark, dir).head().getLong(0)
    val exact = RelationalQueries.q20Exact(spark, dir).head().getLong(0)
    assert(math.abs(approx - exact) <= 0.05 * exact,
      s"HLL distinct $approx vs exact $exact exceeds the 5% contract")
  }

  test("q21_approx_aggs median within the sketch's rank bound; HLL within 5%") {
    val row = RelationalQueries.q21Approx(spark, dir).head()
    val medApprox = row.getDouble(row.fieldIndex("med"))
    val adApprox = row.getLong(row.fieldIndex("ad"))

    val prices = graft.core.Tables(spark, dir, "orders")
      .select(col("o_totalprice").cast("double"))
      .orderBy(col("o_totalprice"))
      .collect().map(_.getDouble(0)) // sf0.001: small enough to collect
    val n = prices.length
    // Greenwald–Khanna: the returned value's rank is within
    // ceil(n/accuracy) of any rank in the floor/ceil median pair
    val rankErr = math.ceil(n.toDouble / 10000.0).toInt
    val lo = math.max(0, (n - 1) / 2 - rankErr)
    val hi = math.min(n - 1, n / 2 + rankErr)
    assert(prices(lo) <= medApprox && medApprox <= prices(hi),
      s"approx median $medApprox outside rank window " +
        s"[${prices(lo)}, ${prices(hi)}] (n=$n, rankErr=$rankErr)")

    val exactAd = RelationalQueries.q20Exact(spark, dir).head().getLong(0)
    assert(math.abs(adApprox - exactAd) <= 0.05 * exactAd,
      s"HLL distinct $adApprox vs exact $exactAd exceeds the 5% contract")
  }
}
