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

  test("q23_permutation MC p-values within 3·SE of exact enumeration") {
    // VERDICT r13 item 5 — the last waiver gains a quantitative gate.
    // On q23_permutation_exact's own domain (the hash-oracled groups,
    // via the SHARED base extractor so no filter logic is copied), force
    // the Monte-Carlo path (exactCutoff = 0) with the production 10000
    // resamples and require each seeded-MC p to sit within
    // 3·sqrt(p(1−p)/N) of the exact-enumeration p — the binomial
    // standard-error band the estimator obeys by construction — with a
    // 2/(N+1) floor absorbing the (hits+1)/(N+1) correction's bias at
    // the extremes. A broken RNG stream, a biased resampler, or a wrong
    // two-sided count all blow this band; host noise cannot (the stream
    // is seeded from data content only).
    import graft.stats.PermutationTest
    val n = 10000
    val groups = MwasQueries.q23PermExactBase(spark, dir).collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
    assert(groups.size >= 3,
      s"degenerate domain: only ${groups.size} exact-path groups at $dir")
    groups.foreach { case (cust, rows) =>
      val x = rows.filter(_.getBoolean(2)).map(_.getDouble(1))
      val y = rows.filterNot(_.getBoolean(2)).map(_.getDouble(1))
      val exact = PermutationTest.test(x, y, n, exactCutoff = 20000)
      assert(exact.method == "permutation_exact",
        s"cust $cust unexpectedly off the exact path: ${exact.method}")
      val mc = PermutationTest.test(x, y, n, exactCutoff = 0)
      assert(mc.method.startsWith("permutation_mc"),
        s"cust $cust unexpectedly off the MC path: ${mc.method}")
      assert(mc.statistic == exact.statistic,
        s"cust $cust observed statistic differs across paths")
      val p = exact.p_value
      val band = math.max(3.0 * math.sqrt(p * (1 - p) / n), 2.0 / (n + 1))
      assert(math.abs(mc.p_value - p) <= band,
        f"cust $cust: MC p ${mc.p_value}%.4f vs exact $p%.4f " +
          f"exceeds 3·SE band $band%.4f")
    }
  }
}
