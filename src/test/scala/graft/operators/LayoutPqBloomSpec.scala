package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the round-11 layout/compression/prefilter
  * operators — value-level cross-engine agreement is the DuckDB oracle's
  * job (all three are hash-oracled); these pin the properties the
  * operators exist FOR:
  *
  *   - `zorder_layout`: the pruning guarantee — every equal-z-range file's
  *     bounding box spans a bounded fraction of BOTH dimensions (a sorted
  *     layout gives 1/64 on one dimension and ~1 on the other; the
  *     z-curve's promise is ~1/8 on each).
  *   - `ann_pq_adc`: codebook self-consistency — a vector that IS a
  *     codeword sample must encode to itself (its subspace distance is
  *     algebraically zero), and every code must be a valid codeword id.
  *   - `bloom_decontaminate`: the two-phase contract — zero false
  *     negatives (bloom-rejected grams are never true hits) and real
  *     rejection (the prefilter passes only a fraction of clean grams).
  */
class LayoutPqBloomSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("layout-pq-bloom-spec")
    .getOrCreate()

  test("zorder files bound the span of BOTH dimensions") {
    val rows = LayoutQueries.zorderLayout(spark, dir)
      .select("file_id", "cnt", "pk_span_frac", "sk_span_frac").collect()
    assert(rows.nonEmpty)
    // 64 files fix 3 high bits per dimension → ideal span 1/8 = 0.125;
    // allow bucket-edge + sparse-file slack. The point is NO file spans
    // anything near a whole dimension.
    rows.foreach { r =>
      assert(r.getDouble(2) <= 0.30,
        s"file ${r.getLong(0)} pk span ${r.getDouble(2)} breaks the z-bound")
      assert(r.getDouble(3) <= 0.30,
        s"file ${r.getLong(0)} sk span ${r.getDouble(3)} breaks the z-bound")
    }
    // partition of the table: file stats must add back up to the scan
    val total = rows.map(_.getLong(1)).sum
    val n = graft.core.Tables(spark, dir, "lineitem").count()
    assert(total == n, s"file cnts sum $total != lineitem rows $n")
  }

  test("pq codeword samples encode to themselves") {
    // the REAL encode path (IvfQueries.pqCodes): a vector whose
    // subvectors ARE the codewords has per-subspace distance exactly 0
    // (sq − 2·sq + sq folds to 0.0 in IEEE arithmetic), and the
    // min-struct tie-break keeps the smallest codeword id — so every
    // sample must encode to its own id in every subspace
    val wrong = IvfQueries.pqCodes(spark, dir)
      .filter(col("vec_id") < 16 && col("code") =!= col("vec_id"))
      .count()
    assert(wrong == 0L, s"$wrong codeword-sample subspaces mis-encoded")

    val out = IvfQueries.annPqAdc(spark, dir)
    val n = out.count()
    assert(n == 50, s"5 queries x top-10 expected, got $n")
    // ranks are exactly 1..10 per query
    val bad = out.groupBy("query_id")
      .agg(count(lit(1)).as("k"), min("rank").as("lo"), max("rank").as("hi"))
      .filter(col("k") =!= 10 || col("lo") =!= 1 || col("hi") =!= 10)
      .count()
    assert(bad == 0L, "per-query top-10 rank sequence broken")
    // ADC distances are finite and non-negative-ish (algebraic |a-b|^2
    // can dip a hair below zero in FP; bound the dip)
    val neg = out.filter(col("adc_dist") < -1e-6).count()
    assert(neg == 0L, "ADC produced a materially negative distance")
  }

  test("streaming decontamination equals the batch relation bit-for-bit") {
    val stream = BloomQueries.streamDecontaminate(spark, dir).collect()
      .map(_.toSeq).toSet
    val batch = TextQueries.textDecontaminate(spark, dir).collect()
      .map(_.toSeq).toSet
    assert(stream == batch,
      s"stream/batch diverge: ${(stream diff batch).take(3)} vs " +
        s"${(batch diff stream).take(3)}")
  }

  test("bloom prefilter: zero false negatives, real rejection") {
    val r = BloomQueries.bloomStats(spark, dir).collect().head
    val (nGrams, nBloomPos, nTrueHit, nFalseNeg) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nFalseNeg == 0L, "bloom rejected a true benchmark hit")
    assert(nBloomPos >= nTrueHit)
    // the right prefilter metric is the false-positive rate among CLEAN
    // grams (true hits must pass by definition): 1% target, 5x slack
    val fpRate = (nBloomPos - nTrueHit).toDouble /
      math.max(nGrams - nTrueHit, 1L)
    assert(fpRate <= 0.05,
      s"bloom fp rate $fpRate over clean grams — sketch mis-sized")
  }
}
