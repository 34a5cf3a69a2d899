package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the data-selection (DSIR / CCNet buckets /
  * Zipf / report card) and privacy-audit operators. Cross-engine value
  * agreement is the DuckDB oracle's job; these pin the DECISIONS on
  * designed fixtures where the right answer is known by construction. */
class DsirPrivacySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("dsir-privacy-spec")
    .getOrCreate()

  /** Full 5-column documents fixture (the real table's schema). */
  private def docsDir(
      rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dsir_spec").toString
    graft.core.TempDirs.cleanOnExit(java.nio.file.Paths.get(dir))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dsir_select: target-leaning docs score above and keep, raw-only below") {
    // en docs use a disjoint vocabulary from fr docs, so the en buckets
    // are target-heavy (lam > 0, pos votes) and the fr buckets have
    // c_t = 0 (lam < 0, no vote) — unless md5 buckets collide, which
    // this deterministic fixture realizes as: they don't.
    val rows = Seq(
      (0L, "alpha beta gamma alpha beta", "en", "s0", 0L),
      (1L, "alpha gamma beta beta alpha", "en", "s0", 0L),
      (2L, "omega psi chi omega psi", "fr", "s0", 0L),
      (3L, "chi psi omega omega chi", "fr", "s0", 0L))
    val dir = docsDir(rows)
    val out = DsirQueries.dsirSelect(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out(0L)._1 > 0.0 && out(1L)._1 > 0.0, "target docs score > 0")
    assert(out(2L)._1 < 0.0 && out(3L)._1 < 0.0, "raw-only docs score < 0")
    assert(out(0L)._2 && out(1L)._2, "target docs kept")
    assert(!out(2L)._2 && !out(3L)._2, "raw-only docs dropped")
  }

  test("ccnet_quality_buckets: familiarity terciles, head gets shared bigrams") {
    // d0-d2 share high-count bigrams (fam = (3*9 + 2*6)/5 = 7.8);
    // d3-d5 each carry one unique bigram (fam = 1). Terciles over 6
    // docs DESC fam, ties by doc_id: {d0,d1} {d2,d3} {d4,d5}.
    val rows = Seq(
      (0L, "p q p q p q", "en", "s0", 0L),
      (1L, "p q p q p q", "en", "s0", 0L),
      (2L, "p q p q p q", "en", "s0", 0L),
      (3L, "u v", "en", "s0", 0L),
      (4L, "w x", "en", "s0", 0L),
      (5L, "y z", "en", "s0", 0L))
    val dir = docsDir(rows)
    val out = DsirQueries.ccnetQualityBuckets(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out.values.map(_._1).toSeq.sorted == Seq(2L, 2L, 2L),
      "6 docs -> terciles of 2")
    assert(out(1L)._2 == 7.8, "head bucket avg_fam = (27+12)/5")
    assert(out(3L)._2 == 1.0, "tail bucket is the unique-bigram docs")
    assert(out(2L)._2 == (7.8 + 1.0) / 2,
      "middle straddles the tie broken by doc_id")
  }

  test("vocab_zipf_fit: exact slope -1 on a dyadic corpus; r2 NULL on constant freqs") {
    val rows = Seq(
      (0L, "a a a a b b", "en", "s0", 0L),  // freq 4,2 -> slope -1, r2 1
      (1L, "c c d d", "fr", "s0", 0L))      // constant freq -> r2 NULL
    val dir = docsDir(rows)
    val out = DsirQueries.vocabZipfFit(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("en").getLong(1) == 2L)
    assert(out("en").getDouble(2) == -1.0, "log2(2)-log2(4) over 1 rank step")
    assert(out("en").getDouble(3) == 2.0, "intercept = log2(4)")
    assert(out("en").getDouble(4) == 1.0, "perfect fit")
    assert(out("fr").getDouble(2) == 0.0, "zero covariance -> slope 0")
    assert(out("fr").isNullAt(4), "zero y-variance -> r2 undefined")
  }

  test("corpus_report_card: dup charged to both sources, counts exact") {
    val rows = Seq(
      (0L, "the cat sat", "en", "s0", 11L),
      (1L, "the cat sat", "en", "s1", 11L),  // cross-source exact dup
      (2L, "a dog ran far", "en", "s0", 13L),
      (3L, "unique es text", "es", "s1", 14L))
    val dir = docsDir(rows)
    val out = DsirQueries.corpusReportCard(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("s0").getLong(1) == 2L && out("s1").getLong(1) == 2L)
    assert(out("s0").getLong(2) == 7L, "3 + 4 tokens")
    assert(out("s0").getLong(3) == 7L, "all distinct words in s0")
    assert(out("s0").getLong(4) == 1L && out("s1").getLong(4) == 2L)
    assert(out("s0").getDouble(5) == 0.5 && out("s1").getDouble(5) == 0.5,
      "the shared text flags one doc in EACH source")
  }

  test("k_anonymity: k and l flags; stream twin == batch") {
    // QI (source, chars_bin): s1/bin0 has 5 docs 2 langs (safe);
    // s2/bin0 has 2 docs 1 lang (k_risk AND l_risk);
    // s1/bin100 has 1 doc (k_risk, l_risk)
    val rows =
      (0L until 5L).map(i =>
        (i, "t", if (i < 3) "en" else "fr", "s1", 10L + i)) ++
      Seq((10L, "t", "en", "s2", 50L), (11L, "t", "en", "s2", 60L),
        (12L, "t", "zh", "s1", 150L))
    val dir = docsDir(rows)
    val out = PrivacyQueries.kAnonymity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(out(("s1", 0L)) == ((5L, 2L, false, false)))
    assert(out(("s2", 0L)) == ((2L, 1L, true, true)))
    assert(out(("s1", 100L)) == ((1L, 1L, true, true)))
    val streamed = PrivacyQueries.streamKAnonymity(spark, dir).collect()
    val batch = PrivacyQueries.kAnonymity(spark, dir).collect()
    assert(streamed.map(_.toString).sorted
      .sameElements(batch.map(_.toString).sorted), "stream == batch")
  }
}
