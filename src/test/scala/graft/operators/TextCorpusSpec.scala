package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan + invariant gates for the corpus-level training-data operators.
  * Value-level correctness is the DuckDB oracle's job (text_vocab_oov /
  * text_token_budget_sample are hash-compared by the driver); these pin
  * the SHAPES that make the operators 100 TB-viable — the vocab
  * membership join must be a broadcast, the top-K must not be a global
  * sort, the budget sampler must hold its selection invariants.
  */
class TextCorpusSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("text-corpus-spec")
    .getOrCreate()

  test("vocab membership is a broadcast join; top-K is TakeOrdered") {
    val df = TextCorpusQueries.textVocabOov(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the 50-row vocab must broadcast — a shuffle join here would
    // reshuffle the whole token-shaped side for a K-row lookup
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab membership join is not broadcast:\n$plan")
    // top-K must be TakeOrderedAndProject (per-partition heaps), never
    // a global Sort + Limit over every distinct word
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-K is not TakeOrdered:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // oov_rate is a fraction of occurrences: bounded, and consistent
    // with its own numerator/denominator on every row
    rows.foreach { r =>
      val n = r.getAs[Long]("n_words")
      val oov = r.getAs[Long]("n_oov")
      val rate = r.getAs[Double]("oov_rate")
      assert(n > 0 && oov >= 0 && oov <= n, s"bad counts: $r")
      assert(math.abs(rate - oov.toDouble / n) < 1e-6, s"rate off: $r")
    }
  }

  test("token-budget sampler: per-source invariants hold") {
    val rows = TextCorpusQueries.textTokenBudgetSample(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("n_docs_total")
      val kept = r.getAs[Long]("n_docs_kept")
      val tokens = r.getAs[Long]("n_tokens_kept")
      // start-offset convention: every non-empty source keeps its first
      // document (offset 0 < budget), and never more than it has
      assert(kept >= 1 && kept <= total, s"kept out of range: $r")
      assert(tokens > 0, s"kept docs but no tokens: $r")
    }
    // the budget binds somewhere at this SF: not every source keeps
    // everything (otherwise the query degenerates to a count)
    assert(rows.exists(r =>
      r.getAs[Long]("n_docs_kept") < r.getAs[Long]("n_docs_total")),
      "budget never bound — raise SF or lower budget")
  }

  test("mixture rebalancer: downsample-only toward the median target") {
    val rows = TextCorpusQueries.corpusMixRebalance(spark, dir)
      .select("source", "n_tokens_total", "target_tokens",
        "n_docs", "n_docs_kept", "n_tokens_kept", "realized_frac")
      .collect()
    assert(rows.nonEmpty)
    val target = rows.head.getAs[Long]("target_tokens")
    assert(rows.forall(_.getAs[Long]("target_tokens") == target),
      "target must be one corpus-level scalar")
    rows.foreach { r =>
      val (total, kept) = (r.getAs[Long]("n_tokens_total"),
        r.getAs[Long]("n_tokens_kept"))
      assert(kept <= total, s"kept tokens exceed the source: $r")
      assert(r.getAs[Long]("n_docs_kept") <= r.getAs[Long]("n_docs"))
      val frac = r.getAs[Double]("realized_frac")
      assert(frac > 0.0 && frac <= 1.0)
      // an under-target source is never touched (downsample-only cap)
      if (total <= target)
        assert(kept == total, s"under-target source was sampled: $r")
    }
    // the rebalance binds somewhere at this SF, or the query degenerates
    assert(rows.exists(r => r.getAs[Long]("n_tokens_kept") <
      r.getAs[Long]("n_tokens_total")),
      "no source above target — fixture can't exercise the draw")
  }

  test("temperature mixer: geometric interpolation between keep-all and flat") {
    val temp = TextCorpusQueries.corpusMixTemperature(spark, dir)
      .select("source", "n_tokens_total", "target_tokens",
        "n_tokens_kept", "n_docs", "n_docs_kept")
      .collect()
    val flatRows = TextCorpusQueries.corpusMixRebalance(spark, dir)
      .select("source", "target_tokens", "n_tokens_kept").collect()
    val flat = flatRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(temp.nonEmpty)
    temp.foreach { r =>
      val (total, ts) = (r.getAs[Long]("n_tokens_total"),
        r.getAs[Long]("target_tokens"))
      val tMed = flat(r.getAs[String]("source"))
      // t_s = floor(sqrt(total * t_med)) sits BETWEEN the flat median
      // target and the source total (geometric mean property) — the
      // α=0.5 contract
      assert(ts >= math.min(total, tMed) && ts <= math.max(total, tMed),
        s"target escaped the interpolation interval: $r (t_med=$tMed)")
      assert(ts == math.floor(math.sqrt(
        total.toDouble * tMed.toDouble)).toLong, s"not the geometric mean: $r")
      // downsample-only: under-median sources keep everything
      if (total <= tMed)
        assert(r.getAs[Long]("n_tokens_kept") == total,
          s"under-median source was sampled: $r")
      assert(r.getAs[Long]("n_docs_kept") <= r.getAs[Long]("n_docs"))
    }
    // the temperature cap is SOFTER than the flat cap for over-median
    // sources: kept fraction under temperature >= kept under flat
    val flatKept = flatRows.map(r => r.getString(0) -> r.getLong(2)).toMap
    temp.foreach { r =>
      assert(r.getAs[Long]("n_tokens_kept") >=
        flatKept(r.getAs[String]("source")),
        s"temperature removed more than the flat cap: $r")
    }
  }

  test("sampler order is the md5 shuffle, not doc_id order") {
    import spark.implicits._
    // reconstruct the kept set for one source directly and check the
    // FIRST kept doc is the md5-least, not the smallest doc_id (guards
    // against an accidental orderBy(doc_id) regression making the
    // "sample" just a prefix)
    val d = graft.core.Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("source") === "src0")
      .select($"doc_id").as[Long].collect().sorted
    assert(d.length > 1, "fixture too small for the order check")
    val firstByMd5 = d.minBy(id =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    // only meaningful when the md5-least differs from the numeric least
    if (firstByMd5 != d.min) {
      val plan = TextCorpusQueries.textTokenBudgetSample(spark, dir)
        .queryExecution.analyzed.toString
      assert(plan.contains("md5"),
        s"sampler no longer orders by md5 hash:\n$plan")
    }
  }
}
