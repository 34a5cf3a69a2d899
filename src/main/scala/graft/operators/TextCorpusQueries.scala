package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-level training-data operators over `documents` — the two-pass
  * shapes a pretraining loader runs ahead of tokenization: build a
  * corpus artifact (vocabulary / per-source budget), then apply it back
  * to every document. Both passes stay distributed: the corpus artifact
  * is either top-K-small (broadcast) or a per-partition window — never a
  * driver-side collect.
  *
  * Reference scope note: the reference has no corpus pass at all (its
  * unit of work is one bioproject, old/mwas_rfam.py:214-260); these are
  * the engine-native extensions the build plan calls for alongside the
  * dedup/quality suite.
  */
object TextCorpusQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private val words = split(col("text"), " ")

  /** Vocabulary build + per-document OOV rate.
    *
    * Pass 1 aggregates (doc_id, word) counts — the combiner collapses
    * the token stream before any shuffle — then reduces to the corpus
    * top-50 by total count (ties broken by word, so the cutoff is total
    * and both engines pick the identical vocabulary). Pass 2 is a
    * BROADCAST left join of the per-doc counts against the 50-row
    * vocab: the token-shaped side never reshuffles for membership.
    * oov_rate is one IEEE division of exact integers — identical double
    * on both engines (the `Q` class in NOTES_r8, no drifting-sum
    * amplification), then round(·,6).
    *
    * At 100 TB: word counts are the canonical map-side-combine agg; the
    * vocab stays K rows regardless of corpus size; the join back is a
    * broadcast, so cost is one shuffle of (doc_id, word) pairs. */
  def textVocabOov(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(words).as("w"))
    // a vocab+apply op is inherently two passes over the token stream
    // (the artifact must exist before it can be applied); each branch
    // gets its natural aggregation key so neither pays for the other's
    val vocab = toks
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(50)
      .select(col("w"), lit(1).as("in_vocab"))
    val perDocWord = toks
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
    perDocWord
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_words"),
        sum(when(col("in_vocab").isNull, col("c")).otherwise(0L))
          .as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_words"), 6))
      .orderBy(col("doc_id"))
  }

  val textVocabOovSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |dw AS (
      |  SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
      |vocab AS (
      |  SELECT w FROM (
      |    SELECT w, sum(c) AS cnt FROM dw GROUP BY 1)
      |  ORDER BY cnt DESC, w LIMIT 50)
      |SELECT d.doc_id,
      |       CAST(sum(d.c) AS BIGINT) AS n_words,
      |       CAST(sum(CASE WHEN v.w IS NULL THEN d.c ELSE 0 END)
      |         AS BIGINT) AS n_oov,
      |       round(CAST(sum(CASE WHEN v.w IS NULL THEN d.c ELSE 0 END)
      |           AS DOUBLE) / sum(d.c), 6) AS oov_rate
      |FROM dw d LEFT JOIN vocab v ON d.w = v.w
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Token-budget mixture sampling: per source, take documents in a
    * deterministic pseudo-random order (md5 of doc_id — both engines
    * produce the identical hex, so the "shuffle" is reproducible on any
    * cluster) until the source's token budget is spent. A document may
    * straddle the boundary (kept iff its START offset is inside the
    * budget — same convention as textPackSequences), so every source
    * with any data contributes at least one document.
    *
    * This is the loader-side mixture op: cap each domain at a token
    * budget instead of a document count, so verbose domains can't
    * swamp the mix. The running offset is a window per source — the
    * packing-shard story from textPackSequences applies unchanged at
    * 100 TB (skewed sources get salted into sub-shards that sample
    * independently). */
  def textTokenBudgetSample(s: SparkSession, dir: String): DataFrame = {
    val budget = 1000L
    val bySrc = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    docs(s, dir)
      .select(col("source"), col("doc_id"),
        size(words).cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(
          bySrc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs_total"),
        sum(when(col("start_off") < budget, 1L).otherwise(0L))
          .as("n_docs_kept"),
        sum(when(col("start_off") < budget, col("n_tokens"))
          .otherwise(0L)).as("n_tokens_kept"))
      .orderBy(col("source"))
  }

  val textTokenBudgetSampleSql: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents),
      |o AS (
      |  SELECT source, doc_id, n_tokens,
      |         coalesce(sum(n_tokens) OVER (PARTITION BY source
      |           ORDER BY h, doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS start_off
      |  FROM t)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_docs_total,
      |       CAST(sum(CASE WHEN start_off < 1000 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_docs_kept,
      |       CAST(sum(CASE WHEN start_off < 1000 THEN n_tokens ELSE 0 END)
      |         AS BIGINT) AS n_tokens_kept
      |FROM o GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-source distribution drift vs the corpus — the mixture monitor a
    * multi-source pretraining pipeline runs continuously: when one
    * source's unigram distribution drifts (a crawler picks up a new
    * template, a source flips language), its KL against the corpus
    * moves before any downstream metric does.
    *
    * KL is computed over a FIXED support (the corpus top-200 words, ties
    * broken by word so both engines pick the identical set) with add-one
    * smoothing, which (a) makes it finite and cross-source comparable,
    * (b) bounds per-source work at O(K) regardless of vocab size, and
    * (c) keeps the whole reduction deterministic arithmetic over exact
    * integer counts — the only float work is K log-terms summed per
    * source, then round(·,6) (driftaudit-checked like every rounded
    * column). Plan shape: one map-side-combined (source, word) count
    * shuffle, a K-row broadcast of the support, and a |sources|×K
    * aggregate — at 100 TB the token count shuffle is the only
    * corpus-scale term, identical to [[textVocabOov]]'s pass 1. */
  def textDistDrift(s: SparkSession, dir: String): DataFrame =
    distDriftFrom(srcWordCounts(docs(s, dir)))

  /** Per-(source, word) counts — vocabulary-sized, mergeable by sum:
    * the streaming drift monitor's entire state
    * ([[StreamingDriftQueries]]). */
  private[operators] def srcWordCounts(d: DataFrame): DataFrame =
    d.select(col("source"), explode(words).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))

  /** KL readout from the count relation alone: totals and the support
    * set are its own row-sums, so no pass over raw text. */
  private[operators] def distDriftFrom(srcCounts: DataFrame): DataFrame = {
    val k = 200
    val support = srcCounts.groupBy(col("w"))
      .agg(sum(col("c")).as("cg"))
      .orderBy(col("cg").desc, col("w")).limit(k)
    val globTotal = srcCounts.groupBy().agg(sum(col("c")).as("ng"))
    val srcTotal = srcCounts.groupBy(col("source"))
      .agg(sum(col("c")).as("ns"))
    // sources × support grid (both tiny), then the observed counts
    val grid = srcTotal.crossJoin(broadcast(support))
      .join(srcCounts, Seq("source", "w"), "left")
      .na.fill(Map("c" -> 0L))
      .crossJoin(broadcast(globTotal))
    grid
      .withColumn("ps",
        (col("c") + lit(1.0)) / (col("ns") + lit(k.toDouble)))
      .withColumn("pg",
        (col("cg") + lit(1.0)) / (col("ng") + lit(k.toDouble)))
      .groupBy(col("source"))
      .agg(max(col("ns")).cast("long").as("n_tokens"),
        sum(when(col("c") > 0, 1L).otherwise(0L)).as("support_hit"),
        round(sum(col("ps") * log(col("ps") / col("pg"))), 6)
          .as("kl_vs_corpus"))
      .orderBy(col("source"))
  }

  val textDistDriftSql: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |sc AS (SELECT source, w, count(*) AS c FROM toks GROUP BY 1, 2),
      |support AS (
      |  SELECT w, sum(c) AS cg FROM sc GROUP BY 1
      |  ORDER BY sum(c) DESC, w LIMIT 200),
      |gt AS (SELECT count(*) AS ng FROM toks),
      |st AS (SELECT source, count(*) AS ns FROM toks GROUP BY 1),
      |grid AS (
      |  SELECT st.source, st.ns, s.w, s.cg, coalesce(sc.c, 0) AS c, gt.ng
      |  FROM st CROSS JOIN support s
      |  LEFT JOIN sc ON sc.source = st.source AND sc.w = s.w
      |  CROSS JOIN gt)
      |SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
      |       CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS support_hit,
      |       round(sum(((c + 1.0) / (ns + 200.0)) *
      |         ln(((c + 1.0) / (ns + 200.0)) /
      |            ((cg + 1.0) / (ng + 200.0)))), 6) AS kl_vs_corpus
      |FROM grid GROUP BY source ORDER BY source""".stripMargin

  /** Vocabulary coverage curve — the tokenizer-design artifact: "what
    * fraction of the token stream does a vocab of size K cover?",
    * sampled at the standard size checkpoints. Words ranked by (count
    * desc, word) so the curve is total-order deterministic; coverage is
    * a cumulative-sum window over exact integer counts divided by the
    * exact total (one IEEE division, identical both engines).
    *
    * Shape: one map-side-combined word-count shuffle, then window +
    * filter over the VOCABULARY-sized relation (never the token
    * stream) — the curve costs the same as the word count at any
    * corpus size. */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val checkpoints = Seq(1, 2, 5, 10, 20, 50, 100, 200, 500, 1000)
    val counts = docs(s, dir)
      .select(explode(words).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("word"))
    val cum = Window.orderBy(col("cnt").desc, col("word"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("vocab_size", row_number().over(w))
      .withColumn("cum_cnt", sum(col("cnt")).over(cum))
      .filter(col("vocab_size")
        .isin(checkpoints.map(_.asInstanceOf[Any]): _*))
      // scalar-1-row total — broadcast cross join, the tf-idf precedent
      .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("total"))))
      .select(col("vocab_size"), col("word").as("boundary_word"),
        col("cum_cnt"),
        (col("cum_cnt").cast("double") / col("total"))
          .as("coverage"))
      .orderBy(col("vocab_size"))
  }

  val vocabCoverageSql: String =
    """WITH c AS (
      |  SELECT w AS word, count(*) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1),
      |r AS (
      |  SELECT word, cnt,
      |         CAST(row_number() OVER (ORDER BY cnt DESC, word) AS INT)
      |           AS vocab_size,
      |         sum(cnt) OVER (ORDER BY cnt DESC, word
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS cum_cnt
      |  FROM c)
      |SELECT vocab_size, word AS boundary_word,
      |       CAST(cum_cnt AS BIGINT) AS cum_cnt,
      |       CAST(cum_cnt AS DOUBLE) / (SELECT sum(cnt) FROM c)
      |         AS coverage
      |FROM r
      |WHERE vocab_size IN (1, 2, 5, 10, 20, 50, 100, 200, 500, 1000)
      |ORDER BY vocab_size""".stripMargin

  /** Mixture rebalancer — the "data mixing weights" op of a multi-source
    * pretraining corpus: downsample every source toward a common token
    * target (here the FLOOR of the median source's total — a
    * data-derived balance point; production passes explicit weights,
    * same plan) with a deterministic per-doc hash draw, so two cluster
    * runs — and both engines — keep the identical document set.
    *
    * The keep rule is ALL int64: doc survives iff
    * `bucket(doc_id, 10⁶) · n_tokens_total < target · 10⁶` — equivalent
    * to a uniform draw < target/total but with no float boundary to
    * straddle cross-engine, and an under-target source keeps everything
    * (the inequality is vacuously true), so the cap is downsample-only
    * by construction. Overflow headroom: bucket < 10⁶ and target ≤
    * total, so both products stay under 10⁶·total — safe through
    * ~9·10¹² tokens per source in int64; past that, scale the bucket
    * modulus down.
    *
    * Plan shape: the doc relation folds into a per-(source, hash-bucket)
    * HISTOGRAM first (map-side-combined; ≤ |sources|·10⁶ rows no matter
    * the corpus size) — the keep rule only reads (source, bucket), so
    * every decision downstream of the histogram is exact. Stats are a
    * |sources|-row broadcast + one scalar broadcast back onto the
    * histogram, then one final (source) aggregate. The histogram is also
    * the MERGEABLE state of the streaming twin
    * ([[StreamingMixQueries]]): counters sum across batches, and the
    * readout replays literally this code path. */
  def corpusMixRebalance(s: SparkSession, dir: String): DataFrame =
    mixReadout(mixHist(mixBase(s, dir)))

  /** (source, doc_id, n_tokens) — the rebalancer's input projection. */
  private[operators] def mixBase(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("source"), col("doc_id"),
      size(words).cast("long").as("n_tokens"))

  /** Per-(source, hash-bucket) counters — algebraic, so partials from
    * independent batches merge by plain sums. */
  private[operators] def mixHist(base: DataFrame): DataFrame =
    base
      .withColumn("bkt",
        graft.functions.PortableHash.bucket(col("doc_id"), 1000000))
      .groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("n_docs_b"),
        sum(col("n_tokens")).as("n_tokens_b"))

  /** Target derivation + keep decision over the histogram. The int64 keep
    * rule depends only on (bucket, source totals), so bucket-grouped
    * counters lose nothing. */
  private[operators] def mixReadout(hist: DataFrame): DataFrame = {
    val stats = hist.groupBy(col("source"))
      .agg(sum(col("n_tokens_b")).as("n_tokens_total"))
    val target = stats.agg(
      floor(percentile(col("n_tokens_total"), lit(0.5)))
        .cast("long").as("t"))
    hist
      .join(broadcast(stats), Seq("source"))
      .crossJoin(broadcast(target))
      .withColumn("keep",
        col("bkt") * col("n_tokens_total") < col("t") * lit(1000000L))
      .groupBy(col("source"))
      .agg(sum(col("n_docs_b")).as("n_docs"),
        sum(col("n_tokens_b")).as("n_tokens_total"),
        max(col("t")).as("target_tokens"),
        sum(when(col("keep"), col("n_docs_b")).otherwise(0L))
          .as("n_docs_kept"),
        sum(when(col("keep"), col("n_tokens_b")).otherwise(0L))
          .as("n_tokens_kept"))
      .withColumn("realized_frac",
        round(col("n_tokens_kept").cast("double") /
          col("n_tokens_total").cast("double"), 6))
      .orderBy(col("source"))
  }

  /** Temperature-weighted mixture (UniMax/DoReMi family, α = 0.5): the
    * per-source token target interpolates geometrically between "keep
    * everything" (α = 1, t = total) and "flatten to the median" (α = 0,
    * t = t_med): t_s = floor(√(total_s · t_med)) — over-represented
    * sources shrink toward the median, under-median sources keep all
    * (the int64 keep rule is vacuously true when t_s > total_s, so the
    * cap stays downsample-only by construction).
    *
    * Cross-engine exactness: t_s is per-ROW arithmetic on two int64
    * aggregates (exact ≤ 2⁵³ tokens/source) through IEEE
    * correctly-rounded sqrt — no float SUM anywhere, so no
    * accumulation-order hazard. Shares [[mixHist]] with the rebalancer:
    * same sufficient-statistic state, same scale posture. */
  def corpusMixTemperature(s: SparkSession, dir: String): DataFrame =
    mixTempReadout(mixHist(mixBase(s, dir)))

  private[operators] def mixTempReadout(hist: DataFrame): DataFrame = {
    val stats = hist.groupBy(col("source"))
      .agg(sum(col("n_tokens_b")).as("n_tokens_total"))
    val tmed = stats.agg(
      floor(percentile(col("n_tokens_total"), lit(0.5)))
        .cast("long").as("t_med"))
    hist
      .join(broadcast(stats), Seq("source"))
      .crossJoin(broadcast(tmed))
      .withColumn("t_s",
        floor(sqrt(col("n_tokens_total").cast("double") *
          col("t_med").cast("double"))).cast("long"))
      .withColumn("keep",
        col("bkt") * col("n_tokens_total") < col("t_s") * lit(1000000L))
      .groupBy(col("source"))
      .agg(sum(col("n_docs_b")).as("n_docs"),
        sum(col("n_tokens_b")).as("n_tokens_total"),
        max(col("t_s")).as("target_tokens"),
        sum(when(col("keep"), col("n_docs_b")).otherwise(0L))
          .as("n_docs_kept"),
        sum(when(col("keep"), col("n_tokens_b")).otherwise(0L))
          .as("n_tokens_kept"))
      .withColumn("realized_frac",
        round(col("n_tokens_kept").cast("double") /
          col("n_tokens_total").cast("double"), 6))
      .orderBy(col("source"))
  }

  val corpusMixTemperatureSql: String =
    """WITH base AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |           AS BIGINT) % 1000000 AS bkt
      |  FROM documents),
      |stats AS (SELECT source, CAST(sum(n_tokens) AS BIGINT)
      |            AS n_tokens_total
      |          FROM base GROUP BY 1),
      |tgt AS (SELECT CAST(floor(quantile_cont(n_tokens_total, 0.5))
      |          AS BIGINT) AS t_med FROM stats),
      |ts AS (SELECT st.source, st.n_tokens_total,
      |         CAST(floor(sqrt(CAST(st.n_tokens_total AS DOUBLE)
      |           * CAST(tgt.t_med AS DOUBLE))) AS BIGINT) AS t_s
      |       FROM stats st CROSS JOIN tgt)
      |SELECT b.source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(b.n_tokens) AS BIGINT) AS n_tokens_total,
      |  CAST(max(ts.t_s) AS BIGINT) AS target_tokens,
      |  CAST(sum(CASE WHEN b.bkt * ts.n_tokens_total < ts.t_s * 1000000
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
      |  CAST(sum(CASE WHEN b.bkt * ts.n_tokens_total < ts.t_s * 1000000
      |    THEN b.n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept,
      |  round(CAST(sum(CASE WHEN b.bkt * ts.n_tokens_total
      |      < ts.t_s * 1000000 THEN b.n_tokens ELSE 0 END) AS DOUBLE)
      |    / sum(b.n_tokens), 6) AS realized_frac
      |FROM base b JOIN ts USING (source)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val corpusMixRebalanceSql: String =
    """WITH base AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |           AS BIGINT) % 1000000 AS bkt
      |  FROM documents),
      |stats AS (SELECT source, CAST(sum(n_tokens) AS BIGINT)
      |            AS n_tokens_total
      |          FROM base GROUP BY 1),
      |tgt AS (SELECT CAST(floor(quantile_cont(n_tokens_total, 0.5))
      |          AS BIGINT) AS t FROM stats)
      |SELECT b.source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(b.n_tokens) AS BIGINT) AS n_tokens_total,
      |  CAST(max(tgt.t) AS BIGINT) AS target_tokens,
      |  CAST(sum(CASE WHEN b.bkt * st.n_tokens_total < tgt.t * 1000000
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
      |  CAST(sum(CASE WHEN b.bkt * st.n_tokens_total < tgt.t * 1000000
      |    THEN b.n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept,
      |  round(CAST(sum(CASE WHEN b.bkt * st.n_tokens_total
      |      < tgt.t * 1000000 THEN b.n_tokens ELSE 0 END) AS DOUBLE)
      |    / sum(b.n_tokens), 6) AS realized_frac
      |FROM base b JOIN stats st USING (source) CROSS JOIN tgt
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("text_vocab_oov", textVocabOov _, Some(textVocabOovSql)),
      ("text_token_budget_sample", textTokenBudgetSample _,
        Some(textTokenBudgetSampleSql)),
      ("text_dist_drift", textDistDrift _, Some(textDistDriftSql)),
      ("corpus_mix_rebalance", corpusMixRebalance _,
        Some(corpusMixRebalanceSql)),
      ("corpus_mix_temperature", corpusMixTemperature _,
        Some(corpusMixTemperatureSql)),
      ("vocab_coverage", vocabCoverage _, Some(vocabCoverageSql)))
}
