package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Model-grade quality signals over `documents`, deepening the heuristic
  * suite of [[TextQueries]]:
  *   - text_entropy: the information-theoretic repetition signal — word
  *     distribution Shannon entropy per document (gibberish and
  *     keyword-stuffed spam sit at the two extremes heuristic ratios
  *     miss).
  *   - quality_logreg: a FROZEN linear classifier over the heuristic
  *     features — the production shape of a fastText-style quality
  *     filter: the model ships as constants, application is one
  *     codegen'd expression per row, no shuffle beyond the feature
  *     derivation it shares with `text_quality`.
  *
  * Both are narrow per-doc pipelines: one explode + map-side-combined
  * aggregate, then per-row arithmetic. At 100 TB each is a single
  * token-grain shuffle (the same grain the rest of the text suite pays).
  */
object QualityModelQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private val words = split(col("text"), " ")

  // ----------------------------------------- Q1: word-distribution entropy

  /** Shannon entropy of the per-doc word distribution,
    * H = log2(n) − (Σ c·log2 c)/n, plus the normalized form H/log2(k)
    * (k = distinct words; 1.0 = uniform usage, 0.0 = one word repeated).
    * Single-word-type docs pin norm_entropy to 0 by convention (the
    * distribution IS degenerate). */
  def textEntropy(s: SparkSession, dir: String): DataFrame = {
    val counts = docs(s, dir)
      .select(col("doc_id"), explode(words).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
    val n = col("n_words").cast("double")
    val h = log2(n) - col("clogc") / n
    counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        sum(col("c").cast("double") * log2(col("c").cast("double")))
          .as("clogc"))
      .select(col("doc_id"),
        col("n_words").cast("long").as("n_words"),
        col("n_distinct").cast("long").as("n_distinct"),
        round(h, 6).as("word_entropy"),
        round(when(col("n_distinct") > 1,
          h / log2(col("n_distinct").cast("double"))).otherwise(0.0), 6)
          .as("norm_entropy"))
      .orderBy(col("doc_id"))
  }

  val textEntropySql: String =
    """WITH c AS (
      |  SELECT doc_id, w, count(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |    FROM documents)
      |  WHERE len(w) > 0 GROUP BY 1, 2),
      |a AS (
      |  SELECT doc_id,
      |    CAST(sum(c) AS DOUBLE) AS n,
      |    count(*) AS k,
      |    sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clogc
      |  FROM c GROUP BY 1)
      |SELECT doc_id,
      |  CAST(n AS BIGINT) AS n_words,
      |  CAST(k AS BIGINT) AS n_distinct,
      |  round(log2(n) - clogc / n, 6) AS word_entropy,
      |  round(CASE WHEN k > 1
      |    THEN (log2(n) - clogc / n) / log2(CAST(k AS DOUBLE))
      |    ELSE 0.0 END, 6) AS norm_entropy
      |FROM a ORDER BY doc_id""".stripMargin

  // --------------------------------------------- Q2: frozen linear filter

  /** The pinned model: logit = b + w·x over the `text_quality` feature
    * vector. Constants are the model artifact — production swaps them
    * per trained release; the plan is identical. */
  private val B = -1.0
  private val wLen = 2.0   // least(n_words/200, 1)
  private val wStop = 2.5  // stopword ratio
  private val wPunct = -4.0
  private val wUpper = -2.0

  /** Frozen-weight logistic quality classifier: shares the feature
    * arithmetic (and its DuckDB formulations) with [[TextQueries]]'s
    * `text_quality`, then applies the pinned linear model per row.
    * `keep` is the decision at logit > 0; `prob` is the calibrated
    * sigmoid (round-6; the one transcendental, same cross-engine
    * posture as `text_lm_score`'s log/exp). */
  def qualityLogreg(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // the literal feature definitions live in TextQueries (one source —
    // the classifier can never drift from what text_quality reports)
    val stopCounts = TextQueries.stopCountRel(d)
    val nChars = length(col("text")).cast("double")
    val nWords = size(words).cast("double")
    val punctRatio = (nChars -
      length(regexp_replace(col("text"), TextQueries.PunctClass, ""))
        .cast("double")) / nChars
    val upperRatio = (nChars -
      length(regexp_replace(col("text"), "[A-Z]", "")).cast("double")) /
      nChars
    val logit = lit(B) +
      least(nWords / lit(200.0), lit(1.0)) * wLen +
      (col("stop_cnt_l").cast("double") / nWords) * wStop +
      punctRatio * wPunct + upperRatio * wUpper
    d.join(stopCounts, Seq("doc_id"))
      .select(col("doc_id"),
        round(logit, 6).as("logit"),
        round(lit(1.0) / (lit(1.0) + exp(-logit)), 6).as("prob"),
        (logit > 0.0).as("keep"))
      .orderBy(col("doc_id"))
  }

  val qualityLogregSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS DOUBLE) AS n_chars,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w IN
      |      ('the','a','and','of','to','in','is','it','that','for')))
      |      AS DOUBLE) AS stop_cnt,
      |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?()-]',
      |      '', 'g')) AS DOUBLE) AS punct_cnt,
      |    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
      |      AS DOUBLE) AS upper_cnt
      |  FROM documents),
      |l AS (
      |  SELECT doc_id,
      |    -1.0 + least(n_words / 200.0, 1.0) * 2.0
      |      + (stop_cnt / n_words) * 2.5
      |      + (punct_cnt / n_chars) * -4.0
      |      + (upper_cnt / n_chars) * -2.0 AS logit
      |  FROM f)
      |SELECT doc_id, round(logit, 6) AS logit,
      |  round(1.0 / (1.0 + exp(-logit)), 6) AS prob,
      |  logit > 0.0 AS keep
      |FROM l ORDER BY doc_id""".stripMargin

  // ------------------------------------------ Q3: Gopher rule battery

  /** The Gopher stopword list (Rae et al. 2021, table A1) — distinct
    * from TextQueries' ratio list on purpose: the rule is "contains ≥2
    * of these 8", not a density. */
  private val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher repetition-free quality rules (Rae et al. 2021, §A1.1),
    * each emitted as its own flag plus the conjunctive keep decision:
    * word count in [50, 100k]; mean word length in [3, 10]; symbol-to-
    * word ratio ('#' and '...') ≤ 0.1; ≤90% of lines bullet-led; ≤30% of
    * lines ellipsis-ended; ≥80% of words contain a letter; ≥2 distinct
    * Gopher stopwords.
    *
    * Every threshold is evaluated as a CROSS-MULTIPLIED integer
    * comparison (3·n_words ≤ chars, 10·n_sym ≤ n_words, …) — no float
    * ratio ever crosses an engine boundary, so the keep decision is
    * bit-identical cross-engine by construction. The stopword rule needs
    * no count-distinct: 8 max-flags summed (the DistinctGate posture).
    * Plan: doc-grain line/symbol metrics ride the grouping keys through
    * the one word-grain aggregate — functionally dependent on doc_id, so
    * map-side combine still collapses per doc and there is ONE corpus
    * scan, no join-back. Measured flat: 1.10 s at sf0.1 → 1.42 s at the
    * 30× document fixture (the aggregate is token-grain map-side work;
    * the regexes run once per doc — see the projection note below). */
  def qualityGopher(s: SparkSession, dir: String): DataFrame = {
    val text = col("text")
    val nLines = size(split(text, "\n"))
    val nBullet = regexp_count(text, lit("(^|\n)(-|\\*)"))
    val nEllipsisLn = regexp_count(text, lit("\\.\\.\\.(\n|$)"))
    // `div`, not `/`: keeps n_sym integral (exact — the length delta is
    // a multiple of 3) so the grouping key below needs no float
    // normalization and the rule comparison stays all-integer
    val nSym = (length(text) - length(translate(text, "#", ""))) +
      expr("(length(text) - length(replace(text, '...', ''))) div 3")
    val perDoc = docs(s, dir)
      // the doc-grain metrics MUST materialize in their own projection
      // below the explode: fused into the same select, the split
      // Project lands ABOVE the Generate and every regex runs once per
      // TOKEN instead of once per doc (~n_words× the regex work —
      // caught in the plan snapshot)
      .select(col("doc_id"), text, nLines.as("n_lines"),
        nBullet.as("n_bullet"), nEllipsisLn.as("n_ell"), nSym.as("n_sym"))
      .select(col("doc_id"), col("n_lines"), col("n_bullet"),
        col("n_ell"), col("n_sym"), explode(words).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("n_lines"), col("n_bullet"),
        col("n_ell"), col("n_sym"))
      .agg(count(lit(1)).as("n_words"),
        (Seq(sum(length(col("w"))).as("chars"),
          count(when(col("w").rlike("[A-Za-z]"), 1)).as("n_alpha")) ++
          GopherStops.zipWithIndex.map { case (st, i) =>
            max(when(col("w") === st, 1).otherwise(0)).as(s"s$i")
          }): _*)
    val nStop = GopherStops.indices.map(i => col(s"s$i")).reduce(_ + _)
    perDoc.select(col("doc_id"),
        col("n_words").cast("long").as("n_words"),
        (col("n_words") >= 50 && col("n_words") <= 100000).as("r_wordcount"),
        (lit(3) * col("n_words") <= col("chars") &&
          col("chars") <= lit(10) * col("n_words")).as("r_meanwordlen"),
        (lit(10) * col("n_sym") <= col("n_words")).as("r_symbolratio"),
        (lit(10) * col("n_bullet") <= lit(9) * col("n_lines"))
          .as("r_bulletlines"),
        (lit(10) * col("n_ell") <= lit(3) * col("n_lines"))
          .as("r_ellipsislines"),
        (lit(5) * col("n_alpha") >= lit(4) * col("n_words")).as("r_alphawords"),
        (nStop >= 2).as("r_stopwords"))
      .withColumn("keep",
        col("r_wordcount") && col("r_meanwordlen") && col("r_symbolratio") &&
          col("r_bulletlines") && col("r_ellipsislines") &&
          col("r_alphawords") && col("r_stopwords"))
      .orderBy(col("doc_id"))
  }

  val qualityGopherSql: String =
    """WITH wf AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |    FROM documents)
      |  WHERE len(w) > 0),
      |a AS (
      |  SELECT doc_id, count(*) AS n_words, sum(length(w)) AS chars,
      |    count(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 END)
      |      AS n_alpha,
      |    max(CASE WHEN w = 'the' THEN 1 ELSE 0 END)
      |      + max(CASE WHEN w = 'be' THEN 1 ELSE 0 END)
      |      + max(CASE WHEN w = 'to' THEN 1 ELSE 0 END)
      |      + max(CASE WHEN w = 'of' THEN 1 ELSE 0 END)
      |      + max(CASE WHEN w = 'and' THEN 1 ELSE 0 END)
      |      + max(CASE WHEN w = 'that' THEN 1 ELSE 0 END)
      |      + max(CASE WHEN w = 'have' THEN 1 ELSE 0 END)
      |      + max(CASE WHEN w = 'with' THEN 1 ELSE 0 END) AS n_stop
      |  FROM wf GROUP BY doc_id),
      |d AS (
      |  SELECT doc_id,
      |    len(string_split(text, chr(10))) AS n_lines,
      |    len(regexp_extract_all(text, '(^|\n)(-|\*)')) AS n_bullet,
      |    len(regexp_extract_all(text, '\.\.\.(\n|$)')) AS n_ell,
      |    (length(text) - length(replace(text, '#', '')))
      |      + (length(text) - length(replace(text, '...', ''))) // 3
      |      AS n_sym
      |  FROM documents)
      |SELECT a.doc_id, CAST(a.n_words AS BIGINT) AS n_words,
      |  a.n_words >= 50 AND a.n_words <= 100000 AS r_wordcount,
      |  3 * a.n_words <= a.chars AND a.chars <= 10 * a.n_words
      |    AS r_meanwordlen,
      |  10 * d.n_sym <= a.n_words AS r_symbolratio,
      |  10 * d.n_bullet <= 9 * d.n_lines AS r_bulletlines,
      |  10 * d.n_ell <= 3 * d.n_lines AS r_ellipsislines,
      |  5 * a.n_alpha >= 4 * a.n_words AS r_alphawords,
      |  a.n_stop >= 2 AS r_stopwords,
      |  (a.n_words >= 50 AND a.n_words <= 100000)
      |    AND (3 * a.n_words <= a.chars AND a.chars <= 10 * a.n_words)
      |    AND (10 * d.n_sym <= a.n_words)
      |    AND (10 * d.n_bullet <= 9 * d.n_lines)
      |    AND (10 * d.n_ell <= 3 * d.n_lines)
      |    AND (5 * a.n_alpha >= 4 * a.n_words)
      |    AND (a.n_stop >= 2) AS keep
      |FROM a JOIN d USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("text_entropy", textEntropy _, Some(textEntropySql)),
      ("quality_logreg", qualityLogreg _, Some(qualityLogregSql)),
      ("quality_gopher", qualityGopher _, Some(qualityGopherSql)))
}
