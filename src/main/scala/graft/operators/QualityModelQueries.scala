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

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("text_entropy", textEntropy _, Some(textEntropySql)),
      ("quality_logreg", qualityLogreg _, Some(qualityLogregSql)))
}
