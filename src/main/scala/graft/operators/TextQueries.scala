package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis operators over `documents` (BASELINE.json scale100
  * extensions): token counting, quality scoring, marker-based language ID,
  * and document fingerprinting. Everything is a narrow per-row expression
  * pipeline (WholeStageCodegen-friendly, zero shuffles except the final
  * orderBy / fingerprint window), so it scales linearly with the corpus.
  *
  * All expressions are chosen for bit-identical DuckDB oracles: shared
  * regex subset (no engine-specific classes), md5 fingerprints, round(…,6)
  * on ratios.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  private val words: Column = split(col("text"), " ")

  // --------------------------------------------------- T1: token counting

  /** Whitespace tokens, BPE-ish regex tokens (word runs + single
    * non-word-non-space chars — the pre-tokenization split GPT-style BPE
    * vocabularies use), distinct words. */
  def textTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(words).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0)))
        .cast("long").as("regex_tokens"),
      size(array_distinct(words)).cast("long").as("distinct_words"))
      .orderBy(col("doc_id"))

  val textTokensSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
      |    AS regex_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |    AS distinct_words
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- T2: quality scoring

  /** Shared with [[QualityModelQueries.qualityLogreg]] — one definition
    * so the classifier's features can never drift from text_quality's. */
  private[operators] val Stopwords =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

  private[operators] val PunctClass = "[.,;:!?()-]"

  /** (doc_id, stop_cnt_l) — the one shuffle of the quality-feature
    * derivation (explode + conditional sum; HOF-free by design). */
  private[operators] def stopCountRel(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(words).as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("w").isin(Stopwords: _*), 1L).otherwise(0L))
        .as("stop_cnt_l"))

  /** Length / punctuation / stopword / case heuristics and a composite
    * quality score — the standard cheap pre-filter of LLM data pipelines.
    *
    * No higher-order functions (Spark 4 runs them interpreted): the
    * stopword count is an explode + conditional-sum aggregate, and the
    * word-character total is algebraic — words are the single-space split
    * of `text`, so sum(length(word)) = n_chars - (n_words - 1). */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val stopCounts = stopCountRel(d)
    val nChars = length(col("text")).cast("double")
    val nWords = size(words).cast("double")
    val stopCnt = col("stop_cnt_l").cast("double")
    val punctCnt = nChars -
      length(regexp_replace(col("text"), PunctClass, "")).cast("double")
    val upperCnt = nChars -
      length(regexp_replace(col("text"), "[A-Z]", "")).cast("double")
    val avgWordLen = (nChars - nWords + 1.0) / nWords
    val stopRatio = stopCnt / nWords
    val punctRatio = punctCnt / nChars
    val quality = least(nWords / lit(200.0), lit(1.0)) * 0.5 +
      stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.2
    d.join(stopCounts, Seq("doc_id"))
      .select(
        col("doc_id"),
        nChars.cast("long").as("n_chars"),
        nWords.cast("long").as("n_words"),
        round(avgWordLen, 6).as("avg_word_len"),
        round(stopRatio, 6).as("stopword_ratio"),
        round(punctRatio, 6).as("punct_ratio"),
        round(upperCnt / nChars, 6).as("upper_ratio"),
        round(quality, 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** (doc_id, quality) only — the composite score of [[textQuality]]
    * factored for reuse by the dedup canonical-selection operator
    * (`DedupQueries.dedupCanonical`). Same arithmetic, same round(…,6),
    * so the cross-engine exactness proven by the `text_quality` oracle
    * carries over verbatim. */
  private[operators] def qualityScore(s: SparkSession, dir: String): DataFrame =
    qualityScoreOf(docs(s, dir))

  /** [[qualityScore]] over an explicit (doc_id, text, …) relation — the
    * score is a pure per-doc function, so the incremental curation
    * stream ([[StreamingCurationQueries]]) scores one BATCH at a time
    * through the same expressions. */
  private[operators] def qualityScoreOf(d: DataFrame): DataFrame = {
    val stopCounts = stopCountRel(d)
    val nChars = length(col("text")).cast("double")
    val nWords = size(words).cast("double")
    val punctCnt = nChars -
      length(regexp_replace(col("text"), PunctClass, "")).cast("double")
    val quality = least(nWords / lit(200.0), lit(1.0)) * 0.5 +
      (col("stop_cnt_l").cast("double") / nWords) * 0.3 +
      (lit(1.0) - punctCnt / nChars) * 0.2
    d.join(stopCounts, Seq("doc_id"))
      .select(col("doc_id"), round(quality, 6).as("quality"))
  }

  val textQualitySql: String =
    """WITH q AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS DOUBLE) AS n_chars,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w IN
      |      ('the','a','and','of','to','in','is','it','that','for')))
      |      AS DOUBLE) AS stop_cnt,
      |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?()-]',
      |      '', 'g')) AS DOUBLE) AS punct_cnt,
      |    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
      |      AS DOUBLE) AS upper_cnt,
      |    CAST(list_sum(list_transform(string_split(text, ' '),
      |      w -> length(w))) AS DOUBLE) AS word_chars
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(n_chars AS BIGINT) AS n_chars,
      |  CAST(n_words AS BIGINT) AS n_words,
      |  round(word_chars / n_words, 6) AS avg_word_len,
      |  round(stop_cnt / n_words, 6) AS stopword_ratio,
      |  round(punct_cnt / n_chars, 6) AS punct_ratio,
      |  round(upper_cnt / n_chars, 6) AS upper_ratio,
      |  round(least(n_words / 200.0, 1.0) * 0.5 + (stop_cnt / n_words) * 0.3
      |    + (1.0 - punct_cnt / n_chars) * 0.2, 6) AS quality
      |FROM q ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- T3: language ID

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que"),
    "fr" -> Seq("le", "les", "des", "est", "et", "une", "dans", "pour"))

  /** Marker-word (function-word n-gram) language heuristic + CJK-codepoint
    * detection; deterministic priority chain on ties. (The synthetic corpus
    * labels `lang` randomly over one shared vocabulary, so accuracy against
    * that column is meaningless by construction — the operator is the
    * contract, exercised on real marker logic.)
    *
    * Shape: ONE explode of the word array feeding four conditional-sum
    * aggregates — Spark 4 evaluates `filter(words, …)` lambdas interpreted
    * per element (four passes here), which both burns CPU and churns the
    * heap; the explode + codegen'd hash-agg form is the same rewrite that
    * took MinHash 278→8.6 s. The join back to `documents` for the
    * per-doc zh/label columns is on doc_id (map-side combine collapses the
    * word rows before the shuffle). */
  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val markerSums = markers.map { case (lang, ms) =>
      sum(when(col("w").isin(ms: _*), 1L).otherwise(0L)).as(s"s_$lang")
    }
    val counts = d
      .select(col("doc_id"), explode(words).as("w"))
      .groupBy(col("doc_id"))
      .agg(markerSums.head, markerSums.tail: _*)
    val scores = markers.map { case (lang, _) => lang -> col(s"s_$lang") }.toMap
    val zhChars = (length(col("text")) -
      length(regexp_replace(col("text"), "[\\u4E00-\\u9FFF]", ""))).cast("long")
    val predicted =
      when(col("zh_chars") > 0, "zh")
        .when(scores("en") >= greatest(scores("de"), scores("es"),
          scores("fr")) && scores("en") > 0, "en")
        .when(scores("de") >= greatest(scores("es"), scores("fr")) &&
          scores("de") > 0, "de")
        .when(scores("es") >= scores("fr") && scores("es") > 0, "es")
        .when(scores("fr") > 0, "fr")
        .otherwise("unknown")
    // split(' ') never yields an empty array, so every doc has word rows
    // and the inner join is total
    d.select(col("doc_id"), zhChars.as("zh_chars"), col("lang"))
      .join(counts, Seq("doc_id"))
      .select(
        col("doc_id"),
        col("s_en"), col("s_de"), col("s_es"), col("s_fr"),
        col("zh_chars"),
        predicted.as("predicted"),
        col("lang").as("labeled"))
      .orderBy(col("doc_id"))
  }

  val textLangidSql: String =
    """WITH s AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text,' '), w -> w IN
      |      ('the','a','and','of','to','is','in','it'))) AS BIGINT) AS s_en,
      |    CAST(len(list_filter(string_split(text,' '), w -> w IN
      |      ('der','die','das','und','ist','nicht','mit','ein'))) AS BIGINT)
      |      AS s_de,
      |    CAST(len(list_filter(string_split(text,' '), w -> w IN
      |      ('el','la','los','las','es','un','una','que'))) AS BIGINT) AS s_es,
      |    CAST(len(list_filter(string_split(text,' '), w -> w IN
      |      ('le','les','des','est','et','une','dans','pour'))) AS BIGINT)
      |      AS s_fr,
      |    CAST(length(text) - length(regexp_replace(text,
      |      '[\x{4e00}-\x{9fff}]', '', 'g')) AS BIGINT) AS zh_chars
      |  FROM documents)
      |SELECT doc_id, s_en, s_de, s_es, s_fr, zh_chars,
      |  CASE WHEN zh_chars > 0 THEN 'zh'
      |       WHEN s_en >= greatest(s_de, s_es, s_fr) AND s_en > 0 THEN 'en'
      |       WHEN s_de >= greatest(s_es, s_fr) AND s_de > 0 THEN 'de'
      |       WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
      |       WHEN s_fr > 0 THEN 'fr'
      |       ELSE 'unknown' END AS predicted,
      |  lang AS labeled
      |FROM s ORDER BY doc_id""".stripMargin

  // --------------------------------------------- T4: document fingerprint

  /** Winnowing-style fingerprint: the minimum md5 over word 3-gram shingles
    * (a rolling-hash selection — stable under small edits elsewhere in the
    * doc), plus how many docs share it.
    *
    * Shingles come from posexplode + two `lead` window steps, NOT from
    * `transform(sequence(…), i => slice(…))`: Spark 4 evaluates those
    * higher-order lambdas interpreted per element (allocating a fresh
    * sliced array + string per shingle), which is both slow and a GC
    * amplifier on a loaded host. The window/agg form keeps md5 + concat in
    * whole-stage codegen, and the groupBy(doc_id) after the doc_id-
    * partitioned window adds no second shuffle. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val shingled = d
      .select(col("doc_id"), posexplode(words).as(Seq("pos", "w")))
      .withColumn("w1", lead(col("w"), 1).over(byDoc))
      .withColumn("w2", lead(col("w"), 2).over(byDoc))
      .filter(col("w2").isNotNull) // keep full 3-grams only
      .groupBy(col("doc_id"))
      .agg(min(md5(concat_ws(" ", col("w"), col("w1"), col("w2"))))
        .as("fp_sh"))
    // docs with < 3 words have no full shingle → fall back to md5(text)
    val fp = d.select(col("doc_id"), col("text"))
      .join(shingled, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("fp_sh"), md5(col("text"))).as("fingerprint"))
    val win = Window.partitionBy(col("fingerprint"))
    fp.withColumn("n_sharing", count(lit(1)).over(win).cast("long"))
      .orderBy(col("doc_id"))
  }

  val textFingerprintSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    list_min(list_transform(
      |      CASE WHEN len(w) >= 3
      |        THEN list_transform(range(1, len(w) - 1),
      |               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |        ELSE [text] END,
      |      g -> md5(g))) AS fingerprint
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
      |        FROM documents))
      |SELECT doc_id, fingerprint,
      |  CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS n_sharing
      |FROM f ORDER BY doc_id""".stripMargin

  // ------------------------------------- T5: composed filtering pipeline

  /** The canonical pretraining-data flow composed from the operators
    * above: quality floor → language filter → exact dedup (keep the
    * smallest doc_id per content hash). One declarative plan — the filters
    * fuse into a single codegen stage before the dedup shuffle. */
  def textFilterPipeline(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // one explode pass feeds both word-level counters (no interpreted HOFs)
    val wordCounts = d
      .select(col("doc_id"), explode(words).as("w"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("w").isin(Stopwords: _*), 1L).otherwise(0L))
          .as("stop_cnt_l"),
        sum(when(col("w").isin(markers.toMap.apply("en"): _*), 1L)
          .otherwise(0L)).as("s_en_l"))
    val nChars = length(col("text")).cast("double")
    val nWords = size(words).cast("double")
    val stopCnt = col("stop_cnt_l").cast("double")
    val punctCnt = nChars -
      length(regexp_replace(col("text"), PunctClass, "")).cast("double")
    val quality = least(nWords / lit(200.0), lit(1.0)) * 0.5 +
      (stopCnt / nWords) * 0.3 + (lit(1.0) - punctCnt / nChars) * 0.2
    d.join(wordCounts, Seq("doc_id"))
      .withColumn("quality", round(quality, 6))
      .withColumn("s_en", col("s_en_l"))
      .filter(col("quality") >= 0.35 && col("s_en") > 0)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        min(col("quality")).as("quality"), min(col("s_en")).as("s_en"))
      .select(col("doc_id"), col("quality"), col("s_en"))
      .orderBy(col("doc_id"))
  }

  val textFilterPipelineSql: String =
    """WITH scored AS (
      |  SELECT doc_id, text,
      |    round(least(len(string_split(text,' ')) / 200.0, 1.0) * 0.5
      |      + (CAST(len(list_filter(string_split(text,' '), w -> w IN
      |          ('the','a','and','of','to','in','is','it','that','for')))
      |          AS DOUBLE) / len(string_split(text,' '))) * 0.3
      |      + (1.0 - CAST(length(text) - length(regexp_replace(text,
      |          '[.,;:!?()-]', '', 'g')) AS DOUBLE) / length(text)) * 0.2,
      |      6) AS quality,
      |    CAST(len(list_filter(string_split(text,' '), w -> w IN
      |      ('the','a','and','of','to','is','in','it'))) AS BIGINT) AS s_en
      |  FROM documents)
      |SELECT min(doc_id) AS doc_id, min(quality) AS quality,
      |       min(s_en) AS s_en
      |FROM scored WHERE quality >= 0.35 AND s_en > 0
      |GROUP BY md5(text) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- registry

  // ----------------------------------------- T6: repetition quality gates

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1, adapted to a
    * newline-free corpus): per document, the fraction of tokens belonging
    * to repeated unigrams, the most-frequent-unigram share, and the
    * most-frequent-bigram share. High values mark boilerplate/degenerate
    * text for training-data filtering.
    *
    * Shape: posexplode → lead() window keyed by doc for bigrams → two
    * keyed aggregations. Every shuffle is on doc_id (or (doc_id, word)),
    * so the operator scales with the corpus, and no per-doc state exceeds
    * the doc's own token count. */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val w = docs(s, dir).select(col("doc_id"),
      posexplode(words).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val uni = w.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_words"),
        max(col("cnt")).as("top_word"),
        sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("dup_words"))
    val bi = w
      .withColumn("next", lead(col("w"), 1).over(byDoc))
      .filter(col("next").isNotNull)
      .groupBy(col("doc_id"), concat_ws(" ", col("w"), col("next")).as("bg"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("top_bigram"), sum(col("cnt")).as("n_bigrams"))
    uni.join(bi, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        col("n_words"),
        round(col("dup_words").cast("double") / col("n_words"), 6)
          .as("dup_word_frac"),
        round(col("top_word").cast("double") / col("n_words"), 6)
          .as("top_word_frac"),
        round(coalesce(col("top_bigram").cast("double") /
          col("n_bigrams"), lit(0.0)), 6).as("top_bigram_frac"))
      .withColumn("repetitive",
        col("dup_word_frac") > 0.9 || col("top_bigram_frac") > 0.18)
      .orderBy(col("doc_id"))
  }

  val textRepetitionSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT)
      |           AS pos,
      |         unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |seq AS (
      |  SELECT doc_id, pos, w,
      |         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS next
      |  FROM w),
      |uni AS (
      |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
      |         max(cnt) AS top_word,
      |         sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_words
      |  FROM (SELECT doc_id, w, count(*) AS cnt FROM w GROUP BY 1, 2)
      |  GROUP BY doc_id),
      |bi AS (
      |  SELECT doc_id, max(cnt) AS top_bigram, sum(cnt) AS n_bigrams
      |  FROM (SELECT doc_id, w || ' ' || next AS bg, count(*) AS cnt
      |        FROM seq WHERE next IS NOT NULL GROUP BY 1, 2)
      |  GROUP BY doc_id)
      |SELECT u.doc_id, u.n_words,
      |       round(CAST(u.dup_words AS DOUBLE) / u.n_words, 6)
      |         AS dup_word_frac,
      |       round(CAST(u.top_word AS DOUBLE) / u.n_words, 6)
      |         AS top_word_frac,
      |       round(coalesce(CAST(b.top_bigram AS DOUBLE) / b.n_bigrams, 0),
      |         6) AS top_bigram_frac,
      |       (round(CAST(u.dup_words AS DOUBLE) / u.n_words, 6) > 0.9
      |        OR round(coalesce(CAST(b.top_bigram AS DOUBLE) / b.n_bigrams,
      |             0), 6) > 0.18) AS repetitive
      |FROM uni u LEFT JOIN bi b ON u.doc_id = b.doc_id
      |ORDER BY u.doc_id""".stripMargin

  // ------------------------------------ T7: benchmark decontamination scan

  /** Decontamination — the n-gram-overlap scan every training corpus runs
    * against its evaluation benchmarks before training: here every 10th
    * document (`doc_id % 10 = 0`) plays the held-out benchmark, and every
    * other document is scored by the fraction of its word 5-grams that
    * appear anywhere in the benchmark (GPT-3-style 13-gram check, scaled
    * to this corpus's 10–99-word docs; the sources have disjoint phrase
    * space, so a cross-source split would be trivially zero — the id
    * split puts near-dup pairs on opposite sides). Contaminated = overlap
    * ≥ 0.2; at sf0.01 that flags the 6 probe docs that are near-dups of a
    * benchmark doc.
    *
    * Shape: benchmark 5-grams stay a RELATION (distinct gram hashes) and
    * the probe is a semi join on the gram hash, then one per-doc
    * aggregation. Nothing is all-pairs and nothing is driver-side: the
    * join key is the gram, the benchmark side is the small side
    * (broadcast here; at 100 TB drop the hint and it degrades gracefully
    * to a shuffle semi join under AQE), and the probe side shuffles once
    * on doc_id. */
  def textDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // distinct 5-gram hashes per doc in one compiled loop (NgramHashes):
    // value-identical to the old explode(grams)→xxhash64 chain, which
    // built every gram via interpreted HOF lambdas and cost 37 s / sf0.1
    val grams5 = (c: Column) =>
      graft.functions.ShingleOps.ngram_hashes(split(c, " "), 5)
    // benchmark grams: hashed, distinct — the small relation
    val bench = d.filter(col("doc_id") % 10 === 0)
      .select(explode(grams5(col("text"))).as("gh")).distinct()
    // probe: every non-benchmark doc's grams, joined on the hash
    val probe = d.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), explode(grams5(col("text"))).as("gh"))
    val hits = probe.join(broadcast(bench), Seq("gh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    probe.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("doc_id"), "left_outer")
      .na.fill(Map("n_hit" -> 0L))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6)
          .as("overlap"))
      .withColumn("contaminated", col("overlap") >= 0.2)
      .orderBy(col("doc_id"))
  }

  val textDecontaminateSql: String =
    """WITH g AS (
      |  SELECT doc_id, source, unnest(list_distinct(
      |    list_transform(range(1, len(string_split(text,' ')) - 3),
      |      i -> array_to_string(string_split(text,' ')[i:i+4], ' '))))
      |    AS g
      |  FROM documents
      |  WHERE len(string_split(text,' ')) >= 5),
      |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 0),
      |probe AS (SELECT doc_id, g FROM g WHERE doc_id % 10 <> 0),
      |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
      |        FROM probe GROUP BY 1),
      |hit AS (SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_hit
      |        FROM probe p JOIN bench b ON p.g = b.g GROUP BY 1)
      |SELECT t.doc_id, t.n_grams, coalesce(h.n_hit, 0) AS n_hit,
      |       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_grams, 6)
      |         AS overlap,
      |       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / t.n_grams, 6)
      |         >= 0.2 AS contaminated
      |FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
      |ORDER BY t.doc_id""".stripMargin

  // ------------------------------ T8: span-level (C4-style) boilerplate scan

  /** Corpus-wide duplicated-span detection — the C4/fineweb "any
    * three-sentence span seen before is boilerplate" rule, adapted to this
    * newline-free corpus as fixed 10-word chunks: a chunk whose exact text
    * occurs more than once ANYWHERE in the corpus is flagged, and each doc
    * reports its flagged fraction. This is the dedup family's span-level
    * member: exact dedup keys whole docs, MinHash keys near-whole docs,
    * this keys repeated SPANS inside otherwise-distinct docs (the shape
    * template boilerplate actually takes).
    *
    * Chunk reassembly is ten conditional `max` aggregates over the slot
    * index — NOT `collect_list` (order-nondeterministic after a shuffle)
    * and NOT `transform(sequence(…), slice(…))` (interpreted per element
    * in Spark 4) — so the whole reassembly stays in codegen'd hash-agg.
    * The corpus-wide frequency join keys on md5(chunk) (32 hex chars, not
    * the raw span — the shuffle payload trick C4 itself uses); both sides
    * are corpus-sized, so it is a plain shuffle join that scales with the
    * corpus, never all-pairs. */
  def textChunkDedup(s: SparkSession, dir: String): DataFrame = {
    val chunked = docs(s, dir)
      .select(col("doc_id"), posexplode(words).as(Seq("pos", "w")))
      .withColumn("chunk", (col("pos") / 10).cast("int"))
      .withColumn("slot", col("pos") % 10)
      .groupBy(col("doc_id"), col("chunk"))
      .agg(md5(concat_ws(" ", (0 until 10).map(k =>
        max(when(col("slot") === k, col("w")))): _*)).as("h"))
    val freq = chunked.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
    chunked.join(freq, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("n_occ") >= 2, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_chunks"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_chunks"), 6)
          .as("boiler_frac"),
        // integer comparison, not a float threshold: engines can never
        // disagree on >= of two longs
        (col("n_boiler") * 2 >= col("n_chunks")).as("mostly_boiler"))
      .orderBy(col("doc_id"))
  }

  val textChunkDedupSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |         CAST(generate_subscripts(string_split(text, ' '), 1)
      |           AS BIGINT) - 1 AS pos,
      |         unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |ch AS (
      |  SELECT doc_id, pos // 10 AS chunk,
      |         md5(string_agg(w, ' ' ORDER BY pos)) AS h
      |  FROM w GROUP BY 1, 2),
      |freq AS (SELECT h, count(*) AS n_occ FROM ch GROUP BY 1)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_chunks,
      |       CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_boiler,
      |       round(CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END)
      |         AS DOUBLE) / count(*), 6) AS boiler_frac,
      |       sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) * 2 >= count(*)
      |         AS mostly_boiler
      |FROM ch JOIN freq USING (h)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------- T8b: content-defined chunking (CDC) dedup

  /** Variable-length (content-defined) chunk dedup — the shift-robust
    * sibling of [[textChunkDedup]]. Fixed 10-word chunks break on ANY
    * insertion: one added word shifts every later chunk boundary and a
    * 99%-identical doc shares zero chunk hashes. Content-defined
    * chunking (the FastCDC/rolling-hash family used by storage dedup and
    * web-scale sub-doc dedup alike) instead cuts wherever a local
    * content fingerprint hits a boundary pattern — here, a word 3-gram
    * whose md5 starts with '0' (rate 1/16 → ~16-word average chunks) —
    * so an insertion only perturbs the chunks it touches and duplicated
    * spans re-align at the next boundary.
    *
    * Cross-engine determinism is the design constraint: the boundary
    * rule is md5-prefix on the gram TEXT (both engines agree on md5 of
    * identical bytes), never a seeded integer hash (DuckDB's hash() is
    * not Spark's xxhash64). Chunk reassembly collects (pos, word)
    * structs and array_sorts in-row — per-(doc,chunk) groups are
    * bounded (~16 words), so the non-codegen collect is a few structs
    * per output row, not a hot path. The corpus-wide frequency join
    * keys on md5(chunk) — shuffle ∝ corpus, never all-pairs, same as
    * the fixed-chunk plan. */
  def textCdcDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val w = docs(s, dir)
      .select(col("doc_id"), posexplode(words).as(Seq("pos", "w")))
      .withColumn("w1", lead(col("w"), 1).over(byPos))
      .withColumn("w2", lead(col("w"), 2).over(byPos))
      .withColumn("b",
        when(col("w2").isNotNull &&
          substring(md5(concat_ws(" ", col("w"), col("w1"), col("w2"))),
            1, 1) === "0", 1L).otherwise(0L))
      .withColumn("chunk", sum(col("b")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val chunked = w.groupBy(col("doc_id"), col("chunk"))
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("w")))),
        e => e.getField("w")), " ")).as("h"),
        count(lit(1)).as("len"))
    val freq = chunked.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
    chunked.join(freq, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(col("len")).cast("long").as("n_words"),
        sum(when(col("n_occ") >= 2, 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("n_occ") >= 2, col("len")).otherwise(0L))
          .cast("long").as("n_dup_words"))
      .select(col("doc_id"), col("n_chunks"), col("n_words"), col("n_dup"),
        round(col("n_dup_words").cast("double") / col("n_words"), 6)
          .as("dup_word_frac"),
        (col("n_dup") * 2 >= col("n_chunks")).as("mostly_dup"))
      .orderBy(col("doc_id"))
  }

  val textCdcDedupSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |         CAST(generate_subscripts(string_split(text, ' '), 1)
      |           AS BIGINT) - 1 AS pos,
      |         unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, pos, w,
      |         lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
      |         lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |  FROM w),
      |b AS (
      |  SELECT doc_id, pos, w,
      |    CASE WHEN w2 IS NOT NULL AND
      |      substring(md5(w || ' ' || w1 || ' ' || w2), 1, 1) = '0'
      |    THEN 1 ELSE 0 END AS b
      |  FROM g),
      |ch0 AS (
      |  SELECT doc_id, pos, w,
      |    sum(b) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk
      |  FROM b),
      |ch AS (
      |  SELECT doc_id, chunk, md5(string_agg(w, ' ' ORDER BY pos)) AS h,
      |         count(*) AS len
      |  FROM ch0 GROUP BY 1, 2),
      |freq AS (SELECT h, count(*) AS n_occ FROM ch GROUP BY 1)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_chunks,
      |       CAST(sum(len) AS BIGINT) AS n_words,
      |       CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_dup,
      |       round(CAST(sum(CASE WHEN n_occ >= 2 THEN len ELSE 0 END)
      |         AS DOUBLE) / sum(len), 6) AS dup_word_frac,
      |       sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) * 2 >= count(*)
      |         AS mostly_dup
      |FROM ch JOIN freq USING (h)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------- T9: tf-idf keyword extract

  /** Per-document top-3 keywords by tf-idf (linear idf N/df, not
    * ln(N/df): the score is then ONE IEEE division of two exact integer
    * products, bit-identical across engines, so the cross-engine rank
    * order — the thing the oracle hashes — can never drift on a libm ulp;
    * swapping in log-idf is a one-line change). Ties break on the term.
    *
    * Shape: one explode → (doc, term) counts with map-side combine; doc
    * length and document frequency are two reaggregations of that SAME
    * relation (no second scan of the corpus); N arrives as a broadcast
    * 1-row aggregate, never a driver-side collect. The final top-k is a
    * doc_id-partitioned window — per-doc state is the doc's own vocabulary,
    * nothing global. */
  def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val tf = d.select(col("doc_id"), explode(words).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val docLen = tf.groupBy(col("doc_id")).agg(sum(col("cnt")).as("n_words"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = d.agg(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf
      .join(docLen, Seq("doc_id"))
      .join(docFreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("cnt") * col("n_docs")).cast("double") /
          (col("n_words") * col("df")))
    val byScore = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rnk", row_number().over(byScore).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("cnt"),
        col("df"), round(col("score"), 6).as("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val textTfidfSql: String =
    """WITH tf AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |cnts AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS cnt
      |  FROM tf GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words
      |       FROM cnts GROUP BY 1),
      |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
      |          FROM cnts GROUP BY 1),
      |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |      FROM documents),
      |scored AS (
      |  SELECT c.doc_id, c.term, c.cnt, f.df,
      |         CAST(c.cnt * n.n_docs AS DOUBLE) / (d.n_words * f.df)
      |           AS score
      |  FROM cnts c JOIN dl d USING (doc_id)
      |              JOIN dfreq f USING (term), n),
      |ranked AS (
      |  SELECT doc_id, term, cnt, df, score,
      |         CAST(row_number() OVER (PARTITION BY doc_id
      |           ORDER BY score DESC, term) AS BIGINT) AS rnk
      |  FROM scored)
      |SELECT doc_id, rnk, term, cnt, df, round(score, 6) AS score
      |FROM ranked WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  // ------------------------------------------- T10: GPT-style seq packing

  /** Sequence packing — the step between a filtered corpus and a training
    * run: documents are concatenated per shard and cut into fixed
    * token-budget sequences (GPT-style packing splits docs across
    * sequence boundaries; the doc's START offset decides its sequence).
    * Emits per (source, seq_id): docs starting there, their token mass,
    * and the first doc — the manifest a loader materializes batches from.
    *
    * The running offset is a window over (source, doc_id) — `source` is
    * the packing shard, so no GLOBAL ordering exists anywhere; a skewed
    * shard at 100 TB gets salted into sub-shards first (each sub-shard
    * packs independently, exactly like adding workers to a loader). */
  def textPackSequences(s: SparkSession, dir: String): DataFrame = {
    val budget = 512
    val bySrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs(s, dir)
      .select(col("source"), col("doc_id"),
        size(words).cast("long").as("n_tokens"))
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(
          bySrc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_id", (col("start_off") / budget).cast("long"))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"), col("seq_id"))
  }

  val textPackSequencesSql: String =
    """WITH t AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |o AS (
      |  SELECT source, doc_id, n_tokens,
      |         coalesce(sum(n_tokens) OVER (PARTITION BY source
      |           ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS start_off
      |  FROM t)
      |SELECT source, CAST(start_off // 512 AS BIGINT) AS seq_id,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS tokens,
      |       min(doc_id) AS first_doc
      |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------- T11: PII-style scrubbing

  /** Redaction — the scrub pass every training-data pipeline runs before
    * anything else ships: emails → `<EMAIL>`, URLs → `<URL>`, long digit
    * runs (≥6) → `<NUM>`, with per-category counts. The fixture corpus is
    * plain prose, so the PII surface is synthesized deterministically from
    * `doc_id` (one email per doc + a second for every third doc, one URL,
    * one 6–10 digit run) — the operator then does real work on every row
    * and the oracle verifies both engines' regex semantics end to end.
    *
    * Passes apply email → URL → digits, and each category is counted on
    * the text AS THAT PASS SEES IT (email on raw, URL post-email, digits
    * post-URL): later patterns can overlap earlier matches' spans (a URL
    * path or email local-part can carry a ≥6-digit run at large doc_id),
    * and sequential counting keeps the count = exactly what the replace
    * rewrote, at any scale. Pure per-row codegen'd regex — no shuffle
    * except the output order; the regex subset (char classes, `{n,}`,
    * alternation-free) behaves identically in Java regex and RE2. */
  def textScrub(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val urlRe = "https?://[^\\s]+"
    val numRe = "[0-9]{6,}"
    docs(s, dir)
      .select(col("doc_id"), concat(
        col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" cc admin"), col("doc_id"), lit("@mail.org")))
          .otherwise(lit("")),
        lit(" via https://site"), col("doc_id"), lit(".example/p"),
        col("doc_id"),
        lit(" ref "), expr("repeat('7', CAST(6 + doc_id % 5 AS INT))"),
        lit(" end")).as("raw"))
      .withColumn("s1", regexp_replace(col("raw"), emailRe, "<EMAIL>"))
      .withColumn("s2", regexp_replace(col("s1"), urlRe, "<URL>"))
      .select(col("doc_id"),
        regexp_replace(col("s2"), numRe, "<NUM>").as("scrubbed"),
        regexp_count(col("raw"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("s1"), lit(urlRe)).cast("long").as("n_urls"),
        regexp_count(col("s2"), lit(numRe)).cast("long").as("n_longnums"))
      .orderBy(col("doc_id"))
  }

  val textScrubSql: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |         text || ' contact user' || doc_id || '@example.com' ||
      |         CASE WHEN doc_id % 3 = 0
      |              THEN ' cc admin' || doc_id || '@mail.org' ELSE '' END ||
      |         ' via https://site' || doc_id || '.example/p' || doc_id ||
      |         ' ref ' || repeat('7', CAST(6 + doc_id % 5 AS INT)) ||
      |         ' end' AS raw
      |  FROM documents),
      |p1 AS (SELECT doc_id, raw,
      |         regexp_replace(raw,
      |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
      |           '<EMAIL>', 'g') AS s1 FROM raw),
      |p2 AS (SELECT *, regexp_replace(s1, 'https?://[^\s]+', '<URL>', 'g')
      |         AS s2 FROM p1)
      |SELECT doc_id,
      |  regexp_replace(s2, '[0-9]{6,}', '<NUM>', 'g') AS scrubbed,
      |  CAST(len(regexp_extract_all(raw,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
      |    AS n_emails,
      |  CAST(len(regexp_extract_all(s1, 'https?://[^\s]+')) AS BIGINT)
      |    AS n_urls,
      |  CAST(len(regexp_extract_all(s2, '[0-9]{6,}')) AS BIGINT)
      |    AS n_longnums
      |FROM p2 ORDER BY doc_id""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("text_scrub", textScrub _, Some(textScrubSql)),
      ("text_tokens", textTokens _, Some(textTokensSql)),
      ("text_chunk_dedup", textChunkDedup _, Some(textChunkDedupSql)),
      ("text_cdc_dedup", textCdcDedup _, Some(textCdcDedupSql)),
      ("text_tfidf", textTfidf _, Some(textTfidfSql)),
      ("text_pack_sequences", textPackSequences _,
        Some(textPackSequencesSql)),
      ("text_decontaminate", textDecontaminate _, Some(textDecontaminateSql)),
      ("text_repetition", textRepetition _, Some(textRepetitionSql)),
      ("text_quality", textQuality _, Some(textQualitySql)),
      ("text_langid", textLangid _, Some(textLangidSql)),
      ("text_fingerprint", textFingerprint _, Some(textFingerprintSql)),
      ("text_filter_pipeline", textFilterPipeline _,
        Some(textFilterPipelineSql)))
}
