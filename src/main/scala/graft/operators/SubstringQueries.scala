package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Cross-document repeated-substring statistics — the span-level dedup
  * primitive of Lee et al., "Deduplicating Training Data Makes Language
  * Models Better" (ACL'22): instead of deduplicating whole documents, find
  * the word n-gram surface that repeats ACROSS documents (boilerplate,
  * licenses, quoted blocks) and report, per document, how much of it is
  * such repeated material. A training pipeline uses the fraction as a
  * drop/trim signal and `max_df` as a boilerplate-virality probe.
  *
  * Shape (all relational, nothing all-pairs):
  *   1. shingle relation: one [[graft.functions.NgramHashes]] call per row
  *      (compiled loop, sorted-distinct 3-gram xxhash64s) + explode —
  *      O(total tokens) rows, narrow.
  *   2. per-shingle stats: groupBy(hash) with COUNT/MIN/MAX only — all
  *      algebraic, so map-side partial aggregation absorbs hot boilerplate
  *      shingles before the shuffle (the skew class this operator exists
  *      to find is exactly the one partial agg flattens). A shingle is
  *      cross-doc repeated iff min(doc_id) != max(doc_id) — no
  *      count(DISTINCT) anywhere.
  *   3. join back on the hash (both sides already partitioned by it after
  *      stage 2's shuffle) and re-aggregate per doc_id.
  * At 100 TB each stage is one bounded shuffle keyed by a high-cardinality
  * column; the only skew risk (mega-df shingles fanning out in stage 3) is
  * bounded by corpus size — each occurrence row joins exactly once.
  *
  * The DuckDB oracle re-derives grams as STRINGS (the house convention:
  * hash equality == gram equality modulo 64-bit collisions, same caveat as
  * every shingle-based query since `dedup_minhash_lsh`).
  */
object SubstringQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Per-doc repeated 3-gram coverage: how many of the doc's distinct word
    * 3-grams occur in at least one other document, and the doc frequency of
    * its most widely shared gram. */
  def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    substringFrom(shingleRel(docs(s, dir)))

  /** (doc_id, shingle-hash) occurrence relation — distinct per doc by
    * NgramHashes construction, and the MERGEABLE state of the streaming
    * twin ([[StreamingSubstringQueries]]): a document's shingle rows live
    * wholly inside the batch that carries it, so appended partials are
    * disjoint and the store needs no re-aggregation at all. */
  private[operators] def shingleRel(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      explode(graft.functions.ShingleOps
        .ngram_hashes(split(col("text"), " "), 3)).as("h"))

  private[operators] def substringFrom(sh: DataFrame): DataFrame = {
    val stats = sh.groupBy(col("h"))
      .agg(count(lit(1L)).as("df"),
        min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .select(col("h"), col("df"),
        (col("mn") =!= col("mx")).cast("long").as("rep"))
    sh.join(stats, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1L)).cast("long").as("n_shingles"),
        sum(col("rep")).cast("long").as("n_repeated"),
        max(col("df")).cast("long").as("max_df"))
      .select(col("doc_id"), col("n_shingles"), col("n_repeated"),
        round(col("n_repeated").cast("double") / col("n_shingles"), 6)
          .as("repeated_frac"),
        col("max_df"))
      .orderBy(col("doc_id"))
  }

  val dedupSubstringSql: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |  WHERE len(w) >= 3),
      |st AS (
      |  SELECT g, count(*) AS df,
      |    CASE WHEN min(doc_id) <> max(doc_id) THEN 1 ELSE 0 END AS rep
      |  FROM sh GROUP BY g)
      |SELECT s.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(sum(st.rep) AS BIGINT) AS n_repeated,
      |  round(CAST(sum(st.rep) AS DOUBLE) / count(*), 6) AS repeated_frac,
      |  CAST(max(st.df) AS BIGINT) AS max_df
      |FROM sh s JOIN st USING (g)
      |GROUP BY s.doc_id
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------ S2: span-level coverage

  /** How much text substring-dedup would actually DELETE: the union of
    * the 3-token spans [p, p+2] whose gram repeats in another document,
    * as a per-doc covered-token count and fraction. This is the
    * actionable form of [[dedupSubstring]]'s distinct-gram ratio — a
    * doc can have repeated_frac 0.5 but near-zero deletable text if the
    * repeats interleave with unique grams, or near-total if they run in
    * blocks.
    *
    * Shape: the positional relation comes from
    * [[graft.functions.NgramHashesPos]] (one compiled hash per window,
    * duplicates kept — `posexplode` recovers positions; the distinct
    * variant loses exactly this). Repeated grams come from the same
    * algebraic min≠max gate as [[dedupSubstring]]. The interval union
    * needs no interval machinery: with repeated positions sorted per
    * doc, each contributes min(3, pos − prev) new covered tokens (3 for
    * the first) — one per-doc window pass over ONLY the repeated
    * positions, not the corpus. */
  def dedupSubstringSpans(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val pos = d.select(col("doc_id"),
      posexplode(graft.functions.ShingleOps
        .ngram_hashes_pos(split(col("text"), " "), 3)).as(Seq("pos", "h")))
    val rep = shingleRel(d).groupBy(col("h"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select(col("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val covered = pos.join(rep, Seq("h"))
      .select(col("doc_id"), col("pos"))
      .withColumn("prev", lag(col("pos"), 1).over(w))
      .withColumn("add", when(col("prev").isNull, lit(3L))
        .otherwise(least(lit(3L), (col("pos") - col("prev")).cast("long"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("add")).as("covered_tokens"),
        count(lit(1)).as("n_repeated_pos"))
    d.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left_outer")
      .na.fill(Map("covered_tokens" -> 0L, "n_repeated_pos" -> 0L))
      .select(col("doc_id"), col("n_tokens"),
        col("n_repeated_pos").cast("long").as("n_repeated_pos"),
        col("covered_tokens").cast("long").as("covered_tokens"),
        round(col("covered_tokens").cast("double") / col("n_tokens"), 6)
          .as("covered_frac"))
      .orderBy(col("doc_id"))
  }

  /** Positions differ by engine origin (Spark 0-based, the oracle's
    * range() 1-based) but the span union only reads DIFFERENCES plus the
    * constant first-span width, so the relation is origin-invariant. */
  val dedupSubstringSpansSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
      |           FROM documents),
      |pos AS (
      |  SELECT doc_id, i AS pos,
      |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      |  FROM t, LATERAL unnest(range(1, len(w) - 1)) AS u(i)),
      |rep AS (
      |  SELECT g FROM (
      |    SELECT g, min(doc_id) AS mn, max(doc_id) AS mx
      |    FROM (SELECT DISTINCT doc_id, g FROM pos) GROUP BY g)
      |  WHERE mn <> mx),
      |cov AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN prev IS NULL THEN 3
      |             ELSE least(3, pos - prev) END) AS covered_tokens,
      |    count(*) AS n_repeated_pos
      |  FROM (SELECT p.doc_id, p.pos,
      |          lag(p.pos) OVER (PARTITION BY p.doc_id ORDER BY p.pos)
      |            AS prev
      |        FROM pos p JOIN rep USING (g))
      |  GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(len(t.w) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(cov.n_repeated_pos, 0) AS BIGINT) AS n_repeated_pos,
      |  CAST(coalesce(cov.covered_tokens, 0) AS BIGINT) AS covered_tokens,
      |  round(CAST(coalesce(cov.covered_tokens, 0) AS DOUBLE) / len(t.w), 6)
      |    AS covered_frac
      |FROM t LEFT JOIN cov USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------- S2b: the rewrite itself

  /** The actual Lee-et-al transform, end to end: documents with every
    * cross-document-repeated 3-token span DELETED, as (doc_id,
    * n_tokens, n_removed, cleaned). [[dedupSubstringSpans]] reports how
    * much would go; this produces the corpus that ships.
    *
    * Shape: the repeated-position relation (same subtree as the spans
    * query) explodes each repeated gram start into its 3 covered
    * positions, distinct, and ANTI-joins the positional word relation —
    * all token-grain, nothing doc²; the only doc-grain step is the
    * final ordered re-assembly (collect_list + sort per doc, the same
    * bounded post-aggregate shape as `ann_lsh_bucket`'s signature).
    * Documents shorter than one gram pass through byte-identical
    * (split-on-space + join-with-space is lossless). */
  def dedupSubstringRewrite(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val posWords = d.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
    val posGrams = d.select(col("doc_id"),
      posexplode(graft.functions.ShingleOps
        .ngram_hashes_pos(split(col("text"), " "), 3)).as(Seq("pos", "h")))
    val rep = shingleRel(d).groupBy(col("h"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select(col("h"))
    val covered = posGrams.join(rep, Seq("h"))
      .select(col("doc_id"), explode(array(col("pos"), col("pos") + 1,
        col("pos") + 2)).as("pos"))
      .distinct()
    val kept = posWords.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("word")))),
          t => t.getField("word")), " ").as("cleaned"))
    d.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
      .orderBy(col("doc_id"))
  }

  /** Positions are engine-origin-relative on both sides (Spark 0-based,
    * range() 1-based) — cov derives from gram positions in the SAME
    * origin as the word positions, so the anti-join is origin-invariant. */
  val dedupSubstringRewriteSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
      |           FROM documents),
      |pw AS (
      |  SELECT doc_id, i AS pos, w[i] AS word
      |  FROM t, LATERAL unnest(generate_series(1, len(w))) AS u(i)),
      |pg AS (
      |  SELECT doc_id, i AS pos,
      |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      |  FROM t, LATERAL unnest(range(1, len(w) - 1)) AS u(i)),
      |rep AS (
      |  SELECT g FROM (
      |    SELECT g, min(doc_id) AS mn, max(doc_id) AS mx
      |    FROM (SELECT DISTINCT doc_id, g FROM pg) GROUP BY g)
      |  WHERE mn <> mx),
      |cov AS (
      |  SELECT DISTINCT p.doc_id, p.pos + x.d AS pos
      |  FROM pg p JOIN rep USING (g),
      |       LATERAL unnest([0, 1, 2]) AS x(d)),
      |kept AS (
      |  SELECT pw.doc_id, pw.pos, pw.word
      |  FROM pw ANTI JOIN cov USING (doc_id, pos)),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |         string_agg(word, ' ' ORDER BY pos) AS cleaned
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(len(t.w) AS BIGINT) AS n_tokens,
      |  CAST(len(t.w) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed,
      |  coalesce(agg.cleaned, '') AS cleaned
      |FROM t LEFT JOIN agg USING (doc_id) ORDER BY t.doc_id""".stripMargin

  // ------------------------------------- S3: source contamination matrix

  /** WHICH sources share text with which: the pairwise source-level
    * Jaccard over distinct 3-gram sets — the curation diagnostic that
    * turns the per-doc coverage signal into a provenance map (mirror
    * sites, cross-posted corpora, license boilerplate families).
    *
    * Shape: the (source, gram) relation collapses the corpus to at most
    * |sources| · |gram vocab| rows BEFORE any pairing; the self-join
    * fans out C(k,2) pairs per gram shared by k sources — bounded by
    * C(|sources|, 2) per gram, a constant multiplier, never doc-grain.
    * Per-source totals are a |sources|-row broadcast. */
  def sourceOverlapMatrix(s: SparkSession, dir: String): DataFrame =
    overlapFrom(sourceGramRel(docs(s, dir)))

  /** Distinct (source, gram-hash) membership — the streaming twin's
    * state ([[StreamingSubstringQueries.streamSourceOverlap]]):
    * set-union mergeable (distinct of an append union), and bounded by
    * |sources| · |gram vocabulary| regardless of corpus volume. */
  private[operators] def sourceGramRel(d: DataFrame): DataFrame =
    d.select(col("source"),
      explode(graft.functions.ShingleOps
        .ngram_hashes(split(col("text"), " "), 3)).as("h"))
      .distinct()

  private[operators] def overlapFrom(ss: DataFrame): DataFrame = {
    val cnt = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = ss.as("a")
      .join(ss.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(cnt.select(col("source").as("source_a"),
        col("n").as("na"))), Seq("source_a"))
      .join(broadcast(cnt.select(col("source").as("source_b"),
        col("n").as("nb"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"),
        col("shared").cast("long").as("shared_shingles"),
        round(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")), 6).as("overlap_jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val sourceOverlapMatrixSql: String =
    """WITH ss AS (
      |  SELECT DISTINCT source, g FROM (
      |    SELECT source, unnest(list_distinct(list_transform(
      |      range(1, len(w) - 1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
      |    FROM (SELECT source, string_split(text, ' ') AS w
      |          FROM documents)
      |    WHERE len(w) >= 3)),
      |cnt AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
      |p AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |         count(*) AS shared
      |  FROM ss a JOIN ss b ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT p.source_a, p.source_b,
      |  CAST(p.shared AS BIGINT) AS shared_shingles,
      |  round(CAST(p.shared AS DOUBLE) / (ca.n + cb.n - p.shared), 6)
      |    AS overlap_jaccard
      |FROM p JOIN cnt ca ON ca.source = p.source_a
      |       JOIN cnt cb ON cb.source = p.source_b
      |ORDER BY p.source_a, p.source_b""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("dedup_substring", dedupSubstring _, Some(dedupSubstringSql)),
      ("dedup_substring_spans", dedupSubstringSpans _,
        Some(dedupSubstringSpansSql)),
      ("dedup_substring_rewrite", dedupSubstringRewrite _,
        Some(dedupSubstringRewriteSql)),
      ("source_overlap_matrix", sourceOverlapMatrix _,
        Some(sourceOverlapMatrixSql)))
}
