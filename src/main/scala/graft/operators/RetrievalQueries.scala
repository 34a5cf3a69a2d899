package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Retrieval-index operators: the inverted-index build and BM25 ranking —
  * what a corpus becomes when it is SERVED rather than filtered, and the
  * backbone of retrieval-augmented training-data pipelines (dense ANN
  * lives in the `ann_*` family; this is the sparse/lexical side).
  *
  * Scale shape: both operators reduce the corpus to (word, doc) grain in
  * one map-side-combined shuffle — the posting-list build IS that
  * aggregation; nothing downstream touches raw text again. Per-term
  * statistics (df, idf) are vocabulary-sized and broadcast; BM25 scoring
  * joins the tiny query-term relation onto the postings (shuffle bounded
  * by matching postings, not the corpus) and top-k plans as
  * TakeOrderedAndProject.
  */
object RetrievalQueries {

  /** Inverted index over `documents`: per word — document frequency,
    * total term frequency, and the first 20 postings (sorted doc ids;
    * the bounded prefix keeps the relation summary-grain — a real index
    * shards full posting lists by range, same layout question as
    * [[LayoutQueries]]). `postings_head` goes out as a '; '-joined STRING
    * (house rule, [[MwasPipelineQueries.condenseQuery]]): the driver's
    * pandas compare can't sort ARRAY cells, and the join is a bijection
    * on the sorted prefix — no information loss. */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    invertedFrom(tfRel(Tables(s, dir, "documents")))

  /** (word, doc_id, tf) postings — the index's grain, and the MERGEABLE
    * state of the streaming twins ([[StreamingRetrievalQueries]]): a
    * document's postings live wholly inside the batch that carries the
    * document, so appended partials are disjoint and merge by sum. */
  private[operators] def tfRel(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"), col("doc_id")).agg(count(lit(1)).as("tf"))

  private[operators] def invertedFrom(tf: DataFrame): DataFrame =
    tf.groupBy(col("w"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"),
        array_join(
          slice(sort_array(collect_list(col("doc_id"))), 1, 20)
            .cast("array<string>"),
          "; ").as("postings_head"))
      .orderBy(col("w"))

  val invertedIndexSql: String =
    """WITH tf AS (
      |  SELECT w, doc_id, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |    FROM documents)
      |  WHERE len(w) > 0 GROUP BY 1, 2)
      |SELECT w, CAST(count(*) AS BIGINT) AS df,
      |       CAST(sum(tf) AS BIGINT) AS tf_total,
      |       array_to_string((list(doc_id ORDER BY doc_id))[1:20]::VARCHAR[],
      |         '; ') AS postings_head
      |FROM tf GROUP BY w ORDER BY w""".stripMargin

  /** BM25 ranking (k1 = 1.2, b = 0.75) of the corpus against a
    * deterministic 3-term query (the words ranked 11–13 by document
    * frequency, ties on word — mid-frequency terms, where BM25's idf and
    * length normalization actually discriminate; a fixed literal query
    * would pin the relation to one fixture). idf is the standard
    * ln((N − df + 0.5)/(df + 0.5) + 1) ≥ 0 form. Top 20 by
    * (score, doc_id) — the 3-term float sum follows the house K-term
    * rounding precedent. */
  def bm25Search(s: SparkSession, dir: String): DataFrame =
    bm25From(tfRel(Tables(s, dir, "documents")))

  /** BM25 from the postings relation alone: doc length is the postings'
    * own row-sum (dl = Σ_w tf), so the scoring pipeline needs NO second
    * pass over raw text — which is exactly what lets the streaming twin
    * score from its accumulated index without re-reading history. */
  /** The deterministic 3-term query shared by every ranking in this
    * file: words ranked 11–13 by document frequency (ties on word). One
    * definition so BM25 and the fusion rankings can never drift onto
    * different queries. */
  private[operators] def queryTerms(df: DataFrame): DataFrame =
    df.orderBy(col("df").desc, col("w")).limit(13)
      .orderBy(col("df"), col("w")).limit(3) // ranks 11–13

  private[operators] def bm25From(tf: DataFrame): DataFrame = {
    val (k1, b) = (1.2, 0.75)
    val dlen = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val scalars = dlen.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val qterms = queryTerms(df)
    val scored = tf
      .join(broadcast(qterms), Seq("w"))
      .join(dlen, Seq("doc_id"))
      .crossJoin(broadcast(scalars))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("contrib")), 6).as("score"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(20)
  }

  val bm25SearchSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |tf0 AS (SELECT w, doc_id, count(*) AS tf FROM t
      |        WHERE len(w) > 0 GROUP BY 1, 2),
      |dlen AS (SELECT doc_id, count(*) AS dl FROM t
      |         WHERE len(w) > 0 GROUP BY 1),
      |sc AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen),
      |df AS (SELECT w, count(*) AS df FROM tf0 GROUP BY 1),
      |q AS (SELECT w, df FROM (
      |        SELECT w, df FROM df ORDER BY df DESC, w LIMIT 13)
      |      ORDER BY df, w LIMIT 3),
      |contrib AS (
      |  SELECT tf0.doc_id,
      |    ln((sc.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0) *
      |      (tf0.tf * (1.2 + 1.0)) /
      |      (tf0.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dl / sc.avgdl))
      |      AS c
      |  FROM tf0 JOIN q ON tf0.w = q.w
      |  JOIN dlen ON tf0.doc_id = dlen.doc_id CROSS JOIN sc)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
      |       round(sum(c), 6) AS score
      |FROM contrib GROUP BY doc_id
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** Hybrid-retrieval rank fusion (RRF, Cormack et al. SIGIR'09): the
    * same 3-term query ranked two ways — BM25 and summed TF-IDF (the
    * [[TextQueries.textTfidf]] score aggregated over the query's terms) —
    * then fused by reciprocal rank, rrf = Σ_r 1/(60 + rank_r), the
    * standard sparse+second-signal hybrid a RAG stack runs. Ranks are
    * assigned over (round-6 score DESC, doc_id) so rank assignment is
    * deterministic cross-engine; the RRF sum is two correctly-rounded
    * divisions of small-integer operands added once — bit-identical by
    * IEEE, no accumulation-order hazard. Docs outside a ranking's top 20
    * contribute 0 from that ranking (the standard cut-off form).
    *
    * Scale shape: both rankings derive from the ONE (word, doc) postings
    * aggregation (localCheckpoint'd — two consumers); per-ranking work is
    * bounded by the query's matching postings; the fusion join is top-20
    * × top-20. */
  def rankFusion(s: SparkSession, dir: String): DataFrame =
    rankFusionFrom(tfRel(Tables(s, dir, "documents")))

  /** Fusion from the postings relation alone (no text pass) — which is
    * what lets the streaming twin fuse over its accumulated index. */
  private[operators] def rankFusionFrom(tf0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = tf0.localCheckpoint() // both rankings read it
    val dfRel = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val qterms = queryTerms(dfRel)
    val dlen = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val scalars = dlen.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val (k1, b) = (1.2, 0.75)

    val bm25 = tf.join(broadcast(qterms), Seq("w"))
      .join(dlen, Seq("doc_id"))
      .crossJoin(broadcast(scalars))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("score_bm25"))

    val tfidf = tf.join(broadcast(qterms), Seq("w"))
      .join(dlen, Seq("doc_id"))
      .crossJoin(broadcast(scalars))
      .withColumn("contrib",
        (col("tf") * col("n_docs")).cast("double") /
          (col("dl") * col("df")))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("score_tfidf"))

    def ranked(d: DataFrame, score: String, rank: String): DataFrame =
      d.withColumn(rank, row_number().over(
          Window.orderBy(col(score).desc, col("doc_id"))).cast("long"))
        .filter(col(rank) <= 20)

    ranked(bm25, "score_bm25", "rank_bm25")
      .join(ranked(tfidf, "score_tfidf", "rank_tfidf"), Seq("doc_id"),
        "full_outer")
      .withColumn("rrf",
        round(coalesce(lit(1.0) / (lit(60) + col("rank_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rank_tfidf")), lit(0.0)), 6))
      .select(col("doc_id"), col("rank_bm25"), col("rank_tfidf"),
        col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  val rankFusionSql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |tf0 AS (SELECT w, doc_id, count(*) AS tf FROM t
      |        WHERE len(w) > 0 GROUP BY 1, 2),
      |dlen AS (SELECT doc_id, sum(tf) AS dl FROM tf0 GROUP BY 1),
      |sc AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen),
      |dfr AS (SELECT w, count(*) AS df FROM tf0 GROUP BY 1),
      |q AS (SELECT w, df FROM (
      |        SELECT w, df FROM dfr ORDER BY df DESC, w LIMIT 13)
      |      ORDER BY df, w LIMIT 3),
      |bm AS (
      |  SELECT tf0.doc_id, round(sum(
      |    ln((sc.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0) *
      |    (tf0.tf * (1.2 + 1.0)) /
      |    (tf0.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlen.dl / sc.avgdl))), 6)
      |    AS score_bm25
      |  FROM tf0 JOIN q ON tf0.w = q.w
      |  JOIN dlen ON tf0.doc_id = dlen.doc_id CROSS JOIN sc
      |  GROUP BY tf0.doc_id),
      |ti AS (
      |  SELECT tf0.doc_id, round(sum(
      |    CAST(tf0.tf * sc.n_docs AS DOUBLE) / (dlen.dl * q.df)), 6)
      |    AS score_tfidf
      |  FROM tf0 JOIN q ON tf0.w = q.w
      |  JOIN dlen ON tf0.doc_id = dlen.doc_id CROSS JOIN sc
      |  GROUP BY tf0.doc_id),
      |rb AS (SELECT doc_id, CAST(row_number() OVER
      |         (ORDER BY score_bm25 DESC, doc_id) AS BIGINT) AS rank_bm25
      |       FROM bm QUALIFY rank_bm25 <= 20),
      |rt AS (SELECT doc_id, CAST(row_number() OVER
      |         (ORDER BY score_tfidf DESC, doc_id) AS BIGINT) AS rank_tfidf
      |       FROM ti QUALIFY rank_tfidf <= 20)
      |SELECT COALESCE(rb.doc_id, rt.doc_id) AS doc_id,
      |       rb.rank_bm25, rt.rank_tfidf,
      |       round(COALESCE(1.0 / (60 + rb.rank_bm25), 0.0) +
      |             COALESCE(1.0 / (60 + rt.rank_tfidf), 0.0), 6) AS rrf
      |FROM rb FULL OUTER JOIN rt ON rb.doc_id = rt.doc_id
      |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("inverted_index", invertedIndex _, Some(invertedIndexSql)),
      ("bm25_search", bm25Search _, Some(bm25SearchSql)),
      ("retrieval_rank_fusion", rankFusion _, Some(rankFusionSql)))
}
