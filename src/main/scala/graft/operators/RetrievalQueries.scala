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
  private[operators] def bm25From(tf: DataFrame): DataFrame = {
    val (k1, b) = (1.2, 0.75)
    val dlen = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val scalars = dlen.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val qterms = df
      .orderBy(col("df").desc, col("w")).limit(13)
      .orderBy(col("df"), col("w")).limit(3) // ranks 11–13
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

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("inverted_index", invertedIndex _, Some(invertedIndexSql)),
      ("bm25_search", bm25Search _, Some(bm25SearchSql)))
}
