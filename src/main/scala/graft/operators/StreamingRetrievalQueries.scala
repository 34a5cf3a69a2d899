package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Incremental search-index maintenance — the streaming twins of
  * [[RetrievalQueries]]: each arriving batch of documents folds into the
  * (word, doc_id, tf) postings store with ONE map-side-combined aggregate
  * (a document's postings live wholly inside its batch, so partials are
  * disjoint and the append IS the merge — the defensive sum re-aggregate
  * at readout is idempotent), and the readouts replay the SAME
  * index-build / scoring code paths the batch operators compile, against
  * literally the same DuckDB SQL.
  *
  * This is the segment-merge shape of a real lexical index: raw text is
  * tokenized exactly once, history is never re-read, and everything
  * downstream of the postings — df, idf, avgdl, BM25 — is either
  * vocabulary-sized or bounded by the query's matching postings.
  */
object StreamingRetrievalQueries {

  /** Accumulated postings from a 3-batch replay over `documents`. */
  private def postingsStore(s: SparkSession, dir: String,
      tag: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val staging = stageThirds(
      s"graft_stream_${tag}_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      d, "doc_id")
    val store = s"${scratchDir(s"graft_stream_$tag", dir)}/postings"
    runBatches(s, d.schema, staging) { batch =>
      RetrievalQueries.tfRel(batch).write.mode("append").parquet(store)
    }
    s.read.parquet(store)
      .groupBy(col("w"), col("doc_id")).agg(sum(col("tf")).as("tf"))
  }

  def streamInvertedIndex(s: SparkSession, dir: String): DataFrame =
    RetrievalQueries.invertedFrom(postingsStore(s, dir, "invidx"))

  def streamBm25Search(s: SparkSession, dir: String): DataFrame =
    RetrievalQueries.bm25From(postingsStore(s, dir, "bm25"))

  /** Incremental hybrid retrieval: the RRF fusion readout replays
    * [[RetrievalQueries.rankFusionFrom]] over the same accumulated
    * postings state — one more consumer of the one store, nothing new
    * maintained. */
  def streamRankFusion(s: SparkSession, dir: String): DataFrame =
    RetrievalQueries.rankFusionFrom(postingsStore(s, dir, "fusion"))

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("stream_inverted_index", streamInvertedIndex _,
        Some(RetrievalQueries.invertedIndexSql)),
      ("stream_bm25_search", streamBm25Search _,
        Some(RetrievalQueries.bm25SearchSql)),
      ("stream_rank_fusion", streamRankFusion _,
        Some(RetrievalQueries.rankFusionSql)))
}
