package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Incremental cross-document repeated-substring monitoring — the
  * streaming twin of [[SubstringQueries.dedupSubstring]]: each arriving
  * batch of documents is shingled exactly once (the native NgramHashes
  * loop) and its (doc_id, shingle-hash) rows appended to the store — a
  * document's shingles live wholly inside its batch, so the partials are
  * disjoint and the append IS the merge, with no readout re-aggregation.
  * The readout replays the SAME stats + join-back code path the batch
  * operator compiles, against literally the batch SQL.
  *
  * State is the shingle-occurrence relation itself — the operator's own
  * working grain (token-sized, like the retrieval twins' postings store):
  * raw text is never re-read, and the per-gram stats that make old
  * documents' coverage change when NEW collisions arrive are recomputed
  * only from the compact hash relation, not from text.
  */
object StreamingSubstringQueries {

  def streamSubstring(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val staging = stageThirds(
      "graft_stream_substr_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      d, "doc_id")
    val store = s"${scratchDir("graft_stream_substr", dir)}/shingles"

    runBatches(s, d.schema, staging) { batch =>
      SubstringQueries.shingleRel(batch)
        .write.mode("append").parquet(store)
    }

    SubstringQueries.substringFrom(s.read.parquet(store))
  }

  /** Incremental provenance matrix — the streaming twin of
    * [[SubstringQueries.sourceOverlapMatrix]] and the distinct-set-union
    * state class: each batch appends its own distinct (source,
    * gram-hash) membership rows; the accumulated set is re-distinct'd
    * at readout (set union IS the merge) and the same pairing/count
    * code path runs over it. State is bounded by
    * |sources| · |gram vocabulary| — it stops growing once every
    * source has shown its vocabulary, no matter how much more corpus
    * streams past. */
  def streamSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val d = Tables(s, dir, "documents").select(col("doc_id"),
      col("source"), col("text"))
    val staging = stageThirds(
      "graft_stream_srcov_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      d, "doc_id")
    val store = s"${scratchDir("graft_stream_srcov", dir)}/membership"

    runBatches(s, d.schema, staging) { batch =>
      SubstringQueries.sourceGramRel(batch)
        .write.mode("append").parquet(store)
    }

    SubstringQueries.overlapFrom(s.read.parquet(store).distinct())
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("stream_substring", streamSubstring _,
        Some(SubstringQueries.dedupSubstringSql)),
      ("stream_source_overlap", streamSourceOverlap _,
        Some(SubstringQueries.sourceOverlapMatrixSql)))
}
