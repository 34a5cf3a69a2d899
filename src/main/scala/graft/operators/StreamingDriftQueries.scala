package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Always-on distribution-drift monitoring — the streaming twin of
  * [[TextCorpusQueries.textDistDrift]] and a distinct minimal-state
  * class in the maintenance taxonomy: VOCABULARY-sized mergeable
  * counters. Each arriving batch folds into the per-(source, word)
  * count relation with one map-side-combined aggregate; the readout
  * merges by sum and replays the smoothed-KL scoring path (support set,
  * totals, and the KL grid are all derived from the counts alone — raw
  * text is tokenized exactly once, history never re-read). Hash-oracled
  * against literally the batch SQL.
  */
object StreamingDriftQueries {

  def streamDistDrift(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val d = Tables(s, dir, "documents").select(col("doc_id"),
      col("source"), col("text"))
    val staging = stageThirds(
      "graft_stream_drift_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      d, "doc_id")
    val store = s"${scratchDir("graft_stream_drift", dir)}/counts"

    runBatches(s, d.schema, staging) { batch =>
      TextCorpusQueries.srcWordCounts(batch)
        .write.mode("append").parquet(store)
    }

    val merged = s.read.parquet(store)
      .groupBy(col("source"), col("w"))
      .agg(sum(col("c")).as("c"))
    TextCorpusQueries.distDriftFrom(merged)
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("stream_dist_drift", streamDistDrift _,
      Some(TextCorpusQueries.textDistDriftSql)))
}
