package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Always-on mixture monitoring — the streaming twin of
  * [[TextCorpusQueries.corpusMixRebalance]]: every arriving batch folds
  * into the per-(source, hash-bucket) counter histogram (one
  * map-side-combined aggregate per batch, partials appended to the
  * store), and the readout merges the partials by plain sums before
  * replaying the SAME target-derivation + keep-decision code path the
  * batch operator compiles. The state is bounded at |sources| · 10⁶
  * rows regardless of corpus volume — the bucket modulus, not the data,
  * caps it — and historical documents are never re-read: the int64 keep
  * rule depends only on (bucket, final source totals), so bucket
  * counters are a lossless sufficient statistic for the whole relation.
  * Hash-oracled against literally the batch SQL
  * ([[TextCorpusQueries.corpusMixRebalanceSql]]).
  */
object StreamingMixQueries {

  def streamMixRebalance(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val base = TextCorpusQueries.mixBase(s, dir)
    val staging = stageThirds(
      "graft_stream_mix_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      base, "doc_id")
    val store = s"${scratchDir("graft_stream_mix", dir)}/hist"

    runBatches(s, base.schema, staging) { batch =>
      TextCorpusQueries.mixHist(batch).write.mode("append").parquet(store)
    }

    val merged = s.read.parquet(store)
      .groupBy(col("source"), col("bkt"))
      .agg(sum(col("n_docs_b")).as("n_docs_b"),
        sum(col("n_tokens_b")).as("n_tokens_b"))
    TextCorpusQueries.mixReadout(merged)
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("stream_mix_rebalance", streamMixRebalance _,
      Some(TextCorpusQueries.corpusMixRebalanceSql)))
}
