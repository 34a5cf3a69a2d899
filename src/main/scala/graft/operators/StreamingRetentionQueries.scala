package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Events

/** Incremental cohort retention — the third exact streaming
  * decomposition, for DISTINCT-shaped state: the whole cohort matrix is
  * a function of the distinct (user, active-day) relation, and distinct
  * is mergeable (distinct-of-union ≡ union-of-distincts), so each batch
  * appends only ITS distinct user-days and the readout re-distincts the
  * store — never the historical raw events. State is users × horizon
  * days, exactly the activity table a warehouse materializes anyway;
  * per-batch work is one map-side distinct of the batch.
  *
  * The readout runs the SAME [[BehaviorQueries.retentionFrom]] code
  * path as the batch query, so the stream hash-oracles against the
  * literally-same SQL ([[BehaviorQueries.retentionCohortsSql]]). Note
  * the cohort day itself can MOVE as earlier batches arrive — min is
  * re-derived from the store at readout, which is what makes the
  * decomposition exact where a frozen-cohort accumulator would drift.
  */
object StreamingRetentionQueries {

  def streamRetention(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val ev = Events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"))
    val staging = stageThirds(
      "graft_stream_ret_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      ev, "event_id")
    val store = s"${scratchDir("graft_stream_ret", dir)}/user_days"

    runBatches(s, ev.schema, staging) { batch =>
      batch.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .write.mode("append").parquet(store)
    }

    BehaviorQueries.retentionFrom(
      s.read.parquet(store).select(col("user_id"), col("day")).distinct())
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("stream_retention", streamRetention _,
      Some(BehaviorQueries.retentionCohortsSql)))
}
