package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Events

/** Incremental funnel — the FILTERED-PROJECTION state class: funnel
  * step-k conversion depends on step-(k−1)'s conversion INSTANT, which
  * can move as earlier data arrives, so no fixed-size accumulator is
  * exact; the minimal exact state is the stream filtered to the three
  * funnel event types and projected to (user_id, event_type, ts). Each
  * batch appends only its filtered projection (per-batch work and
  * state growth ∝ funnel-relevant events — at production scale a small
  * slice of the stream, and the projection drops every other column);
  * the readout runs the SAME [[BehaviorQueries.funnelFrom]] code path,
  * so the stream hash-oracles against the literally-same SQL.
  *
  * This completes the streaming-maintenance taxonomy: sufficient
  * statistics (experiment), mergeable distinct (retention), algebraic
  * counters (dq), junction store (markov), filtered projection
  * (funnel) — each the MINIMAL exact state for its query class.
  */
object StreamingFunnelQueries {

  private val steps = BehaviorQueries.funnelSteps

  def streamFunnel(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val ev = Events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"))
    val staging = stageThirds(
      "graft_stream_fnl_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      ev, "event_id")
    val store = s"${scratchDir("graft_stream_fnl", dir)}/funnel_events"

    runBatches(s, ev.schema, staging) { batch =>
      batch.filter(col("event_type").isin(steps: _*))
        .select(col("user_id"), col("event_type"), col("ts"))
        .write.mode("append").parquet(store)
    }

    BehaviorQueries.funnelFrom(s.read.parquet(store))
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("stream_funnel", streamFunnel _,
      Some(BehaviorQueries.funnelConversionSql)))
}
