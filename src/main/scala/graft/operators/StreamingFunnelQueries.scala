package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

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

  private val steps = Seq("view", "click", "purchase")

  def streamFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"))
    val Array(idMin, idMax) = ev
      .agg(min(col("event_id")), max(col("event_id")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val b1 = idMin + (idMax - idMin) / 3
    val b2 = idMin + 2 * (idMax - idMin) / 3
    val staging = graft.streaming.StreamingQueries.stageBatches(
      "graft_stream_fnl_stage_" + Integer.toHexString(dir.hashCode),
      Seq(ev.filter(col("event_id") <= b1),
        ev.filter(col("event_id") > b1 && col("event_id") <= b2),
        ev.filter(col("event_id") > b2)))

    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_stream_fnl_" + Integer.toHexString(dir.hashCode) +
        "_" + ProcessHandle.current().pid())
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    base.mkdirs()
    graft.core.TempDirs.cleanOnExit(base.toPath)
    val store = s"$base/funnel_events"

    val src = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(staging.toString)
    val q = src.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.filter(col("event_type").isin(steps: _*))
        .select(col("user_id"), col("event_type"), col("ts"))
        .write.mode("append").parquet(store)
      ()
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    BehaviorQueries.funnelFrom(s.read.parquet(store))
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("stream_funnel", streamFunnel _,
      Some(BehaviorQueries.funnelConversionSql)))
}
