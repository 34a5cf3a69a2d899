package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

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
    val ev = Events(s, dir)
      .select(col("event_id"), col("ts"), col("user_id"))
    val Array(idMin, idMax) = ev
      .agg(min(col("event_id")), max(col("event_id")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val b1 = idMin + (idMax - idMin) / 3
    val b2 = idMin + 2 * (idMax - idMin) / 3
    val staging = graft.streaming.StreamingQueries.stageBatches(
      "graft_stream_ret_stage_" + Integer.toHexString(dir.hashCode),
      Seq(ev.filter(col("event_id") <= b1),
        ev.filter(col("event_id") > b1 && col("event_id") <= b2),
        ev.filter(col("event_id") > b2)))

    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_stream_ret_" + Integer.toHexString(dir.hashCode) +
        "_" + ProcessHandle.current().pid())
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    base.mkdirs()
    graft.core.TempDirs.cleanOnExit(base.toPath)
    val store = s"$base/user_days"

    val src = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(staging.toString)
    val q = src.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .write.mode("append").parquet(store)
      ()
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    BehaviorQueries.retentionFrom(
      s.read.parquet(store).select(col("user_id"), col("day")).distinct())
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("stream_retention", streamRetention _,
      Some(BehaviorQueries.retentionCohortsSql)))
}
