package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables

/** Continuous data-quality monitoring — the streaming twin of
  * [[ProfileQueries.dqRules]]: every rule counter is algebraic (sums
  * and a min), so each arriving batch folds ONE one-row partial into
  * the accumulated store and the readout merges by sum/min — the
  * per-rule relation then assembles through the SAME unpivot code path
  * and hash-oracles against the literally-same SQL. This is the
  * always-on shape of a DQ dashboard: counters stay one row per batch
  * regardless of volume, historical raw data is never re-read.
  */
object StreamingDqQueries {

  def streamDq(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val Array(kMin, kMax) = li
      .agg(min(col("l_orderkey")), max(col("l_orderkey")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val b1 = kMin + (kMax - kMin) / 3
    val b2 = kMin + 2 * (kMax - kMin) / 3
    val staging = graft.streaming.StreamingQueries.stageBatches(
      "graft_stream_dq_stage_" + Integer.toHexString(dir.hashCode),
      Seq(li.filter(col("l_orderkey") <= b1),
        li.filter(col("l_orderkey") > b1 && col("l_orderkey") <= b2),
        li.filter(col("l_orderkey") > b2)))

    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_stream_dq_" + Integer.toHexString(dir.hashCode) +
        "_" + ProcessHandle.current().pid())
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    base.mkdirs()
    graft.core.TempDirs.cleanOnExit(base.toPath)
    val store = s"$base/counters"

    val src = s.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", "1").parquet(staging.toString)
    val q = src.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      ProfileQueries.dqAgg(batch).write.mode("append").parquet(store)
      ()
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val merged = s.read.parquet(store)
      .agg(sum(col("n_checked")).as("n_checked"),
        ProfileQueries.dqRuleSet.flatMap { case (n, _) =>
          Seq(sum(col(s"v_$n")).as(s"v_$n"),
            min(col(s"k_$n")).as(s"k_$n"))
        }: _*)
    ProfileQueries.dqUnpivot(merged)
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("stream_dq", streamDq _, Some(ProfileQueries.dqRulesSql)))
}
