package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val li = Tables(s, dir, "lineitem")
    val staging = stageThirds(
      "graft_stream_dq_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      li, "l_orderkey")
    val store = s"${scratchDir("graft_stream_dq", dir)}/counters"

    runBatches(s, li.schema, staging) { batch =>
      ProfileQueries.dqAgg(batch).write.mode("append").parquet(store)
    }

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
