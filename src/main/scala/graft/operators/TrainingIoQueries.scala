package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Training-loader I/O assignment — the last hop of a curation
  * pipeline: hand every document a deterministic (epoch, shard,
  * position) so N dataloader workers stream disjoint, per-epoch
  * re-shuffled slices with zero coordination. The epoch-salted portable
  * hash IS the shuffle: order by it within a shard and two runs — and
  * both engines — produce the identical byte stream, while epochs
  * decorrelate because the salt changes the hash, not a seed table.
  *
  * Scale shape: per-row hash, then ONE window per (epoch, shard)
  * partition — the window's exchange+sort is precisely the
  * distributed shuffle being asked for, so nothing is wasted; shard
  * count is the parallelism knob and each partition sorts only its own
  * slice. At 100 TB this is the standard range-partition + sort-within
  * export plan.
  */
object TrainingIoQueries {

  private val NShards = 8

  def corpusShuffleAssign(s: SparkSession, dir: String): DataFrame = {
    val key = graft.functions.PortableHash.raw(
      concat(col("doc_id").cast("string"), lit(":"),
        col("epoch").cast("string")))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("key"), col("doc_id"))
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(array(lit(0), lit(1))).as("epoch"))
      .withColumn("key", key)
      .withColumn("shard", (col("key") % NShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("epoch").cast("long").as("epoch"), col("shard"),
        col("doc_id"), col("pos"))
      .orderBy(col("epoch"), col("shard"), col("pos"))
  }

  val corpusShuffleAssignSql: String =
    """WITH e AS (
      |  SELECT doc_id, epoch
      |  FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS epoch)),
      |k AS (
      |  SELECT doc_id, epoch,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
      |      CAST(epoch AS VARCHAR)), 1, 15)) AS BIGINT) AS key
      |  FROM e)
      |SELECT CAST(epoch AS BIGINT) AS epoch,
      |  CAST(key % 8 AS BIGINT) AS shard,
      |  doc_id,
      |  CAST(row_number() OVER (PARTITION BY epoch, key % 8
      |    ORDER BY key, doc_id) AS BIGINT) AS pos
      |FROM k ORDER BY epoch, shard, pos""".stripMargin

  // ------------------------------------ custom physical operator surface

  /** Per-user top-5 events by value — the registry face of the
    * [[graft.plans.TopKPerGroup]] custom operator (logical node +
    * planner strategy + two-phase bounded-heap exec): the partial stage
    * keeps ≤ 5 rows per (partition, user) BEFORE the exchange, and the
    * heaps replace the two per-partition sorts Spark's own
    * WindowGroupLimit rewrite of the stock spelling still pays (the
    * honest A/B is in the operator's scaladoc). The oracle IS that
    * stock spelling, so the hash compare doubles as the operator's
    * semantic proof. Deterministic ties via the event_id tiebreak. */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"))
    graft.plans.TopK.perGroup(e,
        Seq(col("user_id")),
        Seq(col("value").desc, col("event_id").asc), 5)
      .orderBy(col("user_id"), col("value").desc, col("event_id"))
  }

  val topkPerGroupSql: String =
    """SELECT user_id, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id) AS rn
      |  FROM events)
      |WHERE rn <= 5
      |ORDER BY user_id, value DESC, event_id""".stripMargin

  /** Incremental per-group top-k — the custom operator's streaming
    * twin, and the cleanest possible maintenance state: bounded heaps
    * are MERGEABLE (top-k(A ∪ B) = top-k(top-k(A) ∪ top-k(B))), so
    * each batch appends its own top-5-per-user remnant (≤ users·5
    * rows) and the readout runs the same operator over the accumulated
    * remnants — state is output-sized, history never re-read, and the
    * oracle is literally the batch query's stock window spelling. */
  def streamTopk(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val e = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val staging = stageThirds(
      "graft_stream_topk_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      e, "event_id")
    val store = s"${scratchDir("graft_stream_topk", dir)}/heaps"

    runBatches(s, e.schema, staging) { batch =>
      graft.plans.TopK.perGroup(batch, Seq(col("user_id")),
          Seq(col("value").desc, col("event_id").asc), 5)
        .write.mode("append").parquet(store)
    }

    graft.plans.TopK.perGroup(s.read.parquet(store),
        Seq(col("user_id")), Seq(col("value").desc, col("event_id").asc), 5)
      .select(col("user_id"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("value").desc, col("event_id"))
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("corpus_shuffle_assign", corpusShuffleAssign _,
        Some(corpusShuffleAssignSql)),
      ("topk_per_group", topkPerGroup _, Some(topkPerGroupSql)),
      ("stream_topk", streamTopk _, Some(topkPerGroupSql)))
}
