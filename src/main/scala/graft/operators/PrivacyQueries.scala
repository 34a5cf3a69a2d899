package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Privacy-audit operators — the compliance gate a training-data
  * pipeline runs before release (Sweeney's k-anonymity, Machanavajjhala
  * et al.'s l-diversity):
  *
  *   - k_anonymity: group the corpus by its quasi-identifier tuple
  *     (source, 100-char size bin — the releasable metadata an attacker
  *     could join on) and flag groups re-identifiable at k < 5 or with
  *     l < 2 distinct values of the sensitive attribute (language — the
  *     stand-in for the column production would protect).
  *   - stream_k_anonymity: the incremental twin. The audit is a pure
  *     function of the (QI, sensitive) COUNTER TABLE, whose partials
  *     from independent batches merge by plain sums, so state is
  *     bounded by |QI| × |sensitive| — the released-schema cardinality,
  *     independent of corpus volume. The readout merges and replays the
  *     batch derivation; hash-oracled against literally the batch SQL.
  *
  * Cross-engine exactness: everything is int64 counting — the size bin
  * is n_chars − n_chars % 100 (pure integer arithmetic; never a float
  * division), k and l are counts, the risk flags integer comparisons.
  *
  * Scale shape: one map-side-combined aggregate at (QI, sensitive)
  * grain, one |QI|-bounded roll-up. l-diversity needs NO count-distinct
  * at corpus grain: the counter table's grain IS (QI, sensitive), so l
  * is a plain count(*) over it.
  */
object PrivacyQueries {

  private val K = 5
  private val L = 2

  /** (source, chars_bin, lang, c) — the sufficient-statistic counter
    * table both the batch query and the streaming twin derive from. */
  private[operators] def qiCounts(d: DataFrame): DataFrame =
    d.select(col("source"),
      (col("n_chars") - col("n_chars") % 100).cast("long").as("chars_bin"),
      col("lang"))
      .groupBy(col("source"), col("chars_bin"), col("lang"))
      .agg(count(lit(1)).as("c"))

  /** Roll the counter table up to QI grain: k = Σc, l = #distinct
    * sensitive values = #rows (the table's grain makes the distinct
    * structural). */
  private[operators] def anonymityReadout(counts: DataFrame): DataFrame =
    counts.groupBy(col("source"), col("chars_bin"))
      .agg(sum(col("c")).as("k_size"), count(lit(1)).as("l_div"))
      .select(col("source"), col("chars_bin"),
        col("k_size").cast("long").as("k_size"),
        col("l_div").cast("long").as("l_div"),
        (col("k_size") < K).as("k_risk"),
        (col("l_div") < L).as("l_risk"))
      .orderBy(col("source"), col("chars_bin"))

  def kAnonymity(s: SparkSession, dir: String): DataFrame =
    anonymityReadout(qiCounts(Tables(s, dir, "documents")))

  val kAnonymitySql: String =
    s"""WITH c AS (
      |  SELECT source, n_chars - n_chars % 100 AS chars_bin, lang,
      |    count(*) AS c
      |  FROM documents GROUP BY 1, 2, 3)
      |SELECT source, CAST(chars_bin AS BIGINT) AS chars_bin,
      |  CAST(sum(c) AS BIGINT) AS k_size,
      |  CAST(count(*) AS BIGINT) AS l_div,
      |  sum(c) < $K AS k_risk,
      |  count(*) < $L AS l_risk
      |FROM c GROUP BY 1, 2 ORDER BY source, chars_bin""".stripMargin

  /** Incremental k-anonymity: per batch, fold one counter partial;
    * readout merges by sum and replays [[anonymityReadout]]. */
  def streamKAnonymity(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
    val staging = stageThirds(
      "graft_stream_kanon_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      d, "doc_id")
    val store = s"${scratchDir("graft_stream_kanon", dir)}/counts"

    runBatches(s, d.schema, staging) { batch =>
      qiCounts(batch).write.mode("append").parquet(store)
    }

    val merged = s.read.parquet(store)
      .groupBy(col("source"), col("chars_bin"), col("lang"))
      .agg(sum(col("c")).as("c"))
    anonymityReadout(merged)
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("k_anonymity", kAnonymity _, Some(kAnonymitySql)),
      ("stream_k_anonymity", streamKAnonymity _, Some(kAnonymitySql)))
}
