package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Table-maintenance operators: the jobs a 100 TB lake runs ON its data
  * layout rather than on the data — here, small-file compaction planning
  * (the `OPTIMIZE`/`rewrite_data_files` primitive of Delta/Iceberg).
  * Streaming ingest and fine partitioning strew kilobyte-scale files;
  * every downstream scan then pays per-file open/seek/footer costs that
  * dwarf the byte cost, so lakes periodically bin-pack small files into
  * target-sized rewrites.
  *
  * [[compactionPlan]] computes the plan relation: logical files (grouped
  * from `documents` by (lang, source, doc_id div 8) with byte sizes from
  * `n_chars`) are packed per lang into target-size bins by the
  * cumulative-sum rule — bin = floor(exclusive-prefix-bytes / target)
  * over a deterministic (source, file_seq) order — exactly the greedy
  * "coalesce adjacent until full" that Spark's own
  * `FilePartition.getFilePartitions` uses for read-side bin-packing.
  * Each output row is one rewrite task: files in, bytes in, docs in.
  *
  * Scale shape: the INPUT is metadata-scale — one row per file (the
  * manifest/catalog listing), not per byte; at 100 TB with 128 MB files
  * that is ~10⁶ rows. The only shuffle is the per-lang cumulative-sum
  * window; parallelism across partition keys (lang here, date/tenant in
  * production), sequential only within one key's file LIST — which is
  * the metadata row count, not data. The plan relation then drives the
  * rewrite job (one task per bin); planning and rewriting stay separate
  * so the expensive pass is restartable and the plan auditable.
  */
object OpsQueries {

  private val filesPerGroup = 8 // docs per logical file (fixture grain)
  private val targetBytes = 4096L // compaction bin target

  def compactionPlan(s: SparkSession, dir: String): DataFrame = {
    val files = Tables(s, dir, "documents")
      .groupBy(col("lang"), col("source"),
        expr(s"doc_id div $filesPerGroup").as("file_seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("source"), col("file_seq"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      // `div` (integral): see LayoutQueries — double division + floor can
      // mis-bucket at exact-quotient boundaries
      .withColumn("pre", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"pre div $targetBytes"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_docs")).as("n_docs"),
        sum(col("bytes")).as("total_bytes"))
      .orderBy(col("lang"), col("bin"))
  }

  val compactionPlanSql: String =
    s"""WITH files AS (
       |  SELECT lang, source, doc_id // $filesPerGroup AS file_seq,
       |         count(*) AS n_docs, sum(n_chars) AS bytes
       |  FROM documents GROUP BY 1, 2, 3),
       |binned AS (
       |  SELECT lang, n_docs, bytes,
       |         coalesce(sum(bytes) OVER (PARTITION BY lang
       |           ORDER BY source, file_seq
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           // $targetBytes AS bin
       |  FROM files)
       |SELECT lang, CAST(bin AS BIGINT) AS bin,
       |       CAST(count(*) AS BIGINT) AS n_files,
       |       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |       CAST(sum(bytes) AS BIGINT) AS total_bytes
       |FROM binned GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("compaction_plan", compactionPlan _, Some(compactionPlanSql)))
}
