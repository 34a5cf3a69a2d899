package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental heavy hitters — the count–min sketch run the way it is
  * actually deployed: per arriving batch, compute that batch's token
  * partials ONCE, fold them into the accumulated sketch, and never touch
  * historical raw data again. The CMS is the canonical mergeable sketch —
  * every counter is a sum, so "merge" is literally `sum` over per-batch
  * partial grids, and the accumulated state is a FIXED d×w array no
  * matter how many terabytes have streamed through. The exact per-token
  * partial store rides along as the verification arm (vocabulary-sized;
  * at production scale it is replaced by a per-partition Misra–Gries
  * candidate pass and only the sketch remains — that substitution is the
  * entire point of the sketch).
  *
  * Lives in `graft.operators` to share [[SketchQueries]]'s
  * package-private pieces: per-batch partials are
  * [[SketchQueries.tokenCounts]]/[[SketchQueries.counterGrid]] over one
  * batch, and the final relation is assembled by the SAME
  * [[SketchQueries.estimates]] code path the batch query ends in — which
  * is why the stream hash-oracles against the literally-same SQL
  * ([[SketchQueries.heavyHittersSql]]): sums of per-batch sums equal the
  * one-shot sums, bit-for-bit, because the counters are integers.
  *
  * Determinism: batches staged as single files with pinned ascending
  * mtimes, `maxFilesPerTrigger=1`, `Trigger.AvailableNow` — the house
  * deterministic-replay harness ([[StreamingDedupQueries]]).
  */
object StreamingSketchQueries {

  def streamHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(s, dir).select(col("doc_id"), col("text"))
    val (idMin, idMax) = graft.streaming.StreamingQueries.idRange(d, "doc_id")
      .getOrElse(throw new IllegalArgumentException(
        "empty input relation: nothing to stream"))
    val b1 = idMin + (idMax - idMin) / 3
    val b2 = idMin + 2 * (idMax - idMin) / 3
    val staging = graft.streaming.StreamingQueries.stageBatches(
      "graft_stream_cms_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      Seq(d.filter(col("doc_id") <= b1),
        d.filter(col("doc_id") > b1 && col("doc_id") <= b2),
        d.filter(col("doc_id") > b2)))

    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      "graft_stream_cms_" + graft.streaming.StreamingQueries.pathTag(dir) +
        "_" + ProcessHandle.current().pid())
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    base.mkdirs()
    graft.core.TempDirs.cleanOnExit(base.toPath)
    val countsDir = s"$base/counts"
    val gridDir = s"$base/grid"

    val src = s.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(staging.toString)
    val q = src.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      // one pass over the batch: token partials, then the partial grid
      // FROM the partials (linearity — the raw batch feeds nothing twice)
      val part = SketchQueries.tokenCounts(batch).localCheckpoint(true)
      part.write.mode("append").parquet(countsDir)
      SketchQueries.counterGrid(part).write.mode("append").parquet(gridDir)
      ()
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // merge = sum of partials on both stores (integer, order-free), then
    // the SAME assembly code path as the batch query
    val ss = s
    val counts = ss.read.parquet(countsDir)
      .groupBy(col("token")).agg(sum(col("exact_cnt")).as("exact_cnt"))
    val grid = ss.read.parquet(gridDir)
      .groupBy(col("seed"), col("bucket")).agg(sum(col("c")).as("c"))
    SketchQueries.estimates(counts, grid)
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("stream_heavy_hitters", streamHeavyHitters _,
      Some(SketchQueries.heavyHittersSql)))
}
