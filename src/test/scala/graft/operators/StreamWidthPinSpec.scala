package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Regression gate for the streaming stores' file-parallelism cliff
  * (r16 continuation): the staged micro-batch is ONE parquet file, and
  * the components / curation / phash streams reach their signature
  * stores through narrow operators only — so WITHOUT the explicit
  * trigger-start `repartition(defaultParallelism)` each store subdir is
  * written as one file, and every later trigger's map-side store-probe
  * CPU (where the quadratic-in-occupancy candidate mass lives) runs at
  * file-count parallelism. Measured at 100× docs the pin is worth
  * 156→50 s (components), 161→45 s (phash), 84→30 s (curation).
  *
  * The gate: after a run, every per-batch store subdir must hold MORE
  * parquet files than the single staged input file — i.e. the width
  * pin reached the store layout. Silent removal of the repartition
  * would flip these back to 1 file per subdir. */
class StreamWidthPinSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("stream-width-pin-spec")
    .getOrCreate()

  /** Parquet part-file counts of every `b*` subdir under a state base
    * (the pid-scoped tmp layout all three streams share). */
  private def subdirFileCounts(name: String, sub: String): Seq[Int] = {
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      name + "_" + graft.streaming.StreamingQueries.pathTag(dir) +
        "_" + ProcessHandle.current().pid())
    val store = new java.io.File(base, sub)
    val subs = Option(store.listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory)
    assert(subs.nonEmpty, s"no store subdirs under $store — layout moved?")
    subs.toSeq.map(d =>
      d.listFiles().count(_.getName.endsWith(".parquet")))
  }

  test("phash stream: the width pin reaches every store subdir") {
    StreamingPhashQueries.streamPhashDedup(spark, dir).collect()
    val counts = subdirFileCounts("graft_stream_ph", "sig")
    assert(counts.forall(_ > 1),
      s"store subdir written at file-count width: $counts files/subdir")
  }

  test("components stream: the width pin reaches every store subdir") {
    StreamingComponentsQueries.streamComponents(spark, dir).collect()
    val counts = subdirFileCounts("graft_stream_cc", "sig")
    assert(counts.forall(_ > 1),
      s"store subdir written at file-count width: $counts files/subdir")
  }

  test("curation stream: the width pin reaches every store subdir") {
    StreamingCurationQueries.streamCorpusPipeline(spark, dir).collect()
    val counts = subdirFileCounts("graft_stream_cur", "sig")
    assert(counts.forall(_ > 1),
      s"store subdir written at file-count width: $counts files/subdir")
  }
}
