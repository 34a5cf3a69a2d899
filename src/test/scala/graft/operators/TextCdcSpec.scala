package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the property content-defined chunking EXISTS for: a single
  * inserted word shifts every fixed-chunk boundary after it (so the
  * fixed-chunk query sees two near-identical docs as sharing ~nothing),
  * while CDC boundaries re-align at the next content-defined cut and
  * the shared tail is found. Cross-engine value agreement is the DuckDB
  * oracle's job; this is the semantic contract on a constructed pair.
  */
class TextCdcSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("text-cdc-spec")
    .getOrCreate()

  test("CDC survives a single-word insertion; fixed chunks do not") {
    import spark.implicits._
    // 300 deterministic words → ~18 expected CDC boundaries at rate 1/16
    val base = (0 until 300).map(i => s"w${i * 7 % 113}x$i").mkString(" ")
    val shifted = "INSERTED " + base
    val dir = java.nio.file.Files.createTempDirectory("cdc_spec").toString
    graft.core.TempDirs.cleanOnExit(java.nio.file.Paths.get(dir))
    Seq((0L, base), (1L, shifted)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val cdc = TextQueries.textCdcDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val fixed = TextQueries.textChunkDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap

    // fixed chunking: the insertion shifts every 10-word boundary of
    // doc 1, so the two docs share (at most) noise-level chunks
    assert(fixed(1L) <= 0.15,
      s"fixed chunking unexpectedly robust: ${fixed(1L)}")
    // CDC: boundaries re-align after the first cut past the insertion —
    // the bulk of both docs dedups
    assert(cdc(0L) >= 0.5 && cdc(1L) >= 0.5,
      s"CDC failed to re-align: doc0=${cdc(0L)} doc1=${cdc(1L)}")
    assert(cdc(1L) >= fixed(1L) + 0.3,
      s"CDC (${cdc(1L)}) should beat fixed (${fixed(1L)}) decisively")
  }
}
