package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The point of the Hive-partitioned ORC round-trip is the plan shape:
  * a filter on the partition column must become directory pruning
  * (PartitionFilters on the scan node), never a row-level predicate over
  * a full read, and the projection must prune the read schema to the
  * referenced columns. The value-level correctness of both round-trips
  * is the DuckDB oracle's job (orc_roundtrip / jsonl_roundtrip compare
  * against aggregates over the ORIGINAL parquet).
  */
class FormatSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("format-spec")
    .getOrCreate()

  test("ORC read-back prunes partitions and columns at the scan") {
    val df = FormatQueries.orcRoundtrip(spark, dir)
    val text = df.queryExecution.executedPlan.toString
    val scanIdx = text.indexOf("FileScan orc")
    assert(scanIdx >= 0, s"expected an ORC scan in:\n$text")
    val scan = text.substring(scanIdx)
    // the IN filter landed on the PARTITION index, not the row pipeline
    assert(scan.contains("PartitionFilters: [event_type"),
      s"partition filter missing from the ORC scan:\n$scan")
    // projection pruning: ts and props are never read (check the
    // ReadSchema clause, not the whole node — the tmp PATH contains "ts")
    val readSchema = scan.linesIterator
      .flatMap("""ReadSchema: struct<([^>]*)>""".r
        .findFirstMatchIn(_).map(_.group(1)))
      .mkString
    assert(readSchema.nonEmpty, s"no ReadSchema on the ORC scan:\n$scan")
    assert(!readSchema.contains("ts:") && !readSchema.contains("props:"),
      s"unused columns survive in the ORC read schema: $readSchema")
    // and the pruned read still aggregates the right groups
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("click", "view"))
    assert(rows.forall(_.getAs[Long]("n") > 0))
  }

  test("JSONL read-back prunes the explicit schema to the used columns") {
    val df = FormatQueries.jsonlRoundtrip(spark, dir)
    // the reader got a five-field explicit schema (no inference pass);
    // the scan must then PRUNE it to the three referenced fields — JSON
    // parsing cost is per-field, so unread fields are skipped tokens
    val scan = df.queryExecution.executedPlan.toString
    val idx = scan.indexOf("FileScan json")
    assert(idx >= 0, s"expected a JSON scan in:\n$scan")
    val readSchema = scan.substring(idx).linesIterator
      .flatMap("""ReadSchema: struct<([^>]*)>""".r
        .findFirstMatchIn(_).map(_.group(1)))
      .mkString
    assert(readSchema ==
      "event_type:string,value:double,props:string",
      s"JSON scan schema not pruned to the used columns: $readSchema")
    assert(df.collect().map(_.getAs[Long]("n")).sum > 0)
  }
}
