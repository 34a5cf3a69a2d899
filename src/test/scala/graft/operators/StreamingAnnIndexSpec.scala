package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the incremental PQ index (`stream_ann_index`):
  *
  *   1. STREAM == BATCH, row for row — per-vector encoding under the
  *      frozen codebook makes the accumulated code store row-identical
  *      to the batch encode, so the ADC search over it must equal
  *      [[IvfQueries.annPqAdc]] exactly (which also transitively
  *      checks the codebook-trains-once write and the store
  *      round-trip).
  *   2. The maintenance is genuinely incremental: results include
  *      neighbors whose vectors arrived in triggers AFTER the queries'
  *      own (queries are vec_id < 5, staged first) — search reads the
  *      whole accumulated store, not the first batch.
  */
class StreamingAnnIndexSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("streaming-ann-index-spec")
    .getOrCreate()

  test("incremental PQ index search equals the one-shot batch ADC; " +
      "late-arriving vectors are searchable") {
    val stream = StreamingAnnIndexQueries.streamAnnIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val batch = IvfQueries.annPqAdc(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(stream.toSeq == batch.toSeq,
      "incremental index search diverged from the batch ADC")

    // the top-10 lists must reach vectors from the LAST third of the
    // id range — i.e. vectors that arrived after the query vectors'
    // trigger — otherwise the readout silently searched a prefix store
    val maxId = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .agg(org.apache.spark.sql.functions.max("vec_id"))
      .head().getLong(0)
    assert(stream.exists(_._3 > maxId * 2 / 3),
      "no late-arriving vector in any top-10: store looks truncated")
  }
}
