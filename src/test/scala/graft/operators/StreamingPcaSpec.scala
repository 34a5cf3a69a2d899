package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming PCA twin's contract: the moment-matrix decomposition
  * (C = n²M − n·S·Sᵀ on the int64 grid) merged over batches must
  * reproduce the batch fit BIT-FOR-BIT — loadings and eigenvalue as
  * exact double equality, not a tolerance. Anything short of that means
  * the sufficient-statistics factoring lost exactness somewhere
  * (a float sum, a decimal overflow, a missed cast) and the twin would
  * drift from its shared oracle under repartitioning. */
class StreamingPcaSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("streaming-pca-spec")
    .getOrCreate()

  test("streamed fit is bit-identical to the batch fit") {
    val batch = EmbeddingQueries.embPcaPower(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val stream = StreamingPcaQueries.streamPcaPower(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(stream.length == batch.length)
    stream.sortBy(_._1).zip(batch.sortBy(_._1)).foreach {
      case ((d1, l1, e1), (d2, l2, e2)) =>
        assert(d1 == d2)
        assert(l1 == l2, s"loading dim $d1: stream $l1 != batch $l2")
        assert(e1 == e2, s"eigenvalue: stream $e1 != batch $e2")
    }
  }
}
