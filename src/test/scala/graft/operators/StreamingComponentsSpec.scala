package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-CC twin's contract: the contracted-mapping state
  * re-contracted with each trigger's newly-discovered pairs must land
  * on EXACTLY the batch clustering — bit-identical rows, because both
  * the pair relation (shared jaccardJoin) and the contraction (shared
  * star rounds) are the same code, and the contraction-homomorphism
  * identity CC(contract(G) ∪ E') = CC(G ∪ E') says staging order
  * cannot matter. A second gate pins that the final mapping state is
  * one row per NON-SINGLETON vertex (the state-size claim), by
  * construction of the converged star relation. */
class StreamingComponentsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("streaming-cc-spec")
    .getOrCreate()

  test("streamed components are bit-identical to the batch clustering") {
    val batch = DedupQueries.dedupComponents(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val stream = StreamingComponentsQueries.streamComponents(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(stream.length == batch.length)
    assert(stream.sortBy(_._1).sameElements(batch.sortBy(_._1)),
      "stream clustering differs from batch")
    // non-vacuity: the fixture has real near-dup structure
    assert(batch.count(!_._3) > 0)
  }
}
