package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the training-loader assignment and the
  * dimension-health diagnostic. */
class TrainingIoSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("training-io-spec")
    .getOrCreate()

  test("corpus_shuffle_assign: partition, contiguity, epoch decorrelation") {
    val dir = "/root/testdata/sf0.001"
    val rows = TrainingIoQueries.corpusShuffleAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = rows.map(_._3).distinct.length
    // every doc appears exactly once per epoch
    assert(rows.length == 2 * nDocs)
    assert(rows.groupBy(r => (r._1, r._3)).values.forall(_.length == 1))
    // positions are 1..n contiguous within each (epoch, shard)
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, rs) =>
      val ps = rs.map(_._4).sorted.toSeq
      assert(ps == (1L to ps.length).toSeq,
        s"non-contiguous positions in $k")
    }
    // shards are hash-balanced: no shard holds more than 2x its share
    val sizes = rows.filter(_._1 == 0L).groupBy(_._2).values.map(_.length)
    assert(sizes.max <= 2 * nDocs / 8, s"imbalanced shards: $sizes")
    // epochs decorrelate: a solid majority of docs change shard between
    // epoch 0 and 1 (expected 7/8 under a fresh hash)
    val byDoc = rows.groupBy(_._3).values
    val moved = byDoc.count(rs =>
      rs.find(_._1 == 0L).get._2 != rs.find(_._1 == 1L).get._2)
    assert(moved >= (nDocs * 0.7).toInt, s"epochs correlated: $moved/$nDocs")
  }

  test("emb_dim_stats: dead dimension flagged, moments exact on constants") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dimstats_spec").toString
    graft.core.TempDirs.cleanOnExit(java.nio.file.Paths.get(dir))
    // dim 0 constant 2.0 (dead, dyadic); dim 1 alternates 0/4 (mean 2,
    // sd 2); dim 2 constant 0.1f — NON-dyadic, so sxx/n − mean² is FP
    // residual, not exact zero: the case that NaNs without the
    // greatest(…, 0) variance clamp
    def vec(i: Int) = Seq.tabulate(64) {
      case 0 => 2.0f
      case 1 => if (i % 2 == 0) 0.0f else 4.0f
      case 2 => 0.1f
      case d => (d * (i + 1) % 7).toFloat
    }
    (0 until 10).map(i => (i.toLong, vec(i), 0))
      .toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = EmbeddingQueries.embDimStats(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getBoolean(5)))).toMap
    assert(out(0L) == ((2.0, 0.0, true)), s"dim0=${out(0L)}")
    assert(out(1L) == ((2.0, 2.0, false)), s"dim1=${out(1L)}")
    val (m2, sd2, dead2) = out(2L)
    assert(math.abs(m2 - 0.1) < 1e-6 && sd2 == 0.0 && dead2,
      s"non-dyadic dead dim: ${out(2L)}")
    assert(!out(5L)._3)
  }
}
