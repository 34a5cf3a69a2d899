package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics gate for the deterministic k-means fit: the hash oracle
  * proves Spark and DuckDB agree; THIS proves the agreed relation is
  * actually 3 Lloyd rounds + a final assignment — the spec replays the
  * identical ladder in plain in-memory Scala (Long arithmetic, the same
  * round-half-away mean) and compares every (vec_id, cell, dist2) cell.
  * A tie broken the wrong way, an off-by-one round, or a drifting mean
  * rounding all fail exactly. Also pins the Lloyd invariant: the total
  * objective Σ dist2 never increases across assignment rounds. */
class IvfExactFitSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("ivf-exactfit-spec")
    .getOrCreate()

  private val K = 8
  private val Rounds = 3

  /** round-half-away-from-zero integer mean, the ladder's step 4. */
  private def rmean(sum: Long, n: Long): Long =
    Math.round(sum.toDouble / n.toDouble) match {
      case r if sum >= 0 => r
      // Math.round is half-UP (toward +inf); the engines round half
      // AWAY FROM ZERO — differ only at exact .5 on negatives
      case _ =>
        val q = sum.toDouble / n.toDouble
        if (q - Math.floor(q) == 0.5) Math.floor(q).toLong
        else Math.round(q)
    }

  private def replay(vecs: Map[Long, Array[Long]])
      : (Map[Long, (Long, Long)], Seq[Long]) = {
    var centroids: Map[Long, Array[Long]] =
      (0L until K).map(i => i -> vecs(i)).toMap
    def assign(): Map[Long, (Long, Long)] =
      vecs.map { case (id, v) =>
        val best = centroids.toSeq.map { case (cell, c) =>
          val d2 = v.indices.map { i =>
            val d = v(i) - c(i); d * d
          }.sum
          (d2, cell)
        }.min
        id -> (best._2, best._1)
      }
    val objectives = scala.collection.mutable.ArrayBuffer.empty[Long]
    var a = assign()
    objectives += a.values.map(_._2).sum
    (1 to Rounds).foreach { _ =>
      centroids = a.groupBy(_._2._1).map { case (cell, members) =>
        val vs = members.keys.map(vecs).toSeq
        cell -> Array.tabulate(vs.head.length)(i =>
          rmean(vs.map(_(i)).sum, vs.size))
      }
      a = assign()
      objectives += a.values.map(_._2).sum
    }
    (a, objectives.toSeq)
  }

  test("engine fit == in-memory Lloyd replay, cell for cell") {
    import org.apache.spark.sql.functions._
    val vecs = graft.core.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * 1e6).cast("long")).as("vq"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val (expected, objectives) = replay(vecs)

    val got = IvfQueries.annIvfExactFit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == vecs.size)
    val bad = got.filter { case (id, v) => expected(id) != v }
    assert(bad.isEmpty,
      s"${bad.size} assignments differ; first: ${bad.headOption}")

    // Lloyd's invariant: each (update, reassign) round is non-increasing
    objectives.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev, s"objective rose: $objectives")
    }
    // and the fit did real work: strictly better than the init round
    assert(objectives.last < objectives.head)
  }
}
