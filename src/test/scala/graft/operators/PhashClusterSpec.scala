package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the hamming-space image dedup (`dedup_image_phash`):
  *
  *   1. RECALL IS EXACT — the pigeonhole 4×12-bit banded pair relation
  *      must equal the exhaustive O(n²) hamming ≤ 3 sweep as a SET (the
  *      block bound is a theorem, not a probability: d ≤ 3 over 4
  *      blocks forces ≥ 1 identical block, so banding loses nothing and
  *      the verify filter adds nothing false).
  *   2. The planted "re-encode" arm (every 10th payload, one flipped
  *      mid-payload byte) lands in its original's component — the
  *      operator's reason to exist — and survivorship is exactly
  *      keep-min-per-component.
  */
class PhashClusterSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("phash-cluster-spec")
    .getOrCreate()

  test("banded hamming pairs equal the exact sweep; re-encodes cluster " +
      "with their originals; survivor is the component min") {
    val out = MultimodalQueries.dedupImagePhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))

    // exact all-pairs hamming sweep straight off the result's hashes
    val hs = out.map(t => (t._1, t._2))
    val exactPairs = (for {
      (ia, ha) <- hs.iterator
      (ib, hb) <- hs.iterator
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet

    // the operator's banded pair relation, reconstructed from the
    // component structure is NOT enough (transitivity collapses pairs),
    // so re-run the pigeonhole join through the public n_near profile:
    // n_near counts each doc's exact-radius partners, so total degree
    // must match the sweep
    val nNear = MultimodalQueries.mmPhashDedup(spark, dir)
      .agg(sum(col("n_near"))).head().getLong(0)
    assert(nNear == 2L * exactPairs.size,
      s"banded degree sum $nNear != 2×${exactPairs.size} exact pairs")

    // every exact pair shares a component (closure ⊇ pair relation)
    val comp = out.map(t => t._1 -> t._3).toMap
    exactPairs.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"pair ($a,$b) split across components")
    }

    // planted re-encode twins: doc k%10==0 vs k+1000000 hash within
    // radius (one flipped byte moves ≤ a few block means) → one cluster
    val planted = out.filter(_._1 >= 1000000L)
    assert(planted.nonEmpty)
    planted.foreach { case (id, _, c, _) =>
      assert(c == comp(id - 1000000L),
        s"re-encode $id not clustered with its original")
    }

    // keep-min-per-component, exactly one survivor each
    out.groupBy(_._3).foreach { case (c, members) =>
      assert(members.map(_._1).min == c)
      assert(members.filter(_._4).map(_._1).toSeq == Seq(c))
    }
  }
}
