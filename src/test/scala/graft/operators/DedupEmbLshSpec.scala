package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the LSH production arm of embedding near-dup
  * clustering. The hash oracle proves cross-engine determinism of the
  * whole relation; THIS pins the arm's relationship to the exact
  * all-pairs arm — the LSH edge set is a SUBSET of the exact cos ≥ 0.45
  * pair set (candidates only add a bucket-collision requirement, never
  * relax the cosine verify), so LSH components can only REFINE exact
  * components: every LSH cluster must sit wholly inside one exact
  * cluster, and the LSH arm can only keep MORE survivors. Degenerate
  * passes (empty edge set ⇒ all-singleton components) would satisfy
  * refinement vacuously, so the spec also requires the arm to find real
  * structure on the fixture. */
class DedupEmbLshSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("dedup-emb-lsh-spec")
    .getOrCreate()

  test("LSH components refine exact components; non-degenerate") {
    val exact = DedupQueries.dedupEmbComponents(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val lsh = DedupQueries.dedupEmbComponentsLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    // same corpus partition: identical vec_id universe, exactly once each
    assert(lsh.map(_._1).sorted.sameElements(exact.map(_._1).sorted))

    // component id is the min member (the contraction's contract)
    lsh.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.map(_._1).min == comp,
        s"component $comp is not its members' min id")
      // EXACTLY the component-min row carries keep=true
      assert(members.filter(_._3).map(_._1).toSeq == Seq(comp),
        s"keeper of $comp is not the component id")
    }

    // refinement: every LSH cluster sits wholly inside ONE exact cluster
    val exactComp = exact.map(t => t._1 -> t._2).toMap
    lsh.groupBy(_._2).foreach { case (comp, members) =>
      val parents = members.map(m => exactComp(m._1)).distinct
      assert(parents.length == 1,
        s"LSH component $comp spans exact components ${parents.toList}")
    }

    // survivors: refinement can only split clusters, never merge them
    val keptExact = exact.count(_._3)
    val keptLsh = lsh.count(_._3)
    assert(keptLsh >= keptExact, s"LSH kept $keptLsh < exact $keptExact")

    // non-degeneracy: the arm finds real near-dup structure here (the
    // fixture has cos ≥ 0.45 pairs; per-pair bucket-collision recall at
    // the threshold is ~0.86 and rises toward cos = 1)
    assert(lsh.count(!_._3) > 0, "LSH arm found no near-dup structure")
  }
}
