package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the cell-bounded embedding-clustering arm — the
  * same refinement contract as the LSH arm's spec: same-cell cos ≥ 0.45
  * edges are a subset of the exact all-pairs edge set, so cell
  * components can only refine exact components, never merge across
  * them. Degenerate passes (no edges at all) satisfy refinement
  * vacuously, so the spec also requires real structure on the fixture. */
class DedupEmbCellsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("dedup-emb-cells-spec")
    .getOrCreate()

  test("cell components refine exact components; non-degenerate") {
    val exact = DedupQueries.dedupEmbComponents(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val cells = DedupQueries.dedupEmbComponentsCells(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    assert(cells.map(_._1).sorted.sameElements(exact.map(_._1).sorted))

    val exactComp = exact.map(t => t._1 -> t._2).toMap
    cells.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.map(_._1).min == comp,
        s"component $comp is not its members' min id")
      // EXACTLY the component-min row carries keep=true
      assert(members.filter(_._3).map(_._1).toSeq == Seq(comp),
        s"keeper of $comp is not the component id")
      val parents = members.map(m => exactComp(m._1)).distinct
      assert(parents.length == 1,
        s"cell component $comp spans exact components ${parents.toList}")
    }
    assert(cells.count(_._3) >= exact.count(_._3))
    assert(cells.count(!_._3) > 0, "cells arm found no near-dup structure")
  }
}
