// lives in graft.operators.tools to reach the package-private
// jaccardPairs/connectedComponents; dev probe, not operator surface
package graft.operators.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupQueries

/** A/B for the connected-components driver loop (r10): one star-round
  * composite per convergence check (`roundsPerCheck=1`, the shipped
  * default) vs two composites per check. Batching halves the per-round
  * driver barriers — localCheckpoint materialization + signature action
  * — at the cost of (worst case) one wasted composite after the
  * fixpoint, which is a no-op transform of an already-converged edge
  * set. Shared by dedup_components, dedup_emb_components and
  * dedup_canonical, so a win here moves three queries.
  *
  * `main [sfDir] [reps]`: equality-gates the converged mapping of both
  * arms over the jaccard pair graph, then times the full
  * edges→CC→mapping consume interleaved with an untouched control.
  */
object ComponentsAb {

  private def ccMapping(s: SparkSession, dir: String, rpc: Int): DataFrame = {
    val edges = DedupQueries.jaccardPairs(s, dir)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    DedupQueries.connectedComponents(edges, rpc)
      .select(col("u").as("doc_id"), col("v").as("component"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val a = ccMapping(s, dir, 1).collect().map(_.toString).sorted
    val b = ccMapping(s, dir, 2).collect().map(_.toString).sorted
    require(a.sameElements(b),
      s"arms disagree: ${a.length} vs ${b.length} mappings")
    println(s"[components-ab] equality gate passed (${a.length} mappings)")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val arms = Seq(
      "control_dexact" -> (() => DedupQueries.dedupExact(s, dir)),
      "check_every_1" -> (() => ccMapping(s, dir, 1)),
      "check_every_2" -> (() => ccMapping(s, dir, 2)))
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      arms.foreach { case (name, mk) =>
        s.catalog.clearCache()
        val t = time(mk().write.format("noop").mode("overwrite").save())
        samples(name) = samples(name) :+ t
      }
    }
    def median(v: Vector[Double]) = v.sorted.apply((v.length - 1) / 2)
    arms.foreach { case (name, _) =>
      val v = samples(name)
      println(f"[components-ab] $name%-14s median ${median(v)}%.3f s  " +
        v.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    s.stop()
  }
}
