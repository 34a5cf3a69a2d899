// lives in graft.operators.tools to reach MwasPipelineQueries'
// package-private input derivations; dev measurement tool, not part of
// the operator surface
package graft.operators.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.MetadataCondenser
import graft.mwas.{MwasConfig, Pipeline}
import graft.operators.MwasPipelineQueries

/** The pipeline input-staging A/B, re-runnable at any fixture size
  * (VERDICT r10 item 3).
  *
  * Question: `mwas_pipeline_full` re-derives its input/catalog/sets
  * relations per consuming branch (78 source scans at sf0.001 per
  * tools.PlanAudit — orders 26×, customer 24×). The r10 A/B at sf0.1
  * rejected eager `localCheckpoint` staging (11.11 s staged vs 8.47 s
  * as-is) because the derivations are narrow column-pruned scans while
  * staged blocks lose pruning for every branch. That trade is
  * size-dependent: the repeated scans grow linearly with the fixture
  * while the one-time materialization is amortized over the same 78
  * consumers — this tool measures WHERE (if anywhere) the cross-over
  * sits, on the 10× relational fixture from
  * [[StressFixture]] `genrel`.
  *
  * Methodology (graft round workflow): arms interleaved per rep so a
  * host slow-window lands on both; an untouched control
  * (q6_outer_join at sf0.1) runs in the same interleave — its median
  * vs the bench history band says whether the whole probe window is
  * trustworthy.
  *
  * Usage: `runMain graft.operators.tools.PipelineStagingAb <dir> [reps]`
  */
object PipelineStagingAb {

  private def build(s: SparkSession, dir: String, mode: String)
      : DataFrame = {
    val in = MwasPipelineQueries.input(s, dir)
    val cat = MwasPipelineQueries.catalog(s, dir)
    val sets = MetadataCondenser.condense(
      MwasPipelineQueries.metadataLong(s, dir))
    mode match {
      case "as-is" => Pipeline.run(in, cat, sets, MwasConfig())
      case "staged" => Pipeline.run(in.localCheckpoint(),
        cat.localCheckpoint(), sets.localCheckpoint(), MwasConfig())
      // the r11 refinement hypothesis: the CONDENSER is the most
      // expensive re-derived input (CSV melt + value_counts chains) and
      // its output is tiny — staging it alone buys the re-derivation
      // savings without losing column pruning on the big fact inputs
      case "sets-only" => Pipeline.run(in, cat,
        sets.localCheckpoint(), MwasConfig())
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val arms = Seq(
      "as-is" -> (() => build(spark, dir, "as-is")),
      "staged" -> (() => build(spark, dir, "staged")),
      "sets-only" -> (() => build(spark, dir, "sets-only")),
      "control-q6" -> (() => graft.SparkEntry.queries("q6_outer_join")(
        spark, "/root/testdata/sf0.1")))
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { i =>
      arms.foreach { case (tag, mk) =>
        val t = time(mk())
        times(tag) = times(tag) :+ t
        println(f"[staging-ab] $tag%-10s rep$i: $t%.2f s")
      }
    }
    arms.foreach { case (tag, _) =>
      val ts = times(tag)
      println(f"[staging-ab] MEDIAN $tag%-10s ${ts.sorted.apply(ts.size / 2)}%6.2f s  " +
        ts.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
