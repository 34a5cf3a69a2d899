package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.mwas.{MwasConfig, Pipeline, PipelineDims}

/** Isolates the single-trigger readout cost, full vs delta-restricted —
  * the component tools.StreamMwasAb's arm C changes. The A/B/C harness
  * measures end-to-end trigger loops; this probe answers WHY the delta
  * restriction does or doesn't pay by timing ONE readout each way over
  * identical state (no stream, no merge, no carry union).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.DeltaReadoutProbe [reps] [nChanged]"
  */
object DeltaReadoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val nChanged = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files
      .createTempDirectory("graft_deltaprobe").toString
    graft.operators.MwasPipelineQueries.abFixtures(spark, sfDir,
      s"$base/input_full")
    val in = spark.read.parquet(s"$base/input_full")
    val cat = graft.operators.MwasPipelineQueries.abCatalog(spark, sfDir)
      .persist()
    val sets = graft.operators.MwasPipelineQueries.abSets(spark, sfDir)
      .persist()
    cat.count(); sets.count()
    val cfg = MwasConfig(onlyTTest = true)
    val pdims = Pipeline.dims(cat, sets)
    pdims.bpUniverse.persist(); pdims.member.persist()
    pdims.bpUniverse.count(); pdims.member.count()

    val state = Pipeline.biosampleState(in, cat, cfg).localCheckpoint()
    println(s"[probe] state rows ${state.count()}")
    val changed = state.select(col("bio_project")).distinct()
      .orderBy(col("bio_project")).limit(nChanged).localCheckpoint()
    println(s"[probe] changed ${changed.count()} of " +
      s"${pdims.bpUniverse.count()} bioprojects")

    def timed(tag: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-18s median=${ts.sorted.apply(ts.size / 2)}%6.2f" +
        "  " + ts.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }

    timed("readout_full") {
      Pipeline.runFromBiosampleState(state, cat, sets, cfg, Some(pdims))
    }
    timed("readout_restricted") {
      val restricted = state.join(broadcast(changed),
        Seq("bio_project"), "left_semi")
      val rdims = PipelineDims(
        bpUniverse = pdims.bpUniverse.join(broadcast(changed),
          Seq("bio_project"), "left_semi"),
        member = pdims.member.join(broadcast(changed),
          Seq("bio_project"), "left_semi"))
      val rsets = sets.join(broadcast(changed.select(
        col("bio_project").as("bioproject"))), Seq("bioproject"),
        "left_semi")
      Pipeline.runFromBiosampleState(restricted, cat, rsets, cfg,
        Some(rdims))
    }
    timed("readout_state_only") {
      val restricted = state.join(broadcast(changed),
        Seq("bio_project"), "left_semi")
      Pipeline.runFromBiosampleState(restricted, cat, sets, cfg,
        Some(pdims))
    }
    spark.stop()
  }
}
