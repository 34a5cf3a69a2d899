package graft.operators.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupQueries, StreamingComponentsQueries}

/** Phase attribution for `stream_components`' wall: per-trigger costs of
  * (a) the store scan + per-doc count aggregate, (b) the probe pair
  * join, (c) the star-rounds contraction — isolated so the slope table
  * can name what the per-trigger term actually scales with.
  *
  * Usage: `runMain graft.operators.tools.StreamCcProbe <sfDir>` */
object StreamCcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // stage-level attribution: print every stage ≥ 3 s wall with its
    // task count and max task time (stragglers show as maxTask ≈ wall)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        private val maxTask =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onStageSubmitted(
            e: org.apache.spark.scheduler.SparkListenerStageSubmitted)
            : Unit = starts.put(e.stageInfo.stageId, System.nanoTime())
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          maxTask.merge(e.stageId, e.taskInfo.duration,
            (a, b) => math.max(a, b))
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val id = e.stageInfo.stageId
          val w = (System.nanoTime() -
            starts.getOrDefault(id, System.nanoTime())) / 1e9
          if (w >= 3.0) println(
            f"[ccstage] stage $id%4d wall $w%6.1f s tasks " +
              f"${e.stageInfo.numTasks}%4d maxTask " +
              f"${maxTask.getOrDefault(id, 0L) / 1000.0}%6.1f s  " +
              e.stageInfo.name.takeWhile(_ != '\n').take(80))
        }
      })

    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val Array(idMin, idMax) = d.agg(min(col("doc_id")), max(col("doc_id")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    // mode: exact (in-memory store union), mimic [ckpt] (the r14
    // operator's word-store shapes), banded (the r15 operator's
    // signature-store shapes); optional trailing stripe count splits the
    // corpus into N id-ranged triggers (default 3) — the flat-curve
    // measurement needs enough triggers that an O(history) term shows
    val mode = args.drop(1).headOption.getOrElse("exact")
    val nStripes = args.drop(if (mode == "mimic") 3 else 2).headOption
      .map(_.toInt).getOrElse(3)
    val span = idMax - idMin + 1
    val batches = (0 until nStripes).map { k =>
      val lo = idMin + span * k / nStripes
      val hi = idMin + span * (k + 1) / nStripes
      d.filter(col("doc_id") >= lo && col("doc_id") < hi)
    }

    val mimic = mode == "mimic"
    val wordsDir = java.nio.file.Files.createTempDirectory("ccprobe_words")
      .toString + "/w"
    val bandedBase = java.nio.file.Files
      .createTempDirectory("ccprobe_banded").toString
    var store: DataFrame = null
    var mapping: DataFrame = null
    batches.zipWithIndex.foreach { case (b, i) =>
      // mimic = the operator's exact data shapes: single-partition batch
      // (one staged file per trigger), parquet store read back per
      // trigger, and the cross-session RDD[Row] re-anchor
      val bDf = if (mode != "exact") b.coalesce(1) else b
      val pairs = t(s"t$i probe join") {
        if (mode == "banded") {
          // the r15 operator's per-trigger shape: one signature row per
          // doc, bid-keyed append, map-side explode + broadcast probe
          // with IN-JOIN verification (no candidate materialization)
          StreamingComponentsQueries.signatureRowsForProbe(bDf)
            .write.mode("overwrite").parquet(s"$bandedBase/sig/b$i")
          val bsig = spark.read.parquet(s"$bandedBase/sig/b$i")
          val store = spark.read.option("recursiveFileLookup", "true")
            .parquet(s"$bandedBase/sig")
          StreamingComponentsQueries.probePairsForProbe(store, bsig)
            .localCheckpoint(true)
        } else {
          val w0 = DedupQueries.wordRelOf(bDf).localCheckpoint(true)
          val w = if (mimic) spark.createDataFrame(w0.rdd, w0.schema) else w0
          if (mimic) {
            w0.write.mode("append").parquet(wordsDir)
            store = spark.read.parquet(wordsDir)
              .repartition(spark.sparkContext.defaultParallelism,
                col("source"), col("word"))
            if (args.length > 2 && args(2) == "ckpt")
              store = store.localCheckpoint(true)
          } else {
            store = if (store == null) w0
              else store.unionByName(w0).localCheckpoint(true)
          }
          DedupQueries.jaccardPairsStore(store, w).localCheckpoint(true)
        }
      }
      println(s"[ccprobe] t$i new pairs = ${pairs.count()}")
      mapping = t(s"t$i contraction") {
        if (mode == "banded" && mapping != null)
          StreamingComponentsQueries.advanceMappingForProbe(mapping, pairs)
        else DedupQueries.connectedComponents(
          if (mapping == null) pairs else mapping.unionByName(pairs))
      }
      println(s"[ccprobe] t$i mapping rows = ${mapping.count()}")
    }
    spark.stop()
  }
}
