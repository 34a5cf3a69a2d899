// dev measurement tool (graft.operators.tools to reach the
// package-private decontaminate builder), not part of the operator surface
package graft.operators.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.BloomQueries

/** The bloom-prefilter A/B, in the regime the bloom exists for.
  *
  * At fixture scale the benchmark gram set always BROADCASTS, so both
  * the exact and the bloom decontamination run a map-side semi join and
  * the bloom can only add its (small) sketch-build overhead — the
  * registry bench shows exactly that (bloom 1.10 s vs exact 0.61 s at
  * sf0.1). The bloom's reason to exist is the beyond-broadcast regime —
  * a benchmark suite too big to ship to every task — where the exact
  * path must SHUFFLE every corpus gram into a join while the bloom path
  * shuffles only the sieved survivors (true hits + ~1% fp). This tool
  * measures that regime directly by disabling the broadcast hint and
  * the auto threshold on both arms, so the join strategy is the
  * shuffle join the big-benchmark case forces.
  *
  * Methodology: arms interleaved per rep (host slow-windows land on
  * both); control = q6_outer_join at sf0.1 against its bench history
  * band.
  *
  * Usage: `runMain graft.operators.tools.BloomAb <docsDir> [reps]`
  */
object BloomAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // wall-clock is host-weather-noisy and fixture-ratio-bound; SHUFFLE
    // VOLUME is the metric the bloom actually moves (it is scale-free in
    // the probe:bench ratio), so track both
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            shuffled.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    def time(mk: => DataFrame): (Double, Long) = {
      Thread.sleep(300) // let the listener bus drain the previous arm
      shuffled.set(0L)
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (dt, shuffled.get())
    }
    // simulate the big-benchmark regime on the MEASURED arms only: no
    // auto-broadcast, no hint. The override is scoped per-arm so the
    // control query runs under the SAME conf its bench-history band was
    // recorded with — a control inflated by a foreign plan change can't
    // validate (or invalidate) anything.
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    def noBroadcast[A](body: => A): A =
      try { spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1"); body }
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    val arms = Seq(
      "exact-shuffle" -> (() => noBroadcast(time(BloomQueries.decontaminate(
        spark, dir, useBloom = false, hintBroadcast = false)))),
      "bloom-shuffle" -> (() => noBroadcast(time(BloomQueries.decontaminate(
        spark, dir, useBloom = true, hintBroadcast = false)))),
      "control-q6" -> (() => time(graft.SparkEntry.queries("q6_outer_join")(
        spark, "/root/testdata/sf0.1"))))
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val vols = scala.collection.mutable.Map.empty[String, Vector[Long]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { i =>
      arms.foreach { case (tag, mk) =>
        val (t, b) = mk()
        times(tag) = times(tag) :+ t
        vols(tag) = vols(tag) :+ b
        println(f"[bloom-ab] $tag%-14s rep$i: $t%.2f s  ${b / 1048576.0}%.1f MiB shuffled")
      }
    }
    arms.foreach { case (tag, _) =>
      val ts = times(tag)
      val vs = vols(tag)
      println(f"[bloom-ab] MEDIAN $tag%-14s ${ts.sorted.apply(ts.size / 2)}%6.2f s  " +
        f"${vs.sorted.apply(vs.size / 2) / 1048576.0}%8.1f MiB  " +
        ts.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
