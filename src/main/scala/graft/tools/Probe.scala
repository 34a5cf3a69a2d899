package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch perf probe (not part of the driver contract).
  *
  * Runs the named registry queries INTERLEAVED — rep 1 of every query,
  * then rep 2 of every query, … — so a host-wide slow window (this
  * machine shows 2× inflation windows lasting minutes) lands on all
  * arms equally instead of poisoning whichever query it straddles.
  * Convention (graft round workflow): pass an untouched control query
  * (q6_outer_join) alongside the suspects; if the control's median is
  * inside ITS history band, the suspects' numbers are trustworthy.
  *
  * `SPARK_GRAFT_PROBE_REPS` (default 2) sets reps; medians print at the
  * end next to the per-rep series.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { i =>
      args.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        times(name) = times(name) :+ t
        println(f"[probe] $name rep$i: $t%.2f s")
      }
    }
    args.foreach { name =>
      val ts = times(name)
      val med = ts.sorted.apply(ts.size / 2)
      println(f"[probe] MEDIAN $name%-24s $med%6.2f s  " +
        ts.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
