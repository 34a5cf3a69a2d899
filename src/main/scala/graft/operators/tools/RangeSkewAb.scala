package graft.operators.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew lab for the binned range join: the scaladoc claims a flash-crowd
  * bin "is an ordinary skewed equi-join key (salt or let AQE split it)"
  * — this measures that claim instead of arguing it.
  *
  * Fixture: 1M events, HALF of them inside one hour (the flash crowd),
  * the rest uniform over 30 days. After binning, one bin key carries
  * ~half of both join sides. Broadcast is disabled so the join is a
  * genuine shuffle join (at 100 TB the interval side outgrows any
  * broadcast threshold — this lab forces that regime at local scale),
  * and three arms run the SAME join:
  *
  *   aqe_on   — AQE skew-join split enabled (the default posture)
  *   aqe_off  — skew split disabled: the hot bin is one straggler task
  *   salted   — explicit 16-way salt: points pick pmod(xxhash64(id),16),
  *              intervals replicate ×16, join on (bin, salt) — the
  *              pre-AQE remedy, and the one that also fixes per-key
  *              BUILD-side skew AQE's partition-split cannot
  *
  * Usage: sbt "runMain graft.tools.RangeSkewAb [reps]"
  */
object RangeSkewAb {
  private val BinUs = 3600L * 1000000L
  private val Salt = 16

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val dir = "/tmp/graft_range_skew"

    // ------------------------------------------------------- fixture
    locally {
      val s = session(aqeSkew = true)
      try {
        import s.implicits._
        val startUs = 1704067200000000L
        val spanUs = 30L * 86400L * 1000000L
        val crowdUs = startUs + 15L * 86400L * 1000000L // day 15, hour 0
        s.range(1000000L).as[Long].map { id =>
          val r = new scala.util.Random(id * 0x9E3779B97F4A7C15L + 17)
          val ts =
            if (r.nextBoolean()) crowdUs + (r.nextLong() >>> 1) % BinUs
            else startUs + (r.nextLong() >>> 1) % spanUs
          (id, ts, (r.nextLong() >>> 1) % 15000L,
            if (r.nextInt(5) == 0) "error" else "click",
            r.nextDouble())
        }.toDF("event_id", "ts_us", "user_id", "event_type", "value")
          .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
            col("user_id"), col("event_type"), col("value"),
            lit("{}").as("props"))
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      } finally s.stop()
    }

    def arm(name: String)(join: SparkSession => DataFrame): Double = {
      val s = session(aqeSkew = name != "aqe_off")
      try {
        val t0 = System.nanoTime()
        join(s).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[range-skew] $name%-8s t=$dt%.2f s")
        dt
      } finally s.stop()
    }

    def spansAndPts(s: SparkSession): (DataFrame, DataFrame) = {
      val spans = graft.operators.WarehouseQueries
        .sessionSpans(s, dir)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("lo"),
          unix_micros(col("session_end")).as("hi"),
          col("n_events"))
        .withColumn("bin",
          explode(sequence(expr(s"lo div $BinUs"), expr(s"hi div $BinUs"))))
      val pts = graft.core.Events(s, dir)
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("ts"), unix_micros(col("ts")).as("t"))
        .withColumn("bin", expr(s"t div $BinUs"))
      (spans, pts)
    }

    def plain(s: SparkSession): DataFrame = {
      val (spans, pts) = spansAndPts(s)
      pts.alias("p").join(spans.alias("i"),
          col("p.bin") === col("i.bin") &&
            col("p.t") >= col("i.lo") && col("p.t") <= col("i.hi"), "left")
        .groupBy(col("p.event_id"), col("p.ts"))
        .agg(count(col("i.user_id")).as("n_active"),
          count(when(col("i.n_events") >= 5, 1)).as("n_active_heavy"))
    }

    def salted(s: SparkSession): DataFrame = {
      val (spans, pts) = spansAndPts(s)
      val saltedPts = pts
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(Salt)))
      val saltedSpans = spans
        .withColumn("salt", explode(sequence(lit(0L), lit(Salt - 1L))))
      saltedPts.alias("p").join(saltedSpans.alias("i"),
          col("p.bin") === col("i.bin") && col("p.salt") === col("i.salt") &&
            col("p.t") >= col("i.lo") && col("p.t") <= col("i.hi"), "left")
        .groupBy(col("p.event_id"), col("p.ts"))
        .agg(count(col("i.user_id")).as("n_active"),
          count(when(col("i.n_events") >= 5, 1)).as("n_active_heavy"))
    }

    // interleave arms across reps (AbHarness is two-arm; rotate manually)
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val order = Seq("aqe_on", "aqe_off", "salted")
    (0 until reps).foreach { r =>
      val rotated = order.drop(r % order.size) ++ order.take(r % order.size)
      rotated.foreach {
        case n @ "salted" => times(n) ::= arm(n)(salted)
        case n => times(n) ::= arm(n)(plain)
      }
    }
    order.foreach { n =>
      println(f"[range-skew] MEDIAN $n%-8s ${graft.tools.AbHarness.median(times(n))}%.2f s")
    }
  }

  private def session(aqeSkew: Boolean): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // force the shuffle-join regime the lab is about
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
      .appName(s"range-skew-$aqeSkew")
      .getOrCreate()
  }
}
